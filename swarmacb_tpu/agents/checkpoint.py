"""Checkpointing with orbax — save/restore/rotate.

Replaces the reference's ``torch.save`` dict checkpoints
(poca_trainer.py:981-1025): same contents (params, optimizer state,
counters, full architecture metadata so ``play.py`` can rebuild the actor
without a config) and the same rotation policy (keep the newest
``keep_checkpoints`` numbered checkpoints; the final checkpoint exempt).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    """Step-numbered orbax checkpoints under ``cfg.checkpoint_dir``."""

    def __init__(self, directory: str | Path, keep: int = 5):
        self.dir = Path(directory).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.keep = keep
        self._ckptr = ocp.StandardCheckpointer()

    # ── save ──────────────────────────────────────────────────────
    def save(self, trainer, final: bool = False, quarantine: bool = False):
        """``quarantine``: save under ``poca_diverged_<step>`` — kept for
        post-mortem but excluded from ``latest()`` and rotation, so a
        divergence never becomes the auto-resume point nor evicts the
        last good checkpoint."""
        if quarantine:
            name = f"poca_diverged_{trainer.global_step}"
        else:
            name = "poca_final" if final else f"poca_{trainer.global_step}"
        path = self.dir / name
        payload = {
            "params": trainer.train_state.params,
            "opt_state": trainer.train_state.opt_state,
        }
        self._ckptr.save(path, payload, force=True)
        self._ckptr.wait_until_finished()  # orbax saves asynchronously
        # In multi-process runs orbax coordinates the array save across
        # hosts, but the sidecar metadata write and rotation are plain
        # filesystem ops — run them on process 0 only (after the barrier
        # above) so concurrent writers can't race on a shared filesystem.
        if jax.process_index() == 0:
            meta = dict(trainer.checkpoint_metadata())
            meta.update(global_step=trainer.global_step,
                        update_count=trainer.update_count)
            (path / "metadata.json").write_text(json.dumps(meta))
            print(f"[POCA] Saved → {path}")
            if not (final or quarantine):
                self._rotate()
        return path

    @staticmethod
    def _is_numbered(p: Path) -> bool:
        """poca_<step> directories — the resumable, rotatable set."""
        tail = p.name.removeprefix("poca_")
        return p.is_dir() and tail.isdigit()

    def _rotate(self):
        if self.keep <= 0:
            return
        numbered = sorted((p for p in self.dir.glob("poca_*")
                           if self._is_numbered(p)),
                          key=lambda p: p.stat().st_mtime)
        while len(numbered) > self.keep:
            old = numbered.pop(0)
            import shutil

            shutil.rmtree(old, ignore_errors=True)
            print(f"[POCA] Removed old checkpoint → {old.name}")

    # ── restore ───────────────────────────────────────────────────
    @staticmethod
    def load_metadata(path: str | Path) -> dict:
        return json.loads((Path(path).absolute() / "metadata.json").read_text())

    def restore(self, path: str | Path, trainer):
        """Restore params/opt_state/counters into a built trainer
        (poca_trainer.py:1002-1009)."""
        path = Path(path).absolute()
        target = {
            "params": trainer.train_state.params,
            "opt_state": trainer.train_state.opt_state,
        }
        restored = self._ckptr.restore(
            path, jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
        )
        trainer.train_state = type(trainer.train_state)(
            params=restored["params"], opt_state=restored["opt_state"]
        )
        meta = self.load_metadata(path)
        trainer.global_step = int(meta["global_step"])
        trainer.update_count = int(meta["update_count"])
        print(f"[POCA] Loaded ← {path}  (step {trainer.global_step})")
        return meta

    @staticmethod
    def restore_params(path: str | Path):
        """Restore just the params tree (for play/eval).

        Builds the restore target from the checkpoint's own shape/dtype
        metadata but pins the sharding to a local device, so a checkpoint
        written on one backend (e.g. a TPU training host) restores on
        another (e.g. a CPU eval machine) — a target-free restore would
        instead try to recreate the saved TPU sharding and fail with
        "Device ... was not found in jax.local_devices()".
        """
        path = Path(path).absolute()
        ckptr = ocp.StandardCheckpointer()
        sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
        target = jax.tree_util.tree_map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding),
            ckptr.metadata(path).item_metadata,
        )
        restored = ckptr.restore(path, target)
        return restored["params"]

    def latest(self) -> Path | None:
        """Newest resumable checkpoint: numbered ones and ``poca_final``
        (quarantined ``poca_diverged_*`` saves never auto-resume)."""
        candidates = sorted(
            (p for p in self.dir.glob("poca_*")
             if self._is_numbered(p) or (p.is_dir() and p.name == "poca_final")),
            key=lambda p: p.stat().st_mtime,
        )
        return candidates[-1] if candidates else None
