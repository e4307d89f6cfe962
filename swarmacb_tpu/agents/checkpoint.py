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
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


class Checkpointer:
    """Step-numbered orbax checkpoints under ``cfg.checkpoint_dir``."""

    def __init__(self, directory: str | Path, keep: int = 5):
        self.dir = Path(directory).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.keep = keep
        self._ckptr = ocp.StandardCheckpointer()
        # single writer thread + bounded handoff queue for periodic saves
        # (lazily started — eval/restore-only uses never spawn it)
        self._worker = None
        self._work = None
        self._worker_error: BaseException | None = None
        # cached jitted pack function + tree spec, keyed on the snapshot's
        # (treedef, shapes, dtypes) — see _pack()
        self._pack_cache: tuple | None = None

    # ── save ──────────────────────────────────────────────────────
    def save(self, trainer, final: bool = False, quarantine: bool = False):
        """``quarantine``: save under ``poca_diverged_<step>`` — kept for
        post-mortem but excluded from ``latest()`` and rotation, so a
        divergence never becomes the auto-resume point nor evicts the
        last good checkpoint.

        Periodic saves are fully ASYNCHRONOUS: the reference's
        checkpoint_interval of 120k agent-decisions means a save per ~2 s
        iteration at E=16, and a blocking save was measured to cost most
        of the training wall time on a tunnelled TPU runtime. save()
        packs the train state on device (see _pack), DISPATCHES async
        device→host copies, and hands the write to a single worker
        thread; the training loop never waits on the transfer, the orbax
        write, the metadata sidecar, or rotation. The worker queue is
        bounded (2 entries) so writes that somehow fall behind exert
        backpressure instead of hoarding snapshots. Requires the trainer
        NOT to donate train_state (trainer.py jitted-programs note) —
        donation would invalidate the packed refs mid-flight. Final and
        quarantine saves drain the queue and finalize synchronously, so
        their directories exist when save() returns.
        """
        if not (final or quarantine):
            self._raise_worker_error()
        if quarantine:
            name = f"poca_diverged_{trainer.global_step}"
        else:
            name = "poca_final" if final else f"poca_{trainer.global_step}"
        path = self.dir / name
        snapshot = {
            "params": trainer.train_state.params,
            "opt_state": trainer.train_state.opt_state,
        }
        packed = self._pack(snapshot)
        for leaf in jax.tree_util.tree_leaves(packed[1]):
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()
        meta = dict(trainer.checkpoint_metadata())
        meta.update(global_step=trainer.global_step,
                    update_count=trainer.update_count)
        if final or quarantine:
            # Drain queued periodic saves first (on-disk ordering) but
            # DEFER any stale worker failure: this write must land even
            # if an earlier periodic save failed — a quarantine save is
            # the post-mortem of a divergence and must not be aborted by
            # an unrelated earlier I/O error (which would also mask the
            # FloatingPointError the trainer is about to raise).
            if self._work is not None:
                self._work.join()
            self._finalize_item(path, meta, packed, rotate=False)
            if quarantine:
                if self._worker_error is not None:
                    e, self._worker_error = self._worker_error, None
                    print("[POCA] NOTE: an earlier periodic checkpoint "
                          f"write had failed: {e!r}")
            else:
                self._raise_worker_error()
        else:
            self._ensure_worker()
            self._work.put((path, meta, packed))
        return path

    def flush(self):
        """Block until every queued async save is committed and finalized
        (metadata written, rotation applied); re-raise a worker failure."""
        if self._work is not None:
            self._work.join()
        self._raise_worker_error()

    def _ensure_worker(self):
        if self._worker is None:
            import queue
            import threading

            self._work = queue.Queue(maxsize=2)
            self._worker = threading.Thread(
                target=self._drain, name="checkpoint-writer", daemon=True)
            self._worker.start()

    def _drain(self):
        while True:
            path, meta, packed = self._work.get()
            try:
                self._finalize_item(path, meta, packed)
            except BaseException as e:  # surfaced on the next save/flush
                # log every failure as it happens (several can occur
                # between two save() checks) but keep the FIRST for
                # re-raising — it is usually the root cause
                print(f"[POCA] Async checkpoint write FAILED → {path}: {e!r}")
                if self._worker_error is None:
                    self._worker_error = e
            finally:
                self._work.task_done()

    def _raise_worker_error(self):
        if self._worker_error is not None:
            e, self._worker_error = self._worker_error, None
            raise RuntimeError("async checkpoint write failed") from e

    # ── transit packing ───────────────────────────────────────────
    # The pipelined save's cost on a tunnelled TPU runtime is NOT the
    # 21 MB of bytes, it is the per-array round trips: the train state
    # has hundreds of small leaves and each device→host copy is a
    # separate tunnel op (~2.5 s total — measured to dominate training
    # wall time at the reference's 120 k-step checkpoint_interval, where
    # every ~2 s iteration crosses the interval). So for transit we
    # concatenate the snapshot on DEVICE into one flat array per dtype
    # (a single cheap jitted program) and stream back a handful of large
    # transfers instead; _unpack() rebuilds the exact host tree before
    # the orbax write, so the on-disk format is unchanged. Multi-process
    # runs keep the plain per-leaf path: their leaves may be sharded
    # across hosts, and orbax coordinates that save itself.

    def _pack(self, snapshot):
        if jax.process_count() > 1:
            return ("tree", snapshot, None)
        leaves, treedef = jax.tree_util.tree_flatten(snapshot)
        if not all(hasattr(x, "dtype") and hasattr(x, "ravel") for x in leaves):
            return ("tree", snapshot, None)
        sig = (treedef, tuple((x.shape, np.dtype(x.dtype)) for x in leaves))
        if self._pack_cache is None or self._pack_cache[0] != sig:
            groups: dict = {}  # dtype -> list of leaf indices
            for i, x in enumerate(leaves):
                groups.setdefault(np.dtype(x.dtype), []).append(i)
            order = sorted(groups, key=str)

            def pack_fn(ls):
                return [jnp.concatenate([ls[i].ravel() for i in groups[d]])
                        for d in order]

            spec = (treedef,
                    [(x.shape, np.dtype(x.dtype)) for x in leaves],
                    {d: groups[d] for d in order})
            self._pack_cache = (sig, jax.jit(pack_fn), spec)
        _, pack_fn, spec = self._pack_cache
        return ("packed", pack_fn(leaves), spec)

    @staticmethod
    def _unpack(kind, payload, spec):
        """Host-side inverse of _pack: split the per-dtype flats back
        into leaves and rebuild the tree (all numpy, no device ops)."""
        if kind == "tree":
            return jax.tree_util.tree_map(np.asarray, payload)
        treedef, shapes, groups = spec
        out = [None] * len(shapes)
        for flat, (dtype, idxs) in zip(payload, groups.items()):
            flat = np.asarray(flat)
            off = 0
            for i in idxs:
                shape, _ = shapes[i]
                n = int(np.prod(shape)) if shape else 1
                out[i] = flat[off:off + n].reshape(shape)
                off += n
        return jax.tree_util.tree_unflatten(treedef, out)

    def _finalize_item(self, path, meta, packed, rotate: bool = True):
        """Materialize a snapshot (wait for its host copies), write it
        with orbax, then write the metadata sidecar and rotate. Runs on
        the writer thread for periodic saves, inline for final/quarantine
        ones. In multi-process runs orbax coordinates the array save
        across hosts, but the metadata write and rotation are plain
        filesystem ops — run them on process 0 only (after the save
        barrier) so concurrent writers can't race on a shared
        filesystem."""
        kind, transit, spec = packed
        payload = self._unpack(kind, transit, spec)
        self._ckptr.save(path, payload, force=True)
        self._ckptr.wait_until_finished()
        if jax.process_index() == 0:
            (path / "metadata.json").write_text(json.dumps(meta))
            print(f"[POCA] Saved → {path}")
            if rotate and self._is_numbered(path):
                self._rotate()

    @staticmethod
    def _is_numbered(p: Path) -> bool:
        """poca_<step> directories — the resumable, rotatable set."""
        tail = p.name.removeprefix("poca_")
        return p.is_dir() and tail.isdigit()

    def _rotate(self):
        if self.keep <= 0:
            return
        import shutil

        numbered = sorted((p for p in self.dir.glob("poca_*")
                           if self._is_numbered(p)),
                          key=lambda p: p.stat().st_mtime)
        # metadata-less numbered dirs are crash debris (died between the
        # orbax commit and the deferred sidecar write): latest() already
        # skips them, so counting them toward `keep` would evict
        # restorable history while the unrestorable dir squats a slot —
        # delete them outright instead
        restorable = []
        for p in numbered:
            if (p / "metadata.json").exists():
                restorable.append(p)
            else:
                shutil.rmtree(p, ignore_errors=True)
                print(f"[POCA] Removed unrestorable checkpoint → {p.name}")
        while len(restorable) > self.keep:
            old = restorable.pop(0)
            shutil.rmtree(old, ignore_errors=True)
            print(f"[POCA] Removed old checkpoint → {old.name}")

    # ── restore ───────────────────────────────────────────────────
    @staticmethod
    def load_metadata(path: str | Path) -> dict:
        return json.loads((Path(path).absolute() / "metadata.json").read_text())

    def restore(self, path: str | Path, trainer):
        """Restore params/opt_state/counters into a built trainer
        (poca_trainer.py:1002-1009)."""
        self.flush()
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
        """Newest resumable checkpoint — numbered ``poca_<step>`` saves
        only. ``poca_final`` is written at ``total_timesteps``, so resuming
        from it makes the training loop exit immediately: a user passing
        ``--checkpoint latest`` to re-train (e.g. with a raised budget)
        would get a silent no-op. Preferring the newest periodic
        checkpoint keeps the resume actionable; ``poca_final`` is used
        only when no numbered checkpoint exists (rotation never deletes
        all of them, so that means a rotated-away history). Quarantined
        ``poca_diverged_*`` saves never auto-resume."""
        self.flush()
        # require the metadata sidecar: a crash between an async orbax
        # commit and its deferred metadata write leaves a dir that cannot
        # be restored from — fall back to the previous complete save
        numbered = sorted((p for p in self.dir.glob("poca_*")
                           if self._is_numbered(p)
                           and (p / "metadata.json").exists()),
                          key=lambda p: p.stat().st_mtime)
        if numbered:
            return numbered[-1]
        final = self.dir / "poca_final"
        return final if (final / "metadata.json").exists() else None
