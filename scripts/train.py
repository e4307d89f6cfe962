#!/usr/bin/env python3
"""Train POCA on a registered SwarmACB-TPU mission.

The TPU-native counterpart of the reference's scripts/train.py — same CLI,
same YAML configs, no Isaac bootstrap. Runs on whatever jax.devices()
offers (TPU, CPU); multi-host via --distributed.

Usage:
    # Preferred: ML-Agents-style YAML config
    python scripts/train.py --config configs/DirGate_dandelion.yaml

    # Override specific settings via CLI
    python scripts/train.py --config configs/DirGate_dandelion.yaml --num_envs 1024

    # Legacy (no config file)
    python scripts/train.py --task SwarmACB-DirectionalGate-v0 --variant daisy

    # Resume from checkpoint
    python scripts/train.py --config configs/DirGate_dandelion.yaml \
        --checkpoint checkpoints/DirGate_dandelion/poca_1000000
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="SwarmACB-TPU POCA Training")
    p.add_argument("--config", type=str, default=None,
                   help="Path to ML-Agents-style YAML config file")
    p.add_argument("--task", type=str, default="SwarmACB-DirectionalGate-v0")
    p.add_argument("--variant", type=str, default=None,
                   choices=["dandelion", "daisy", "lily", "tulip", "cyclamen"])
    p.add_argument("--num_envs", type=int, default=None)
    p.add_argument("--checkpoint", type=str, default=None,
                   help="Checkpoint directory to resume from, or 'latest' to "
                        "auto-resume from the newest checkpoint in "
                        "--checkpoint_dir (preemption recovery)")
    p.add_argument("--profile", type=str, default=None, metavar="DIR",
                   help="Capture a jax.profiler trace of iterations 2-4 "
                        "into DIR (view with tensorboard or xprof)")
    p.add_argument("--total_timesteps", type=int, default=None)
    p.add_argument("--checkpoint_interval", type=int, default=None,
                   help="Agent-decisions between checkpoint saves "
                        "(YAML default 120k = every iteration at E=16; "
                        "raise for seed-parallel runs where each save "
                        "transfers S param snapshots)")
    p.add_argument("--decision_period", type=int, default=None)
    p.add_argument("--hidden_dim", type=int, default=None)
    p.add_argument("--num_layers", type=int, default=None)
    p.add_argument("--log_dir", type=str, default=None)
    p.add_argument("--checkpoint_dir", type=str, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--seeds", type=str, default=None,
                   help="Train MULTIPLE seeds concurrently as one vmapped "
                        "program on the chip (the TPU-native form of the "
                        "reference's 10-seed SLURM array, "
                        "train_dandelion.slurm:3). Comma/range list, e.g. "
                        "'0-9' or '0,2,5'. Per-seed TensorBoard and "
                        "checkpoint dirs are derived as <dir>_seed<s> from "
                        "--log_dir/--checkpoint_dir (or the config's "
                        "defaults), matching the serial sweep layout")
    p.add_argument("--platform", type=str, default=None,
                   help="Force a JAX platform (tpu/cpu)")
    p.add_argument("--mixed_precision", action="store_true",
                   help="bf16 matmul operands in the critic (params/"
                        "residuals/losses stay f32); see "
                        "POCAConfig.mixed_precision")
    p.add_argument("--mp_stages", type=str, default=None,
                   help="Subset of 'qkvo': which RSA projection stages "
                        "take bf16 under --mixed_precision, or 'auto' "
                        "for the per-variant stages validated by "
                        "full-budget curve overlays (VALIDATION.md; "
                        "'auto' refuses variants with no validated "
                        "placement; see POCAConfig.mp_stages)")
    p.add_argument("--use_pallas", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="Fused Pallas sensor/collision kernels for the env "
                        "step (ops/pairwise.py). 'auto' = on when the "
                        "backend is TPU (default), off elsewhere")
    p.add_argument("--fused_tail", type=str, default="config",
                   choices=["config", "on", "off"],
                   help="Fused Pallas tail kernel for the critic's "
                        "counterfactual pass (ops/baseline_tail.py). "
                        "'config' defers to POCAConfig.fused_tail "
                        "(None there = auto-on on TPU)")
    p.add_argument("--fused_attention", type=str, default="config",
                   choices=["config", "on", "off"],
                   help="Fully-fused counterfactual-attention kernel "
                        "(ops/cf_attention.py) — scores to pooled rows in "
                        "one Pallas program; supersedes --fused_tail when "
                        "on. 'config' defers to POCAConfig.fused_attention")
    p.add_argument("--fused_env_step", type=str, default="config",
                   choices=["config", "on", "off"],
                   help="Fused single-kernel env step in the TRAINING "
                        "rollout scan (env/lanes.py + ops/fused_step.py). "
                        "'config' defers to POCAConfig.fused_env_step "
                        "(None there = auto-off; BENCH_NOTES.md round-5)")
    p.add_argument("--distributed", action="store_true",
                   help="Initialize jax.distributed for multi-host training")
    p.add_argument("--data_parallel", type=str, default="auto",
                   help="'auto' (mesh over all visible devices when >1), "
                        "'off' (single device), or an explicit device count")
    p.add_argument("--no-tensorboard", action="store_true")
    return p


def _parse_seeds(spec: str) -> list[int]:
    """'0-9' / '0,2,5' / mixes of both → sorted unique seed list."""
    out: list[int] = []
    for part in spec.split(","):
        part = part.strip()
        if "-" in part[1:]:
            lo, hi = part.split("-", 1)
            out.extend(range(int(lo), int(hi) + 1))
        elif part:
            out.append(int(part))
    return sorted(set(out))


def main():
    args = build_parser().parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.distributed:
        jax.distributed.initialize()

    # Persistent XLA compilation cache: the fused train program costs
    # ~80 s to compile, paid by EVERY fresh process of a seed sweep
    # (scripts/tpu/queue_runner.sh launches one process per run). With
    # the cache, identical (variant, E) program shapes compile once per
    # host. Backends that don't support serialized executables simply
    # never populate it — enabling is free there.
    try:
        import os
        # user-scoped default (not a fixed /tmp path: world-shared tmp
        # dirs risk permission collisions / cache poisoning between
        # users, and tmp cleaners can evict entries mid-run)
        default_cache = os.path.join(
            os.path.expanduser("~"), ".cache", "swarmacb", "jax_cache")
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", default_cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax without these config names

    from swarmacb_tpu.agents import Checkpointer, POCAConfig, POCATrainer
    from swarmacb_tpu.config.loader import load_config, print_config
    from swarmacb_tpu.env import make_env
    from swarmacb_tpu.utils import make_writer

    # ── Load config ────────────────────────────────────────────────
    if args.config:
        run_name, variant, cfg, env_overrides = load_config(args.config)
    else:
        variant = args.variant or "dandelion"
        run_name = f"poca_{variant}_{args.task}"
        hd, nl = (128, 1) if variant in ("tulip", "cyclamen") else (512, 2)
        cfg = POCAConfig(
            hidden_dim=args.hidden_dim or hd,
            num_layers=args.num_layers or nl,
            decision_period=args.decision_period or 1,
            recurrent=(variant == "cyclamen"),
        )
        cfg.log_dir = f"runs/{run_name}"
        cfg.checkpoint_dir = f"checkpoints/poca_{variant}"
        env_overrides = {}

    # ── CLI overrides always win (scripts/train.py:122-139) ───────
    if args.variant is not None:
        variant = args.variant
        cfg.recurrent = (variant == "cyclamen")
    if args.total_timesteps is not None:
        cfg.total_timesteps = args.total_timesteps
    if args.checkpoint_interval is not None:
        cfg.checkpoint_interval = args.checkpoint_interval
    if args.hidden_dim is not None:
        cfg.hidden_dim = args.hidden_dim
    if args.num_layers is not None:
        cfg.num_layers = args.num_layers
    if args.decision_period is not None:
        cfg.decision_period = args.decision_period
    if args.log_dir is not None:
        cfg.log_dir = args.log_dir
    if args.checkpoint_dir is not None:
        cfg.checkpoint_dir = args.checkpoint_dir
    if args.seed is not None:
        cfg.seed = args.seed
    if args.mixed_precision:
        cfg.mixed_precision = True
    if args.mp_stages is not None:
        if args.mp_stages == "auto":
            # per-variant bf16 stage placement validated by full-budget
            # curve overlays (VALIDATION.md bisection + round-5
            # overlays): lily's reward deficit only appears when the
            # scores (qk) and values/output (vo) bf16 rounding compound,
            # while dandelion showed the opposite (qkvo in-band, qk
            # below band); the round-5 tulip/daisy qkvo overlays both
            # ESCAPED into their f32 escaped modes (20.45 / 23.86 —
            # VALIDATION.md), so qkvo is their validated placement.
            # Variants absent from the map have NO validated placement —
            # 'auto' refuses rather than guessing (a guess would wear a
            # validated flag's clothes).
            validated = {"dandelion": "qkvo", "lily": "qk",
                         "cyclamen": "qk", "tulip": "qkvo",
                         "daisy": "qkvo"}
            if variant not in validated:
                raise SystemExit(
                    f"--mp_stages auto: no full-budget-validated bf16 "
                    f"placement for '{variant}' (VALIDATION.md overlay "
                    "table); pass an explicit subset of 'qkvo' to "
                    "accept unvalidated numerics")
            cfg.mp_stages = validated[variant]
        else:
            assert set(args.mp_stages) <= set("qkvo"), args.mp_stages
            cfg.mp_stages = args.mp_stages
    if args.fused_tail != "config":
        cfg.fused_tail = args.fused_tail == "on"
    if args.fused_attention != "config":
        cfg.fused_attention = args.fused_attention == "on"
    if args.fused_env_step != "config":
        cfg.fused_env_step = args.fused_env_step == "on"
    if args.num_envs is not None:
        env_overrides["num_envs"] = args.num_envs

    print_config(run_name, variant, cfg, env_overrides)

    # ── Build env ──────────────────────────────────────────────────
    env_kw = {"variant": variant}
    if "num_envs" in env_overrides:
        env_kw["num_envs"] = env_overrides["num_envs"]
    if "episode_length_s" in env_overrides:
        env_kw["episode_length_s"] = env_overrides["episode_length_s"]
    if args.use_pallas == "auto":
        env_kw["use_pallas"] = jax.default_backend() == "tpu"
    else:
        env_kw["use_pallas"] = args.use_pallas == "on"
    if env_kw["use_pallas"]:
        print("[train] Pallas sensor/collision kernels: ON")
    env = make_env(args.task, **env_kw)

    # ── Device mesh: env batch data-parallel over all chips ────────
    from swarmacb_tpu.parallel import make_mesh

    mesh = None
    n_dev = len(jax.devices())
    if args.data_parallel != "off":
        n = n_dev if args.data_parallel == "auto" else int(args.data_parallel)
        if n > 1:
            # with --seeds the mesh shards the SEED axis (validated in
            # the seed-parallel branch below), not the arena batch
            if args.seeds is None and env.num_envs % n:
                raise SystemExit(
                    f"num_envs={env.num_envs} not divisible by mesh size {n}; "
                    "adjust --num_envs or --data_parallel")
            mesh = make_mesh(n)
            if args.seeds is None:
                print(f"[train] data-parallel mesh over {n} device(s): "
                      f"{env.num_envs // n} arenas/device")

    # ── Seed-parallel branch: S lanes vmapped into one program ─────
    if args.seeds is not None:
        seeds = _parse_seeds(args.seeds)
        if mesh is not None and len(seeds) % mesh.devices.size:
            raise SystemExit(
                f"{len(seeds)} seeds not divisible by mesh size "
                f"{mesh.devices.size}; adjust --seeds or --data_parallel")
        from swarmacb_tpu.agents import SeedParallelTrainer

        log_base = cfg.log_dir.rstrip("/")
        ckpt_base = cfg.checkpoint_dir.rstrip("/")
        writers = None
        if not args.no_tensorboard:
            writers = [make_writer(f"{log_base}_seed{s}") for s in seeds]
        cks = [Checkpointer(f"{ckpt_base}_seed{s}", keep=cfg.keep_checkpoints)
               for s in seeds]
        trainer = SeedParallelTrainer(env, cfg, seeds, writers=writers,
                                      mesh=mesh)
        where = (f", seed axis sharded over {mesh.devices.size} devices"
                 if mesh is not None else "")
        print(f"[train] seed-parallel: {len(seeds)} lanes "
              f"({seeds}) × E={env.num_envs} arenas in one program{where}")
        if writers is not None:
            hp_text = "\n".join(f"{k}: {v}" for k, v in vars(cfg).items())
            for w in writers:
                w.add_text("hyperparameters", hp_text, 0)
        if args.checkpoint == "latest":
            if not trainer.try_resume(cks):
                print("[train] no common checkpoint step across seed dirs; "
                      "starting fresh")
        elif args.checkpoint:
            raise SystemExit("--seeds resumes only via --checkpoint latest "
                             "(per-seed dirs)")
        if args.profile:
            print("[train] NOTE: --profile is not wired for seed-parallel "
                  "runs; profile a serial run of one seed instead")
        trainer.train(checkpointers=cks)
        return

    # tensorboard only on process 0 in multi-host runs
    is_main = jax.process_index() == 0
    writer = None if (args.no_tensorboard or not is_main) else make_writer(cfg.log_dir)
    trainer = POCATrainer(env, cfg, writer=writer, mesh=mesh)
    if writer is not None:
        hp_text = "\n".join(f"{k}: {v}" for k, v in vars(cfg).items())
        writer.add_text("hyperparameters", hp_text, 0)

    # all processes participate in checkpointing (orbax coordinates
    # multi-host saves; params are replicated so the arrays are identical)
    ckpt = Checkpointer(cfg.checkpoint_dir, keep=cfg.keep_checkpoints)
    if args.checkpoint == "latest":
        latest = ckpt.latest()
        if latest is not None:
            ckpt.restore(latest, trainer)
        else:
            print(f"[train] no checkpoint in {cfg.checkpoint_dir}; "
                  "starting fresh")
    elif args.checkpoint:
        ckpt.restore(args.checkpoint, trainer)

    if args.profile:
        trainer.profile_dir = args.profile

    trainer.train(checkpointer=ckpt)


if __name__ == "__main__":
    main()
