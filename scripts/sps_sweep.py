#!/usr/bin/env python3
"""Training-throughput sweep over the arena count E (VERDICT r2 #1).

Measures END-TO-END train SPS (agent-decisions/s, rollout + full PPO
update) through the real trainer at the real reference config
(horizon 1000, 3 epochs, ML-Agents minibatch derivation) — the number
`bench.py`'s train-iter metric approximates at T=100 and VALIDATION.md's
runs realize at E=16. The sweep pins the SPS-vs-E curve so the
full-budget operating point is a measured choice, not a guess.

For each E it reports:
  - which update path ran (fused single-program vs split per-minibatch)
  - decisions/s over `--iters` timed iterations (after a compile+warmup)
  - a phase split (rollout / prep / minibatch-steps) from one extra
    instrumented iteration (blocking per phase — reported separately
    because blocking suppresses dispatch pipelining)

Usage:
    python scripts/sps_sweep.py --variant dandelion --envs 16,64,256,1024
    python scripts/sps_sweep.py --variant daisy --envs 64,256 --horizon 1000
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def measure(variant: str, E: int, iters: int, horizon: int | None,
            mixed_precision: bool, phase_split: bool,
            accum_chunk_groups: int | None = None,
            mp_stages: str | None = None,
            fused_env_step: bool | None = None) -> dict:
    import jax

    from swarmacb_tpu.agents import POCATrainer
    from swarmacb_tpu.config.loader import load_config
    from swarmacb_tpu.env import make_env

    cfg_path = pathlib.Path(__file__).resolve().parents[1] / "configs" / \
        f"DirGate_{variant}.yaml"
    _, variant, cfg, _ = load_config(str(cfg_path))
    if horizon is not None:
        cfg.horizon = horizon
    cfg.mixed_precision = mixed_precision
    if mp_stages is not None:
        cfg.mp_stages = mp_stages
    if accum_chunk_groups is not None:
        cfg.accum_chunk_groups = accum_chunk_groups
    if fused_env_step is not None:
        cfg.fused_env_step = fused_env_step

    env = make_env("SwarmACB-DirectionalGate-v0", variant=variant,
                   num_envs=E, use_pallas=jax.default_backend() == "tpu")
    trainer = POCATrainer(env, cfg)
    decisions_per_iter = cfg.horizon * E * env.num_agents

    key = jax.random.PRNGKey(0)
    env_state, obs = env.reset(key)
    carry = trainer.init_actor_carry() if trainer.recurrent else ()

    t0 = time.perf_counter()
    env_state, obs, carry, _ = trainer.train_iteration(env_state, obs, carry)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(iters):
        env_state, obs, carry, _ = trainer.train_iteration(env_state, obs,
                                                           carry)
    dt = time.perf_counter() - t0

    out = {
        "variant": variant, "E": E, "horizon": cfg.horizon,
        "path": "split" if trainer._use_split_update else "fused",
        "group_mb": trainer.group_mb,
        "chunk_rows": trainer._chunk_rows(trainer.group_mb),
        "mixed_precision": mixed_precision,
        "fused_env_step": trainer._use_lanes,
        "compile_plus_first_s": round(compile_s, 1),
        "iter_s": round(dt / iters, 2),
        "decisions_per_sec": round(decisions_per_iter * iters / dt),
    }

    if phase_split and trainer._use_split_update:
        # one instrumented iteration: block per phase (suppresses dispatch
        # overlap, so the phase sum can exceed the unblocked iter time)
        acc = {"rollout": 0.0, "prep": 0.0, "mb_steps": 0.0, "n_mb": 0}

        def timed(fn, name, count=False):
            def inner(*a, **k):
                t = time.perf_counter()
                r = fn(*a, **k)
                jax.block_until_ready(r)
                acc[name] += time.perf_counter() - t
                if count:
                    acc["n_mb"] += 1
                return r
            return inner

        saved = (trainer._rollout_jit, trainer._prep_update_jit,
                 trainer._mb_step_jit)
        trainer._rollout_jit = timed(saved[0], "rollout")
        trainer._prep_update_jit = timed(saved[1], "prep")
        trainer._mb_step_jit = timed(saved[2], "mb_steps", count=True)
        t0 = time.perf_counter()
        trainer.train_iteration(env_state, obs, carry)
        blocked_iter = time.perf_counter() - t0
        (trainer._rollout_jit, trainer._prep_update_jit,
         trainer._mb_step_jit) = saved
        out["phase_split_s"] = {
            "rollout": round(acc["rollout"], 2),
            "prep": round(acc["prep"], 2),
            "mb_steps_total": round(acc["mb_steps"], 2),
            "n_mb_programs": acc["n_mb"],
            "blocked_iter": round(blocked_iter, 2),
        }
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="dandelion")
    p.add_argument("--envs", default="16,64,256,1024")
    p.add_argument("--iters", type=int, default=2)
    p.add_argument("--horizon", type=int, default=None,
                   help="Override horizon (default: the YAML's 1000). "
                        "Useful to bound measurement time at very large E "
                        "— per-decision cost is linear in T.")
    p.add_argument("--mixed_precision", action="store_true")
    p.add_argument("--mp_stages", type=str, default=None,
                   help="Subset of 'qkvo' for --mixed_precision "
                        "(POCAConfig.mp_stages)")
    p.add_argument("--no-phase-split", action="store_true")
    p.add_argument("--fused_env_step", choices=("config", "on", "off"),
                   default="config",
                   help="fused single-kernel env step in the rollout scan "
                        "(POCAConfig.fused_env_step)")
    p.add_argument("--accum_chunk_groups", type=int, default=None,
                   help="Override POCAConfig.accum_chunk_groups (the "
                        "gradient-accumulation chunk size in groups)")
    args = p.parse_args()

    for E in [int(e) for e in args.envs.split(",")]:
        r = measure(args.variant, E, args.iters, args.horizon,
                    args.mixed_precision, not args.no_phase_split,
                    args.accum_chunk_groups, args.mp_stages,
                    None if args.fused_env_step == "config"
                    else args.fused_env_step == "on")
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
