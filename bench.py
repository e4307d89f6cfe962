#!/usr/bin/env python3
"""Benchmark: env-steps/s/chip on 20-robot arenas (the BASELINE.json metric).

Prints exactly ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Diagnostics go to stderr.

What is measured
────────────────
The full daisy env step (the heaviest path: 8-ray wall raycast over 14
segments, pairwise robot proximity, light, RAB, all 6 behaviour modules
with state machines, integration + 3 collision passes, transition reward,
folded auto-reset) scanned under jit at E=1024 arenas of N=20 robots —
steady-state steps/s × E = arena-steps/s on one chip.

Baseline
────────
The reference publishes no numbers (BASELINE.md). The denominator is an
ESTIMATE of the reference's 64-env single-GPU throughput: its rollout is a
Python loop issuing ~100 CUDA kernels per step (SURVEY.md §3.1 "hot
loops"), making it dispatch-bound at roughly 500 env-steps/s → 32,000
arena-steps/s at E=64. For scale: the same math measured through the
reference's own torch modules on this host's (1-core) CPU does ~5,000
arena-steps/s at E=64. The estimate is deliberately generous to the
reference; see BENCH_NOTES.md for methodology.
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_ARENA_STEPS_PER_S = 32_000.0  # estimated 64-env GPU reference

# Whether the primary env bench uses the single-kernel fused step
# (ops/fused_step.py) on TPU by default. Flipped in round 4 after the
# fused path measured 16.19 M arena-steps/s vs 13.20 M composed (1.23×,
# with compile+first run down 598 s → 30 s) AND passed on-hardware
# parity validation on both env paths (scripts/tpu_validate_fused_step.py;
# BENCH_NOTES.md round-4 section).
FUSED_STEP_DEFAULT = True


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_env_steps(variant="daisy", E=32768, N=20, n_steps=500, reps=3,
                    use_pallas=True, fused_step=None):
    """Tuned per the round-1 sweep (BENCH_NOTES.md): E=32768 arenas with the
    fused Pallas sensor kernel, 500 steps per dispatch to amortize the
    ~28 ms tunnel round-trip.

    ``fused_step``: run the whole control tick as ONE Pallas program on
    an arena-on-lanes state (ops/fused_step.py). ``None`` = the current
    TPU default (see ``FUSED_STEP_DEFAULT``); ``python bench.py --fused``
    / ``--classic`` force either path for comparison.
    """
    import jax
    import jax.numpy as jnp

    from swarmacb_tpu.config.env_cfg import DirectionalGateEnvCfg
    from swarmacb_tpu.env.directional_gate import DirectionalGateEnv

    on_tpu = jax.default_backend() == "tpu"
    if fused_step is None:
        fused_step = on_tpu and FUSED_STEP_DEFAULT
    env = DirectionalGateEnv(DirectionalGateEnvCfg(
        variant=variant, num_envs=E, num_agents=N,
        use_pallas=use_pallas and on_tpu))
    key = jax.random.PRNGKey(0)
    state, obs = env.reset(key)

    if env.cfg.discrete_actions:
        actions = jax.random.randint(jax.random.PRNGKey(1), (E, N), 0, 6,
                                     dtype=jnp.int32)
    else:
        actions = jax.random.uniform(jax.random.PRNGKey(1), (E, N, 2), -1.0, 1.0)

    if fused_step:
        from swarmacb_tpu.env.lanes import state_to_lanes, step_lanes, to_lanes
        from swarmacb_tpu.ops.fused_step import check_atan2_band

        log(f"[bench] env path: fused single-kernel step (ops/fused_step.py)")
        # fail loudly if an XLA upgrade moved the atan2 rounding band the
        # kernel replicates (seconds of device time; VERDICT r4 weak #5)
        log(f"[bench] atan2 band check ok: {check_atan2_band()}")
        carry0 = state_to_lanes(env, state)
        if env.cfg.discrete_actions:
            acts_l = to_lanes(actions, E)
        else:
            acts_l = (to_lanes(actions[..., 0], E), to_lanes(actions[..., 1], E))

        @jax.jit
        def run(lanes):
            def body(l, _):
                l, reward, done, _ = step_lanes(env, l, acts_l,
                                                want_obs=False)
                return l, reward.sum()
            l, r = jax.lax.scan(body, lanes, None, length=n_steps)
            return l, r.sum()
    else:
        log(f"[bench] env path: composed step (per-phase kernels)")

        @jax.jit
        def run(state):
            def body(s, _):
                s, ts = env.step(s, actions)
                return s, ts.reward.sum()
            s, r = jax.lax.scan(body, state, None, length=n_steps)
            return s, r.sum()
        carry0 = state

    t0 = time.perf_counter()
    state2, _ = jax.block_until_ready(run(carry0))
    log(f"[bench] compile+first run: {time.perf_counter()-t0:.1f}s")

    best = 0.0
    for i in range(reps):
        t0 = time.perf_counter()
        state2, _ = jax.block_until_ready(run(state2))
        dt = time.perf_counter() - t0
        sps = n_steps / dt
        best = max(best, sps * E)
        log(f"[bench] rep {i}: {sps:,.1f} env-steps/s → {sps*E:,.0f} arena-steps/s")
    return best


def bench_train_iteration(variant="dandelion", E=64, horizon=1000,
                          mixed_precision=False):
    """Secondary: full rollout+update iteration throughput at the REAL
    reference config (horizon 1000, 3 epochs, ML-Agents minibatch
    derivation from the YAML) and the measured round-3 operating point
    E=64 — the SPS that full-budget training realizes. Delegates to
    scripts/sps_sweep.measure so there is exactly ONE implementation of
    the end-to-end train-SPS measurement (BENCH_NOTES.md SPS-vs-E
    table uses the same one)."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent / "scripts"))
    from sps_sweep import measure

    r = measure(variant, E, iters=2, horizon=horizon,
                mixed_precision=mixed_precision, phase_split=False)
    tag = ("bf16 operands" if mixed_precision else "f32") + \
        f", T={r['horizon']}, {r['path']}"
    log(f"[bench] train SPS ({tag}, agent-decisions/s, rollout+update): "
        f"{r['decisions_per_sec']:,} (compile+first "
        f"{r['compile_plus_first_s']}s)")
    return float(r["decisions_per_sec"])


def bench_seed_parallel(variant="dandelion", E=16, S=10, iters=2):
    """Secondary: the seed-parallel run unit (train.py --seeds) — S
    complete per-seed train iterations vmapped into one program at the
    validated E=16 operating point (agents/seed_parallel.py; the
    TPU-native form of the reference's 10-seed SLURM array). Reports
    aggregate decisions/s and the one-off compile, the two numbers that
    size a full 5×10 matrix job."""
    import pathlib
    import sys
    import time as _time

    import jax

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    from swarmacb_tpu.agents import SeedParallelTrainer
    from swarmacb_tpu.config.loader import load_config
    from swarmacb_tpu.env import make_env

    cfg_path = pathlib.Path(__file__).resolve().parent / "configs" / \
        f"DirGate_{variant}.yaml"
    _, variant, cfg, _ = load_config(str(cfg_path))
    cfg.checkpoint_interval = 10**12
    env = make_env("SwarmACB-DirectionalGate-v0", variant=variant,
                   num_envs=E, use_pallas=jax.default_backend() == "tpu")
    tr = SeedParallelTrainer(env, cfg, list(range(S)))
    es, obs, carry = tr._reset_all()
    t0 = _time.perf_counter()
    es, obs, carry, _ = tr.train_iteration(es, obs, carry)
    compile_s = _time.perf_counter() - t0
    t0 = _time.perf_counter()
    for _ in range(iters):
        es, obs, carry, _ = tr.train_iteration(es, obs, carry)
    dt = (_time.perf_counter() - t0) / iters
    dec = cfg.horizon * E * env.num_agents
    agg = S * dec / dt
    log(f"[bench] seed-parallel {variant} S={S}×E={E}: {dt:.1f}s/iter, "
        f"aggregate {agg:,.0f} decisions/s (compile+first {compile_s:.1f}s; "
        f"full 120M-decision 10-seed unit ≈ "
        f"{120e6 / (dec / dt) / 3600:.1f} h in ONE job)")
    return agg


def main():
    import jax

    log(f"[bench] devices: {jax.devices()}")
    fused = None
    if "--fused" in sys.argv:
        fused = True
    elif "--classic" in sys.argv:
        fused = False
    value = bench_env_steps(fused_step=fused)
    try:
        train_sps = bench_train_iteration()  # realized reference config
    except Exception as e:  # secondary metric must not kill the benchmark
        log(f"[bench] train-iteration bench failed: {e!r}")
        train_sps = None
    # comparison variant: a failure here must not erase the measured
    # primary train SPS above. (The fused_tail=False / fused_attention
    # lanes were measured and decided in round 2 — BENCH_NOTES.md — and
    # are no longer re-benched every round.)
    try:
        if jax.default_backend() == "tpu":
            bench_train_iteration(mixed_precision=True)
    except Exception as e:
        log(f"[bench] train-iteration comparison bench failed: {e!r}")
    # seed-parallel run unit (round 5): aggregate matrix throughput
    try:
        if jax.default_backend() == "tpu":
            bench_seed_parallel()
    except Exception as e:
        log(f"[bench] seed-parallel bench failed: {e!r}")

    result = {
        "metric": "env_steps_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "arena-steps/s/chip (20-robot daisy arenas, E=32768, full sensor+behaviour step)",
        "vs_baseline": round(value / BASELINE_ARENA_STEPS_PER_S, 2),
    }
    if train_sps is not None:
        log(f"[bench] secondary train_agent_decisions_per_sec={train_sps:,.0f}")
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
