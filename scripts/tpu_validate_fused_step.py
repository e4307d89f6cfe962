#!/usr/bin/env python3
"""On-TPU validation of the fused single-kernel env step
(ops/fused_step.py) against the jnp step, with injected random draws.

The interpret-mode parity suite (tests/test_fused_step.py) pins the
semantics on CPU; this script re-runs the same comparison with the
KERNEL COMPILED BY MOSAIC on the real chip, catching hardware-specific
miscompiles the interpreter cannot. Both paths run on the same backend,
so jnp-side TPU drift cancels out of the comparison.

    python scripts/tpu_validate_fused_step.py [--E 256] [--steps 40]

Checks per step: positions/yaw within the documented numerics mode
(atan2-free vector math, NR rsqrt, branchless yaw wrap), and EXACT
equality of reward, done, step counters, episode accounting, and all
nine behaviour-machine arrays. Exit 0 = pass.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--E", type=int, default=256)
    ap.add_argument("--N", type=int, default=20)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--variant", default="daisy")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--pos-atol", type=float, default=5e-5)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from swarmacb_tpu.config.env_cfg import DirectionalGateEnvCfg
    from swarmacb_tpu.env.directional_gate import DirectionalGateEnv
    from swarmacb_tpu.env.lanes import (lanes_to_state, state_to_lanes,
                                        step_lanes, to_lanes)

    log(f"[val] backend={jax.default_backend()} devices={jax.devices()}")
    x = jnp.ones((128, 128))
    jax.block_until_ready(x @ x)
    log("[val] health check ok")

    # guard the kernel's atan2-band replication against XLA lowering
    # drift BEFORE running parity: a changed lowering makes the int-state
    # comparison below fail confusingly (≈0.2% of avoidance latches flip)
    # while this probe names the cause directly
    from swarmacb_tpu.ops.fused_step import check_atan2_band

    offsets = check_atan2_band()
    log(f"[val] atan2 band check ok (first-accept ULP offsets: {offsets})")

    E, N = args.E, args.N
    cfg = DirectionalGateEnvCfg(
        variant=args.variant, num_envs=E, num_agents=N,
        use_pallas=jax.default_backend() == "tpu")
    env = DirectionalGateEnv(cfg)
    state, _ = env.reset(jax.random.PRNGKey(0))
    lanes = state_to_lanes(env, state)

    @jax.jit
    def step_ref(s, a, d, sp):
        return env.step(s, a, injected_durations=d, injected_spawn=sp)

    @jax.jit
    def step_fused(l, a, d, sp):
        return step_lanes(env, l, a, injected_durations=d, injected_spawn=sp)

    rng = np.random.default_rng(1)
    discrete = cfg.discrete_actions
    worst_pos = 0.0
    for t in range(args.steps):
        if discrete:
            acts = jnp.asarray(rng.integers(0, 6, (E, N)), dtype=jnp.int32)
            acts_l = to_lanes(acts, E)
            dur = {k: jnp.asarray(rng.integers(1, 5, (E, N)), dtype=jnp.int32)
                   for k in ("explore", "photo", "antiphoto")}
        else:
            acts = jnp.asarray(rng.uniform(-1.5, 1.5, (E, N, 2)),
                               dtype=jnp.float32)
            acts_l = (to_lanes(acts[..., 0], E), to_lanes(acts[..., 1], E))
            dur = None
        spos = jnp.asarray(rng.uniform(-0.5, 0.5, (E, N, 2)),
                           dtype=jnp.float32)
        syaw = jnp.asarray(rng.uniform(-3.1, 3.1, (E, N)), dtype=jnp.float32)

        state, ts = step_ref(state, acts, dur, (spos, syaw))
        lanes, reward, done, _ = step_fused(lanes, acts_l, dur, (spos, syaw))
        fused = lanes_to_state(env, lanes)

        dp = float(jnp.abs(fused.pos - state.pos).max())
        dy = float(jnp.abs(fused.yaw - state.yaw).max())
        worst_pos = max(worst_pos, dp, dy)
        ok_int = (
            bool((reward == ts.reward).all())
            and bool((done == ts.done).all())
            and bool((fused.step_count == state.step_count).all())
            and bool((fused.episode_reward == state.episode_reward).all()))
        if discrete:
            for n in ("explore_state", "explore_steps", "explore_dir",
                      "photo_avoiding", "photo_steps", "photo_dir",
                      "antiphoto_avoiding", "antiphoto_steps",
                      "antiphoto_dir"):
                ok_int &= bool((np.asarray(getattr(fused.behavior, n))
                                == np.asarray(getattr(state.behavior, n)))
                               .all())
        if dp > args.pos_atol or dy > args.pos_atol or not ok_int:
            log(f"[val] FAIL at step {t}: |dpos|={dp:.2e} |dyaw|={dy:.2e} "
                f"int_exact={ok_int}")
            return 1
    log(f"[val] PASS: {args.steps} steps, E={E} N={N} variant="
        f"{args.variant}; worst |dpos/dyaw| = {worst_pos:.2e}; all "
        f"integer/boolean state exact")
    print("PASS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
