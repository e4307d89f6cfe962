#!/usr/bin/env python3
"""Quantify TPU↔CPU stepper drift over full 1200-step episodes.

SURVEY §7 hard-part #1's second half: the env was validated bit-level on
CPU-JAX against the reference torch stepper; this measures how far the
TPU backend's trajectories diverge from the CPU ones (different fp
contraction/fusion order on the MXU/VPU), over complete episodes, for
both the jnp path and the Pallas kernel path.

Runs where both a TPU and the CPU platform are visible in one process
(the axon hosts qualify). Prints per-variant max |Δ| of position / yaw /
reward and per-step reward agreement; tests/test_tpu_drift.py pins the
tolerance, PARITY.md records the numbers.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from swarmacb_tpu.config.env_cfg import DirectionalGateEnvCfg
from swarmacb_tpu.env.directional_gate import DirectionalGateEnv

STEPS = 1200          # one full episode (120 s × 10 Hz)
E, N = 4, 20


def run_trajectory(device, variant, use_pallas, steps=STEPS):
    env = DirectionalGateEnv(DirectionalGateEnvCfg(
        variant=variant, num_envs=E, num_agents=N, use_pallas=use_pallas))
    rng = np.random.default_rng(2024)
    if env.cfg.discrete_actions:
        actions = jnp.asarray(rng.integers(0, 6, (steps, E, N)).astype(np.int32))
    else:
        actions = jnp.asarray(
            rng.uniform(-1.5, 1.5, (steps, E, N, 2)).astype(np.float32))

    @jax.jit
    def run(state, actions):
        def body(s, a):
            s, ts = env.step(s, a)
            return s, (s.pos, s.yaw, ts.reward)
        return jax.lax.scan(body, state, actions)

    with jax.default_device(device):
        state, _ = env.reset(jax.random.PRNGKey(7))
        _, (pos, yaw, reward) = jax.block_until_ready(run(state, actions))
    return (np.asarray(pos), np.asarray(yaw), np.asarray(reward))


def main():
    cpus = jax.devices("cpu")
    tpus = [d for d in jax.devices() if d.platform != "cpu"]
    if not tpus:
        print(json.dumps({"error": "no TPU visible"}))
        return 1
    out = {}
    for variant in ("dandelion", "daisy", "lily"):
        cpu_traj = run_trajectory(cpus[0], variant, use_pallas=False)
        tpu_traj = run_trajectory(tpus[0], variant, use_pallas=False)
        pal_traj = run_trajectory(tpus[0], variant, use_pallas=True)
        for name, t in (("tpu_jnp", tpu_traj), ("tpu_pallas", pal_traj)):
            d_pos_t = np.abs(t[0] - cpu_traj[0]).reshape(STEPS, -1).max(1)
            # divergence onset: the discrete variants' avoidance state
            # machines amplify ulp-level fp differences chaotically (a
            # threshold flip latches a different turn), so full-episode
            # positional identity is not the right criterion — onset step
            # and aggregate reward agreement are
            over = np.nonzero(d_pos_t > 1e-3)[0]
            onset = int(over[0]) if over.size else STEPS
            d_pos100 = float(d_pos_t[:100].max())
            d_rew = float(np.abs(t[2] - cpu_traj[2]).max())
            rew_eq = float((t[2] == cpu_traj[2]).mean())
            ep_sum_diff = float(
                np.abs(t[2].sum(0) - cpu_traj[2].sum(0)).max())
            out[f"{variant}/{name}"] = {
                "max_pos_drift_m": float(d_pos_t.max()),
                "pos_drift_100_steps_m": d_pos100,
                "divergence_onset_step": onset,
                "max_reward_diff": d_rew,
                "reward_step_agreement": rew_eq,
                "episode_reward_sum_diff": ep_sum_diff,
            }
            print(f"{variant:10s} {name:10s} pos@100 {d_pos100:.2e} m  "
                  f"onset step {onset}  reward agree {rew_eq*100:.2f}%  "
                  f"|Σreward Δ| {ep_sum_diff:.0f}", flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
