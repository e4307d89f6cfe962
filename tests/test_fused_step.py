"""Parity of the fully-fused env-step kernel (ops/fused_step.py) vs the
jnp step, run in Pallas interpret mode on CPU.

Random draws (turn durations, reset spawns) are INJECTED identically
into both paths, so all integer/boolean logic — behaviour state
machines, reward counts, done/reset — must be EXACT, and positions/yaw
track within the kernel's documented numerics mode (atan2-free vector
math, NR-refined rsqrt, branchless yaw wrap: ~1e-6/step)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # interpret-mode Pallas parity: minutes on a 1-core host

from swarmacb_tpu.config.env_cfg import DirectionalGateEnvCfg
from swarmacb_tpu.env.directional_gate import DirectionalGateEnv
from swarmacb_tpu.env.lanes import (lanes_to_state, obs_from_tiles,
                                    state_to_lanes, step_lanes, to_lanes)

E, N, STEPS = 3, 6, 20


def _run_both(variant, steps=STEPS, episode_length_s=120.0, seed=0):
    # short episodes (episode_length_s=1.0 → max_episode_length 10) make
    # the folded auto-reset fire inside the comparison window
    cfg = DirectionalGateEnvCfg(variant=variant, num_envs=E, num_agents=N,
                                episode_length_s=episode_length_s)
    env = DirectionalGateEnv(cfg)
    state, _ = env.reset(jax.random.PRNGKey(seed))
    lanes = state_to_lanes(env, state)

    # jit both steppers: interpret-mode Pallas is prohibitively slow
    # when re-traced eagerly every call
    @jax.jit
    def step_ref(s, a, d, sp):
        return env.step(s, a, injected_durations=d, injected_spawn=sp)

    @jax.jit
    def step_fused(l, a, d, sp):
        return step_lanes(env, l, a, injected_durations=d,
                          injected_spawn=sp)

    rng = np.random.default_rng(seed + 1)
    results = []
    for t in range(steps):
        if cfg.discrete_actions:
            acts = jnp.asarray(rng.integers(0, 6, (E, N)), dtype=jnp.int32)
            acts_l = to_lanes(acts, E)
            dur = {k: jnp.asarray(rng.integers(1, 5, (E, N)),
                                  dtype=jnp.int32)
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
        lanes, reward, done, obs_tiles = step_fused(
            lanes, acts_l, dur, (spos, syaw))
        fused_obs = obs_from_tiles(env, obs_tiles, lanes["prev"])
        results.append((state, ts, lanes_to_state(env, lanes), reward, done,
                        fused_obs))
    return env, results


@pytest.mark.parametrize("variant", ["daisy", "lily", "dandelion"])
def test_fused_step_matches_jnp(variant):
    env, results = _run_both(variant)
    for t, (s_ref, ts, s_fused, reward, done, fused_obs) in enumerate(results):
        np.testing.assert_allclose(np.asarray(s_fused.pos),
                                   np.asarray(s_ref.pos),
                                   atol=5e-5, err_msg=f"pos step {t}")
        np.testing.assert_allclose(np.asarray(s_fused.yaw),
                                   np.asarray(s_ref.yaw),
                                   atol=5e-5, err_msg=f"yaw step {t}")
        # integer / boolean logic must be EXACT
        np.testing.assert_array_equal(np.asarray(reward),
                                      np.asarray(ts.reward))
        np.testing.assert_array_equal(np.asarray(done), np.asarray(ts.done))
        np.testing.assert_array_equal(np.asarray(s_fused.step_count),
                                      np.asarray(s_ref.step_count))
        np.testing.assert_array_equal(np.asarray(s_fused.episode_reward),
                                      np.asarray(s_ref.episode_reward))
        for name in ("explore_state", "explore_steps", "explore_dir",
                     "photo_avoiding", "photo_steps", "photo_dir",
                     "antiphoto_avoiding", "antiphoto_steps",
                     "antiphoto_dir"):
            np.testing.assert_array_equal(
                np.asarray(getattr(s_fused.behavior, name)),
                np.asarray(getattr(s_ref.behavior, name)),
                err_msg=f"{name} step {t}")
        np.testing.assert_allclose(np.asarray(fused_obs), np.asarray(ts.obs),
                                   atol=5e-5, err_msg=f"obs step {t}")


def test_fused_step_auto_reset_boundary():
    """Short episodes: the folded reset (spawn override, counter zeroing,
    completed_group_reward snapshot, behaviour-machine zeroing) fires
    identically in both paths."""
    env, results = _run_both("daisy", steps=25, episode_length_s=1.0)
    saw_done = False
    for s_ref, ts, s_fused, reward, done, _ in results:
        saw_done = saw_done or bool(np.asarray(ts.done).any())
        np.testing.assert_array_equal(np.asarray(done), np.asarray(ts.done))
        np.testing.assert_array_equal(
            np.asarray(s_fused.completed_group_reward),
            np.asarray(s_ref.completed_group_reward))
        np.testing.assert_allclose(np.asarray(s_fused.pos),
                                   np.asarray(s_ref.pos), atol=5e-5)
    assert saw_done  # the window actually crossed an episode boundary


def test_lanes_roundtrip():
    cfg = DirectionalGateEnvCfg(variant="daisy", num_envs=5, num_agents=4)
    env = DirectionalGateEnv(cfg)
    state, _ = env.reset(jax.random.PRNGKey(3))
    back = lanes_to_state(env, state_to_lanes(env, state))
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
