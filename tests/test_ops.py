"""Pallas pairwise kernels vs the jnp reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from swarmacb_tpu.config.env_cfg import DirectionalGateEnvCfg
from swarmacb_tpu.env import physics, sensors
from swarmacb_tpu.env.directional_gate import DirectionalGateEnv
from swarmacb_tpu.ops import pairwise_sensors, resolve_robot_collisions

CFG = DirectionalGateEnvCfg()
ENV = DirectionalGateEnv(CFG)


def _poses(E=7, N=20, seed=0):
    rng = np.random.default_rng(seed)
    r = np.sqrt(rng.uniform(0, 1, (E, N))) * 1.1
    th = rng.uniform(0, 2 * np.pi, (E, N))
    pos = np.stack([r * np.cos(th), r * np.sin(th)], -1).astype(np.float32)
    yaw = rng.uniform(-np.pi, np.pi, (E, N)).astype(np.float32)
    return jnp.asarray(pos), jnp.asarray(yaw)


def test_pairwise_sensors_matches_jnp():
    pos, yaw = _poses()
    wdx, wdy = sensors.sensor_world_dirs(yaw)
    ref_prox = sensors.detect_robots_proximity(pos, wdx, wdy, CFG.prox_range,
                                               CFG.robot_radius)
    ref_z, ref_proj, ref_ax, ref_ay = sensors.compute_rab(
        pos, yaw, CFG.rab_range, CFG.alpha_parameter)

    prox, z, proj, ax, ay = pairwise_sensors(
        pos, yaw, prox_range=CFG.prox_range, robot_radius=CFG.robot_radius,
        rab_range=CFG.rab_range, alpha_rab=CFG.alpha_parameter, interpret=True)

    np.testing.assert_allclose(np.asarray(prox), np.asarray(ref_prox), atol=2e-6)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref_z), atol=2e-6)
    np.testing.assert_allclose(np.asarray(proj), np.asarray(ref_proj), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ax), np.asarray(ref_ax), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ay), np.asarray(ref_ay), atol=2e-5)


def test_pairwise_sensors_nonmultiple_batch():
    """E=130 exercises the lane padding path (128 + 2)."""
    pos, yaw = _poses(E=130, N=6, seed=1)
    cfg = CFG
    prox, z, proj, ax, ay = pairwise_sensors(
        pos, yaw, prox_range=cfg.prox_range, robot_radius=cfg.robot_radius,
        rab_range=cfg.rab_range, alpha_rab=cfg.alpha_parameter, interpret=True)
    wdx, wdy = sensors.sensor_world_dirs(yaw)
    ref_prox = sensors.detect_robots_proximity(pos, wdx, wdy, cfg.prox_range,
                                               cfg.robot_radius)
    np.testing.assert_allclose(np.asarray(prox), np.asarray(ref_prox), atol=2e-6)
    assert prox.shape == (130, 6, 8)


def test_collision_kernel_matches_jnp():
    rng = np.random.default_rng(2)
    pos = jnp.asarray(rng.uniform(-0.2, 0.2, (5, 20, 2)).astype(np.float32))
    ref = physics.resolve_robot_collisions(pos, CFG.robot_radius)
    ours = resolve_robot_collisions(pos, CFG.robot_radius, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-6)


def test_env_pallas_flag_matches_default():
    """Full daisy env step with use_pallas (interpret on CPU) vs jnp path."""
    import jax
    from swarmacb_tpu.env.behaviors import BehaviorState

    cfg_a = DirectionalGateEnvCfg(variant="daisy", num_envs=2, num_agents=6)
    cfg_b = cfg_a.replace(use_pallas=True)
    env_a, env_b = DirectionalGateEnv(cfg_a), DirectionalGateEnv(cfg_b)
    key = jax.random.PRNGKey(0)
    sa, _ = env_a.reset(key)
    sb, _ = env_b.reset(key)
    actions = jnp.zeros((2, 6), dtype=jnp.int32)
    for _ in range(3):
        sa, ta = env_a.step(sa, actions)
        sb, tb = env_b.step(sb, actions)
    np.testing.assert_allclose(np.asarray(sa.pos), np.asarray(sb.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ta.obs), np.asarray(tb.obs), atol=1e-4)


def test_pairwise_sensors_fused_raycast_matches_jnp():
    """With wall_segments passed, the kernel's prox output must equal
    max(jnp wall raycast, jnp robot cone test) per sensor."""
    pos, yaw = _poses(E=5, N=20, seed=3)
    wdx, wdy = sensors.sensor_world_dirs(yaw)
    wall = sensors.raycast_segments(pos, wdx, wdy, ENV.wall_segments,
                                    CFG.prox_range)
    robot = sensors.detect_robots_proximity(pos, wdx, wdy, CFG.prox_range,
                                            CFG.robot_radius)
    ref_prox = jnp.maximum(wall, robot)

    prox, *_ = pairwise_sensors(
        pos, yaw, prox_range=CFG.prox_range, robot_radius=CFG.robot_radius,
        rab_range=CFG.rab_range, alpha_rab=CFG.alpha_parameter,
        wall_segments=ENV.wall_segments, interpret=True)

    assert np.asarray(wall).max() > 0, "poses never see a wall — weak test"
    np.testing.assert_allclose(np.asarray(prox), np.asarray(ref_prox), atol=2e-6)


def test_pairwise_sensors_larger_swarm():
    """The arena-on-lanes layout is N-agnostic — verify at N=40 (2x the
    mission's swarm) against the jnp path, walls fused."""
    pos, yaw = _poses(E=3, N=40, seed=5)
    wdx, wdy = sensors.sensor_world_dirs(yaw)
    wall = sensors.raycast_segments(pos, wdx, wdy, ENV.wall_segments,
                                    CFG.prox_range)
    robot = sensors.detect_robots_proximity(pos, wdx, wdy, CFG.prox_range,
                                            CFG.robot_radius)
    ref_prox = jnp.maximum(wall, robot)
    ref_z, ref_proj, ref_ax, ref_ay = sensors.compute_rab(
        pos, yaw, CFG.rab_range, CFG.alpha_parameter)

    prox, z, proj, ax, ay = pairwise_sensors(
        pos, yaw, prox_range=CFG.prox_range, robot_radius=CFG.robot_radius,
        rab_range=CFG.rab_range, alpha_rab=CFG.alpha_parameter,
        wall_segments=ENV.wall_segments, interpret=True)

    np.testing.assert_allclose(np.asarray(prox), np.asarray(ref_prox), atol=2e-6)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref_z), atol=2e-6)
    np.testing.assert_allclose(np.asarray(proj), np.asarray(ref_proj), atol=5e-5)

    ref_coll = physics.resolve_robot_collisions(pos, CFG.robot_radius)
    ours_coll = resolve_robot_collisions(pos, CFG.robot_radius, interpret=True)
    np.testing.assert_allclose(np.asarray(ours_coll), np.asarray(ref_coll),
                               atol=2e-6)
