"""Directional Gate environment tests: reward, reset, ordering contract."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from swarmacb_tpu.config.env_cfg import DirectionalGateEnvCfg
from swarmacb_tpu.env import sensors
from swarmacb_tpu.env.directional_gate import DirectionalGateEnv


def make_env(**kw):
    return DirectionalGateEnv(DirectionalGateEnvCfg(**kw))


def test_reset_shapes_and_bounds():
    env = make_env(num_envs=4, variant="dandelion")
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert state.pos.shape == (4, 20, 2)
    assert obs.shape == (4, 20, 24)
    r = np.linalg.norm(np.asarray(state.pos), axis=-1)
    assert r.max() <= env.cfg.inradius - 2 * env.cfg.robot_radius + 1e-5
    yaw = np.asarray(state.yaw)
    assert yaw.min() >= -math.pi and yaw.max() <= math.pi
    # prev_ground seeded from spawn positions
    np.testing.assert_allclose(
        np.asarray(state.prev_ground),
        np.asarray(sensors.ground_color(state.pos, env.cfg)),
    )


def test_step_continuous_moves_forward():
    env = make_env(num_envs=1, variant="dandelion")
    state, _ = env.reset(jax.random.PRNGKey(1))
    # place robot 0 at origin facing east, full forward
    pos = state.pos.at[0, 0].set(jnp.array([0.0, -0.5]))
    yaw = state.yaw.at[0, 0].set(0.0)
    state = state.replace(pos=pos, yaw=yaw)
    actions = jnp.zeros((1, 20, 2)).at[0, 0].set(jnp.array([1.0, 1.0]))
    state2, ts = env.step(state, actions)
    # moved 0.12 * 0.1 = 0.012 east (unless a collision interfered)
    np.testing.assert_allclose(
        float(state2.pos[0, 0, 0]), 0.012, atol=1e-4
    )
    assert ts.obs.shape == (1, 20, 24)


def test_action_clamping():
    env = make_env(num_envs=1, variant="dandelion")
    state, _ = env.reset(jax.random.PRNGKey(2))
    pos = state.pos.at[0, 0].set(jnp.array([0.0, -0.8]))
    yaw = state.yaw.at[0, 0].set(math.pi / 2)
    state = state.replace(pos=pos, yaw=yaw)
    actions = jnp.zeros((1, 20, 2)).at[0, 0].set(jnp.array([5.0, 5.0]))  # clamps to 1
    state2, _ = env.step(state, actions)
    np.testing.assert_allclose(
        float(state2.pos[0, 0, 1]) - float(state.pos[0, 0, 1]), 0.012, atol=1e-4
    )


def _single_robot_state(env, xy, yaw_val, key=0):
    """All robots parked far apart; robot 0 at xy with heading yaw."""
    state, _ = env.reset(jax.random.PRNGKey(key))
    N = env.cfg.num_agents
    # park robots 1.. in a spread ring in the grey south region
    angles = np.linspace(2.4, 4.0, N - 1)
    ring = np.stack([np.cos(angles), np.sin(angles)], -1) * 0.9
    pos = jnp.asarray(np.concatenate([[xy], ring], 0)[None]).astype(jnp.float32)
    yaw = jnp.asarray(np.full((1, N), 0.0, np.float32)).at[0, 0].set(yaw_val)
    state = state.replace(pos=pos, yaw=yaw,
                          prev_ground=sensors.ground_color(pos, env.cfg))
    return state


def test_reward_black_to_white_crossing():
    """Robot driving south from corridor (black) into gate (white) → +1."""
    env = make_env(num_envs=1, variant="dandelion")
    cs = env.cfg.corridor_south_y
    state = _single_robot_state(env, [0.0, cs + 0.005], -math.pi / 2)
    assert float(state.prev_ground[0, 0]) == 0.0  # black
    actions = jnp.zeros((1, 20, 2)).at[0, 0].set(jnp.array([1.0, 1.0]))
    state2, ts = env.step(state, actions)  # moves 1.2 cm south → white
    assert float(ts.reward[0]) == 1.0
    assert float(state2.episode_reward[0]) == 1.0
    # reverse: white → black gives −1
    state3 = state2.replace(yaw=state2.yaw.at[0, 0].set(math.pi / 2))
    state4, ts2 = env.step(state3, actions)
    assert float(ts2.reward[0]) == -1.0
    assert float(state4.episode_reward[0]) == 0.0


def test_no_reward_grey_transitions():
    env = make_env(num_envs=1, variant="dandelion")
    gs = env.cfg.gate_south_y
    # white gate → grey (south exit of gate): no reward
    state = _single_robot_state(env, [0.0, gs + 0.005], -math.pi / 2)
    assert float(state.prev_ground[0, 0]) == 1.0
    actions = jnp.zeros((1, 20, 2)).at[0, 0].set(jnp.array([1.0, 1.0]))
    _, ts = env.step(state, actions)
    assert float(ts.reward[0]) == 0.0


def test_timeout_done_and_autoreset():
    env = make_env(num_envs=2, variant="dandelion")
    state, _ = env.reset(jax.random.PRNGKey(3))
    # fast-forward env 0 to one step before truncation
    limit = env.cfg.max_episode_length - 1  # 1199 (Isaac: done at buf >= limit)
    state = state.replace(
        step_count=jnp.array([limit - 1, 0], dtype=jnp.int32),
        episode_reward=jnp.array([3.0, 1.0]),
    )
    old_pos0 = np.asarray(state.pos[0])
    actions = jnp.zeros((2, 20, 2))
    state2, ts = env.step(state, actions)
    assert bool(ts.done[0]) and not bool(ts.done[1])
    assert int(state2.step_count[0]) == 0
    assert int(state2.step_count[1]) == 1
    # group reward snapshotted then zeroed
    assert float(state2.completed_group_reward[0]) == 3.0
    assert float(state2.episode_reward[0]) == 0.0
    assert float(state2.episode_reward[1]) == 1.0
    # poses resampled for env 0 only
    assert not np.allclose(np.asarray(state2.pos[0]), old_pos0, atol=1e-4)


def test_discrete_obs_uses_stale_sensors():
    """Daisy obs must carry PRE-step proximity (the sensor-cache contract,
    directional_gate_env.py:495-504,657-662) while ground is fresh."""
    env = make_env(num_envs=1, variant="daisy")
    state, _ = env.reset(jax.random.PRNGKey(4))
    cache = env._compute_sensor_block(state.pos, state.yaw)
    actions = jnp.ones((1, 20), dtype=jnp.int32)  # STOP for everyone
    state2, ts = env.step(state, actions)
    # robots stopped → positions unchanged (no collisions at spawn):
    # stale == fresh here, so instead drive and compare against pre-step.
    state3 = state2.replace(pos=state2.pos + 0.01)  # force movement
    cache3 = env._compute_sensor_block(state3.pos, state3.yaw)
    actions_expl = jnp.zeros((1, 20), dtype=jnp.int32)  # EXPLORATION: drives
    state4, ts4 = env.step(state3, actions_expl)
    np.testing.assert_allclose(
        np.asarray(ts4.obs[0, :, 0:8]), np.asarray(cache3["prox_vals"][0]),
        atol=1e-6,
    )
    # ground channel is fresh (post-step positions)
    np.testing.assert_allclose(
        np.asarray(ts4.obs[..., 16]),
        np.asarray(sensors.ground_color(state4.pos, env.cfg)),
        atol=1e-7,
    )


def test_lily_obs_layout():
    env = make_env(num_envs=2, variant="lily")
    state, obs = env.reset(jax.random.PRNGKey(5))
    assert obs.shape == (2, 20, 4)
    actions = jnp.zeros((2, 20), dtype=jnp.int32)
    state2, ts = env.step(state, actions)
    assert ts.obs.shape == (2, 20, 4)


def test_determinism_same_key():
    env = make_env(num_envs=2, variant="daisy")
    s1, o1 = env.reset(jax.random.PRNGKey(9))
    s2, o2 = env.reset(jax.random.PRNGKey(9))
    actions = jnp.zeros((2, 20), dtype=jnp.int32)
    for _ in range(5):
        s1, t1 = env.step(s1, actions)
        s2, t2 = env.step(s2, actions)
    np.testing.assert_array_equal(np.asarray(s1.pos), np.asarray(s2.pos))
    np.testing.assert_array_equal(np.asarray(t1.obs), np.asarray(t2.obs))


def test_jit_and_scan_compatible():
    env = make_env(num_envs=3, variant="daisy")
    state, _ = env.reset(jax.random.PRNGKey(6))

    @jax.jit
    def run(state):
        def body(s, _):
            s, ts = env.step(s, jnp.zeros((3, 20), dtype=jnp.int32))
            return s, ts.reward
        return jax.lax.scan(body, state, None, length=10)

    state2, rewards = run(state)
    assert rewards.shape == (10, 3)
    # jitted matches eager
    s_e = state
    for _ in range(10):
        s_e, _ = env.step(s_e, jnp.zeros((3, 20), dtype=jnp.int32))
    np.testing.assert_allclose(np.asarray(state2.pos), np.asarray(s_e.pos), atol=1e-6)


def test_critic_state_shape_and_range():
    env = make_env(num_envs=2)
    state, _ = env.reset(jax.random.PRNGKey(7))
    cs = env.critic_state(state)
    assert cs.shape == (2, 20, 5)
    c = np.asarray(cs)
    assert c[..., 0].min() >= 0 and c[..., 0].max() <= 1
    assert np.abs(c[..., 1:]).max() <= 1 + 1e-5


def test_robots_stay_inside_arena_long_run():
    """200 exploration steps: no robot beyond the reference's effective
    boundary (inradius + east-bulge tolerance)."""
    env = make_env(num_envs=2, variant="daisy")
    state, _ = env.reset(jax.random.PRNGKey(8))
    actions = jnp.zeros((2, 20), dtype=jnp.int32)  # EXPLORATION

    @jax.jit
    def run(state):
        def body(s, _):
            s, _ = env.step(s, actions)
            return s, s.pos
        return jax.lax.scan(body, state, None, length=200)

    _, traj = run(state)
    r = np.linalg.norm(np.asarray(traj), axis=-1)
    # the replicated east-face gap allows ~0.155 m bulge past the inradius
    assert r.max() < env.cfg.arena_circumradius + 0.16
