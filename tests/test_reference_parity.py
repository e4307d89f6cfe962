"""Full env-step trajectory parity vs the reference's Isaac-free env.

The reference ships a pure-torch, CPU-runnable copy of the kinematic world
(`StandaloneDGTEnv`, /root/reference/scripts/manual_control.py:65-369) —
the de-facto cross-framework oracle named in SURVEY.md §4. These tests
drive it and our JAX env with IDENTICAL wheel-speed sequences from
IDENTICAL poses and compare every transition: integration + yaw wrap,
arena-wall push-out, gate-side-wall clamp, robot–robot push-out, and the
colour-transition team reward.

Known, deliberate divergence (masked below): the standalone env resolves
wall faces SEQUENTIALLY in a Python loop (each face reads positions already
pushed by earlier faces, manual_control.py:333-352) while the full training
env SUMS all face pushes simultaneously (directional_gate_env.py:584-610).
The two differ exactly when a robot penetrates ≥2 faces in the same step:
polygon corners, and the west wall — whose face appears TWICE in the table
because of the reference's mid-angle wrap bug (faces 5 and 11 both resolve
to mid-angle π, directional_gate_env.py:567-576), so the training env
pushes west contacts with 2× penetration. We replicate the *training* env
(the stepper that matters for learning parity), so robots in multi-face
contact — and robots touching such a robot, which inherit the divergence
through the robot–robot pass — are excluded from comparison for that step.
"""

import importlib.util
import math
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swarmacb_tpu.config.env_cfg import DirectionalGateEnvCfg
from swarmacb_tpu.env import sensors
from swarmacb_tpu.env.behaviors import BehaviorState
from swarmacb_tpu.env.directional_gate import DirectionalGateEnv
from swarmacb_tpu.env.state import EnvState

REF_SCRIPT = pathlib.Path("/root/reference/scripts/manual_control.py")

N = 20
STEPS = 400


@pytest.fixture(scope="module")
def ref_env():
    """Reference StandaloneDGTEnv, loaded straight from the read-only mount."""
    if not REF_SCRIPT.exists():
        pytest.skip("reference repo not mounted")
    import torch

    torch.manual_seed(1234)
    spec = importlib.util.spec_from_file_location("ref_manual_control", REF_SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.StandaloneDGTEnv(num_agents=N, device="cpu")


def _our_state(env, pos, yaw, prev_ground):
    E, n = pos.shape[:2]
    return EnvState(
        pos=jnp.asarray(pos), yaw=jnp.asarray(yaw),
        prev_ground=jnp.asarray(prev_ground),
        step_count=jnp.zeros(E, jnp.int32),
        episode_reward=jnp.zeros(E, jnp.float32),
        completed_group_reward=jnp.zeros(E, jnp.float32),
        behavior=BehaviorState.init(E, n),
        key=jax.random.PRNGKey(0),
    )


def _divergence_mask(state, env, cfg, left, right, margin=1e-5):
    """Robots whose transition legitimately diverges between the standalone
    and training steppers this step (see module docstring): multi-face wall
    contact at the PRE-collision (integrated) pose, expanded to robots in
    robot-robot contact range of one.

    ``env.face_normals`` carries the duplicated west face, so west contact
    counts as 2 penetrating faces automatically.
    """
    from swarmacb_tpu.env import physics

    pos, _ = physics.integrate_and_wrap(
        state.pos, state.yaw, jnp.asarray(left), jnp.asarray(right),
        cfg.wheelbase, cfg.dt,
    )
    pos = np.asarray(pos)
    normals = np.asarray(env.face_normals)
    points = np.asarray(env.face_points)
    sd = ((pos[:, :, None, :] - points[None, None]) * normals[None, None]).sum(-1)
    pen = cfg.robot_radius - sd
    multi = (pen > -margin).sum(-1) >= 2                     # (E, N)

    d = np.linalg.norm(pos[:, :, None] - pos[:, None, :], axis=-1)  # (E,N,N)
    near = d < 2 * cfg.robot_radius + 1e-3
    contaminated = (near & multi[:, None, :]).any(-1)
    return multi | contaminated


def test_trajectory_transition_parity(ref_env):
    """400 per-step transitions, resynced from the reference each step.

    Wheel sequences are chosen so robots provably hit the arena walls, the
    gate side walls, and each other (contact counters asserted > 0).
    """
    import torch

    cfg = DirectionalGateEnvCfg(variant="dandelion", num_envs=1, num_agents=N)
    env = DirectionalGateEnv(cfg)

    rng = np.random.default_rng(7)
    # Mostly-forward wheels with per-robot turn bias: drives robots across
    # zones (reward transitions), into walls, and into one another.
    base = rng.uniform(0.5, 1.0, (STEPS, 1, N)).astype(np.float32)
    turn = rng.uniform(-0.5, 0.5, (1, 1, N)).astype(np.float32)
    wob = 0.3 * np.sin(np.arange(STEPS, dtype=np.float32) / 7.0)[:, None, None]
    left = np.clip(base + turn + wob, -1, 1) * cfg.max_wheel_speed
    right = np.clip(base - turn - wob, -1, 1) * cfg.max_wheel_speed

    wall_hits = gate_hits = robot_hits = reward_steps = masked = 0

    for t in range(STEPS):
        # ── sync our state from the reference's pre-step state ──────
        pos = ref_env.pos.numpy().copy()
        yaw = ref_env.yaw.numpy().copy()
        prev_g = ref_env.prev_ground_color.numpy().copy()
        state = _our_state(env, pos, yaw, prev_g)

        ref_env.step(torch.from_numpy(left[t]), torch.from_numpy(right[t]))
        actions = jnp.asarray(
            np.stack([left[t], right[t]], axis=-1) / cfg.max_wheel_speed
        )
        new_state, ts = env.step_jit(state, actions)

        ref_pos = ref_env.pos.numpy()
        ref_yaw = ref_env.yaw.numpy()
        ours_pos = np.asarray(new_state.pos)

        ok = ~_divergence_mask(state, env, cfg, left[t], right[t])
        masked += int((~ok).sum())
        np.testing.assert_allclose(
            ours_pos[ok], ref_pos[ok], atol=2e-6,
            err_msg=f"position mismatch at step {t}",
        )
        np.testing.assert_allclose(
            np.asarray(new_state.yaw), ref_yaw, atol=2e-6,
            err_msg=f"yaw mismatch at step {t}",
        )
        if ok.all():
            assert float(ts.reward[0]) == ref_env.step_reward, (
                f"reward mismatch at step {t}"
            )
        if ref_env.step_reward != 0:
            reward_steps += 1

        # contact accounting (so the test provably exercises collisions)
        r_in = np.linalg.norm(ref_pos[0], axis=-1)
        wall_hits += int((r_in > cfg.inradius - cfg.robot_radius - 1e-4).sum())
        in_wall_y = (ref_pos[0, :, 1] > cfg.gate_south_y) & (
            ref_pos[0, :, 1] < cfg.gate_south_y + cfg.side_wall_length
        )
        near_gate = np.abs(np.abs(ref_pos[0, :, 0]) - cfg.corridor_width / 2)
        gate_hits += int((in_wall_y & (near_gate < cfg.robot_radius + 1e-4)).sum())
        d = np.linalg.norm(ref_pos[0, :, None] - ref_pos[0, None, :], axis=-1)
        np.fill_diagonal(d, 1.0)
        robot_hits += int((d < 2 * cfg.robot_radius + 1e-4).sum() // 2)

    assert wall_hits > 0, "trajectory never touched the arena walls"
    assert gate_hits > 0, "trajectory never touched the gate side walls"
    assert robot_hits > 0, "trajectory never had robot-robot contact"
    # (colour-transition reward parity has its own focused test below —
    # random wheels rarely produce black↔white transitions)
    # the divergence mask must stay a small fraction of all comparisons
    assert masked < 0.1 * STEPS * N, f"excessive divergence masking: {masked}"


def test_reward_transition_parity(ref_env):
    """K⁺/K⁻ colour-transition reward parity with hand-placed crossings.

    Robot 0 is placed in the white gate band heading north (→ black
    corridor: K⁻ = −1); robot 1 in the black corridor heading south
    (→ white gate: K⁺ = +1); robot 2 crosses grey→white (no reward);
    the rest sit still mid-arena.
    """
    import torch

    cfg = DirectionalGateEnvCfg(variant="dandelion", num_envs=1, num_agents=N)
    env = DirectionalGateEnv(cfg)

    ref_env.reset()
    ref_env.pos.zero_()
    ref_env.yaw.zero_()
    gate_mid_y = (cfg.gate_south_y + cfg.corridor_south_y) / 2
    # robot 0: white gate, just south of the corridor boundary, heading
    # north — crosses white→black (K⁻) on step 1
    ref_env.pos[0, 0, :] = torch.tensor([-0.1, cfg.corridor_south_y - 0.005])
    ref_env.yaw[0, 0] = math.pi / 2
    # robot 1: black corridor, heading south — crosses black→white (K⁺)
    # on step 3, a DIFFERENT step so the two rewards don't cancel
    ref_env.pos[0, 1, :] = torch.tensor([0.1, cfg.corridor_south_y + 0.030])
    ref_env.yaw[0, 1] = -math.pi / 2
    # robot 2: grey, just west of the gate band, heading east into white
    ref_env.pos[0, 2, :] = torch.tensor([-cfg.gate_width / 2 - 0.005, gate_mid_y])
    ref_env.yaw[0, 2] = 0.0
    # the rest: parked far from everything
    for i in range(3, N):
        ref_env.pos[0, i, :] = torch.tensor([-0.8 + 0.1 * (i % 8), -0.6 - 0.1 * (i // 8)])
    ref_env.prev_ground_color[0] = ref_env._ground_scalar(ref_env.pos[0])

    state = _our_state(env, ref_env.pos.numpy().copy(), ref_env.yaw.numpy().copy(),
                       ref_env.prev_ground_color.numpy().copy())

    wheels = np.zeros((1, N), dtype=np.float32)
    wheels[0, :3] = cfg.max_wheel_speed  # only the three movers drive
    rewards_ref, rewards_ours = [], []
    for _ in range(4):
        ref_env.step(torch.from_numpy(wheels), torch.from_numpy(wheels))
        state, ts = env.step_jit(
            state, jnp.asarray(np.stack([wheels, wheels], -1) / cfg.max_wheel_speed)
        )
        rewards_ref.append(ref_env.step_reward)
        rewards_ours.append(float(ts.reward[0]))

    assert rewards_ours == rewards_ref
    # both crossings must actually have fired (K⁺ and K⁻ in some step)
    assert any(r != 0 for r in rewards_ref), "no transition fired — bad placement"
    assert sum(rewards_ref) == 0.0  # +1 and −1 in total, grey crossing silent


def test_free_running_trajectory_parity(ref_env):
    """Free-running (no resync) parity until the first west-wall contact.

    Accumulated f32 drift over independent framework stacks stays tiny as
    long as both apply identical op sequences.
    """
    import torch

    cfg = DirectionalGateEnvCfg(variant="dandelion", num_envs=1, num_agents=N)
    env = DirectionalGateEnv(cfg)

    ref_env.reset()
    pos = ref_env.pos.numpy().copy()
    yaw = ref_env.yaw.numpy().copy()
    prev_g = ref_env.prev_ground_color.numpy().copy()
    state = _our_state(env, pos, yaw, prev_g)

    rng = np.random.default_rng(11)
    # constant per-robot curvature, magnitude ≥ 0.15 so robots trace tight
    # arcs near their spawn instead of random-walking into a wall corner
    # (corner contact is where the steppers legitimately diverge)
    mag = rng.uniform(0.15, 0.35, (1, 1, N)).astype(np.float32)
    turn = mag * rng.choice([-1.0, 1.0], (1, 1, N)).astype(np.float32)

    total_ref = total_ours = 0.0
    steps_run = 0
    for t in range(300):
        base = rng.uniform(0.4, 1.0, (1, N)).astype(np.float32)
        left = np.clip(base + turn[0], -1, 1) * cfg.max_wheel_speed
        right = np.clip(base - turn[0], -1, 1) * cfg.max_wheel_speed

        ref_env.step(torch.from_numpy(left), torch.from_numpy(right))
        actions = jnp.asarray(
            np.stack([left, right], axis=-1) / cfg.max_wheel_speed
        )
        diverges = _divergence_mask(state, env, cfg, left, right).any()
        state, ts = env.step_jit(state, actions)

        if diverges:
            break  # semantics legitimately diverge here (module docstring)
        steps_run = t + 1
        total_ref += ref_env.step_reward
        total_ours += float(ts.reward[0])
        np.testing.assert_allclose(
            np.asarray(state.pos), ref_env.pos.numpy(), atol=5e-5,
            err_msg=f"free-running drift at step {t}",
        )

    assert steps_run >= 50, f"west-wall hit too early ({steps_run} steps)"
    assert total_ours == total_ref


def test_observation_parity_full_suite(ref_env):
    """The 24-dim dandelion observation matches the reference sensor stack
    on the same poses (prox incl. robot cones, light, ground, ztilde, RAB)."""
    import torch

    cfg = DirectionalGateEnvCfg(variant="dandelion", num_envs=1, num_agents=N)
    env = DirectionalGateEnv(cfg)

    ref_env.reset()
    # advance a bit so poses are non-trivial (near walls / each other)
    for _ in range(60):
        ref_env.step(
            torch.full((1, N), cfg.max_wheel_speed),
            torch.full((1, N), cfg.max_wheel_speed * 0.9),
        )

    pos_t, yaw_t = ref_env.pos, ref_env.yaw
    prox_vals, _, _ = ref_env.sensors.compute_proximity(
        pos_t, yaw_t, obstacle_segments=ref_env.wall_segments,
        all_agent_pos=pos_t, robot_radius=ref_env.robot_radius,
    )
    light_vals, _, _ = ref_env.sensors.compute_light(
        pos_t, yaw_t, ref_env.light_pos
    )
    ground = ref_env._ground_3ch(pos_t)
    ztilde, rab_proj, _, _ = ref_env.sensors.compute_rab(pos_t, yaw_t)
    ref_obs = ref_env.sensors.collect_obs_dandelion(
        prox_vals, light_vals, ground, ztilde, rab_proj
    ).numpy()

    state = _our_state(
        env, pos_t.numpy(), yaw_t.numpy(), ref_env.prev_ground_color.numpy()
    )
    ours = np.asarray(env._observations(state))
    np.testing.assert_allclose(ours, ref_obs, atol=1e-5)
