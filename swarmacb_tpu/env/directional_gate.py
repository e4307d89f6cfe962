"""Directional Gate (DGT) mission — pure-functional batched JAX environment.

The TPU-native replacement for the reference's Isaac-Lab ``DirectMARLEnv``
subclass (directional_gate_env.py). One ``step`` call advances E arenas ×
N robots entirely on device: sensors → behaviour wheels → differential-drive
integration → 3 collision passes → colour-transition team reward →
time-limit done → folded auto-reset → observations. Designed to be called
inside ``jax.lax.scan`` under ``jit``, with the arena batch sharded over a
device mesh.

Step-ordering contract replicated from the reference (SURVEY.md §3.2):
  * discrete variants compute sensors from PRE-integration poses, use them
    for behaviour dispatch, and REUSE them for this step's observations
    (directional_gate_env.py:495-504,657-662) — so discrete observations
    are one integration step staler than dandelion's, and post-reset
    observations keep the stale pre-reset sensor block (only the ground
    channel is fresh, directional_gate_env.py:677).
  * continuous (dandelion) computes observations fresh from post-collision
    (possibly reset) poses.
  * reward counts colour transitions of post-collision positions against
    ``prev_ground`` (directional_gate_env.py:698-738).
  * episodes truncate when the step counter reaches
    ``max_episode_length − 1`` (directional_gate_env.py:744-750, Isaac
    increments the counter before the check).
  * auto-reset (directional_gate_env.py:756-792): uniform-in-disc spawns of
    radius inradius − 2r, uniform yaw in [−π, π), colour tracking re-seeded
    from the new poses, behaviour machines zeroed, and the episode group
    reward snapshotted into ``completed_group_reward`` before zeroing.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config.env_cfg import DirectionalGateEnvCfg
from . import behaviors, geometry, physics, sensors
from .behaviors import BehaviorState
from .state import EnvState, TimeStep


class DirectionalGateEnv:
    """Stateless env object: holds static config + precomputed geometry.

    All methods are pure functions of (state, actions); ``self`` is
    hashable/static so methods can be jitted or closed over directly.
    """

    def __init__(self, cfg: DirectionalGateEnvCfg):
        self.cfg = cfg
        arena = geometry.wall_segments(cfg.arena_circumradius, cfg.arena_num_sides)
        gate = geometry.gate_wall_segments(
            cfg.corridor_width, cfg.gate_south_y, cfg.side_wall_length
        )
        # Combined list for sensor raycasts (directional_gate_env.py:69-77)
        self.wall_segments = np.concatenate([arena, gate], axis=0)
        self.face_normals, self.face_points = geometry.wall_faces(
            cfg.arena_circumradius, cfg.arena_num_sides, fixed=cfg.fixed_wall_faces
        )
        # Arena centre / light direction for the critic state
        # (directional_gate_env.py:98-101)
        self.arena_center = np.zeros(2, dtype=np.float32)
        light = np.asarray(cfg.light_position[:2], dtype=np.float32)
        self.light_pos = light
        lv = light - self.arena_center
        self.light_dir = (lv / (np.linalg.norm(lv) + 1e-8)).astype(np.float32)

    # hash/eq by config so jit caching works across instances
    def __hash__(self):
        return hash(self.cfg)

    def __eq__(self, other):
        return isinstance(other, DirectionalGateEnv) and self.cfg == other.cfg

    # ── properties ────────────────────────────────────────────────
    @property
    def num_envs(self) -> int:
        return self.cfg.num_envs

    @property
    def num_agents(self) -> int:
        return self.cfg.num_agents

    @property
    def obs_dim(self) -> int:
        return self.cfg.obs_dim

    # ── reset ─────────────────────────────────────────────────────
    def _sample_spawn(self, key, shape):
        """Uniform-in-disc positions + uniform yaw.

        Matches directional_gate_env.py:773-783: radius √u · (inradius − 2r),
        angle uniform in [0, 2π), yaw uniform in [−π, π).
        """
        cfg = self.cfg
        safe_r = cfg.inradius - cfg.robot_radius * 2
        k_r, k_t, k_y = jax.random.split(key, 3)
        r = jnp.sqrt(jax.random.uniform(k_r, shape)) * safe_r
        theta = jax.random.uniform(k_t, shape) * 2 * math.pi
        yaw = jax.random.uniform(k_y, shape) * 2 * math.pi - math.pi
        pos = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)
        return pos, yaw

    def reset(self, key) -> tuple[EnvState, jax.Array]:
        """Fresh state for all E arenas. Returns (state, obs)."""
        cfg = self.cfg
        E, N = cfg.num_envs, cfg.num_agents
        key, k_spawn = jax.random.split(key)
        pos, yaw = self._sample_spawn(k_spawn, (E, N))
        state = EnvState(
            pos=pos,
            yaw=yaw,
            prev_ground=sensors.ground_color(pos, cfg),
            step_count=jnp.zeros(E, dtype=jnp.int32),
            episode_reward=jnp.zeros(E, dtype=jnp.float32),
            completed_group_reward=jnp.zeros(E, dtype=jnp.float32),
            behavior=BehaviorState.init(E, N),
            key=key,
        )
        return state, self._observations(state, sensor_cache=None)

    # ── sensors / obs ─────────────────────────────────────────────
    def _compute_sensor_block(self, pos, yaw):
        cfg = self.cfg
        if cfg.use_pallas:
            from ..ops import pairwise_sensors  # lazy: optional TPU path

            # wall raycast fused into the same kernel: positions are read
            # once and prox already carries max(wall, robot) per sensor
            prox_vals, ztilde, rab_proj, rab_x, rab_y = pairwise_sensors(
                pos, yaw, prox_range=cfg.prox_range,
                robot_radius=cfg.robot_radius, rab_range=cfg.rab_range,
                alpha_rab=cfg.alpha_parameter,
                wall_segments=self.wall_segments,
            )
            prox_value, prox_angle = sensors.aggregate_prox(prox_vals)
        else:
            prox_vals, prox_value, prox_angle = sensors.compute_proximity(
                pos, yaw, self.wall_segments, cfg.prox_range, cfg.robot_radius
            )
            ztilde, rab_proj, rab_x, rab_y = sensors.compute_rab(
                pos, yaw, cfg.rab_range, cfg.alpha_parameter
            )
        light_vals, light_value, light_angle = sensors.compute_light(
            pos, yaw, self.light_pos, cfg.light_threshold
        )
        return dict(
            prox_vals=prox_vals, prox_value=prox_value, prox_angle=prox_angle,
            light_vals=light_vals, light_value=light_value, light_angle=light_angle,
            ztilde=ztilde, rab_proj=rab_proj, rab_x=rab_x, rab_y=rab_y,
        )

    def _observations(self, state: EnvState, sensor_cache=None) -> jax.Array:
        """Per-agent observations (E, N, obs_dim).

        Matches directional_gate_env.py:650-692: cached sensors are reused
        when provided (discrete variants); ground is always fresh.
        """
        cfg = self.cfg
        cache = sensor_cache or self._compute_sensor_block(state.pos, state.yaw)
        ground = sensors.ground_obs(state.pos, cfg)
        if cfg.variant in ("dandelion", "daisy"):
            return sensors.collect_obs_dandelion(
                cache["prox_vals"], cache["light_vals"], ground,
                cache["ztilde"], cache["rab_proj"],
            )
        return sensors.collect_obs_lily(ground, cache["ztilde"])

    def critic_state(self, state: EnvState) -> jax.Array:
        """5-D polar critic state (E, N, 5) — directional_gate_env.py:798-809."""
        return sensors.critic_state_5d(
            state.pos, state.yaw, self.arena_center,
            self.cfg.arena_circumradius, self.light_dir,
        )

    # ── step ──────────────────────────────────────────────────────
    def step(
        self,
        state: EnvState,
        actions: jax.Array,
        injected_durations=None,
        injected_spawn=None,
    ) -> tuple[EnvState, TimeStep]:
        """Advance one control tick (10 Hz).

        Args:
            state: current EnvState.
            actions: (E, N, 2) normalized wheel commands for dandelion, or
                (E, N) / (E, N, 1) int module indices for discrete variants.
            injected_durations / injected_spawn: optional overrides of the
                random draws, for cross-framework replay tests.

        Returns (new_state, TimeStep).
        """
        cfg = self.cfg
        key, k_behavior, k_reset = jax.random.split(state.key, 3)
        bstate = state.behavior
        sensor_cache = None

        if cfg.discrete_actions:
            module_ids = actions.reshape(state.yaw.shape).astype(jnp.int32)
            sensor_cache = self._compute_sensor_block(state.pos, state.yaw)
            left, right, bstate = behaviors.dispatch(
                module_ids, bstate,
                sensor_cache["prox_value"], sensor_cache["prox_angle"],
                sensor_cache["light_value"], sensor_cache["light_angle"],
                sensor_cache["rab_x"], sensor_cache["rab_y"],
                k_behavior, cfg.max_wheel_speed, cfg.alpha_parameter,
                cfg.prox_threshold, injected_durations,
            )
        else:
            # Dandelion: clamp [−1,1] then scale (directional_gate_env.py:512-525)
            clamped = jnp.clip(actions, -1.0, 1.0)
            left = clamped[..., 0] * cfg.max_wheel_speed
            right = clamped[..., 1] * cfg.max_wheel_speed

        # Integrate + collisions (directional_gate_env.py:527-545)
        pos, yaw = physics.integrate_and_wrap(
            state.pos, state.yaw, left, right, cfg.wheelbase, cfg.dt
        )
        pos = physics.resolve_wall_collisions(
            pos, self.face_normals, self.face_points, cfg.robot_radius
        )
        pos = physics.resolve_gate_wall_collisions(
            pos, cfg.robot_radius, cfg.corridor_width / 2.0,
            cfg.gate_south_y, cfg.side_wall_length,
        )
        if cfg.use_pallas:
            from ..ops import resolve_robot_collisions as pallas_collisions

            pos = pallas_collisions(pos, cfg.robot_radius)
        else:
            pos = physics.resolve_robot_collisions(pos, cfg.robot_radius)

        # Reward: colour transitions (directional_gate_env.py:698-738)
        curr_color = sensors.ground_color(pos, cfg)
        prev = state.prev_ground
        black_to_white = (prev < 0.25) & (curr_color > 0.75)
        white_to_black = (prev > 0.75) & (curr_color < 0.25)
        k_plus = black_to_white.astype(jnp.float32).sum(1)
        k_minus = white_to_black.astype(jnp.float32).sum(1)
        reward = k_plus - k_minus
        episode_reward = state.episode_reward + reward

        # Done: time limit only (directional_gate_env.py:744-750; Isaac
        # increments episode_length_buf before the check)
        step_count = state.step_count + 1
        done = step_count >= (cfg.max_episode_length - 1)

        # ── folded auto-reset (directional_gate_env.py:756-792) ────
        if injected_spawn is not None:
            spawn_pos, spawn_yaw = injected_spawn
        else:
            spawn_pos, spawn_yaw = self._sample_spawn(
                k_reset, (cfg.num_envs, cfg.num_agents)
            )
        dm = done[:, None]
        new_pos = jnp.where(dm[..., None], spawn_pos, pos)
        new_yaw = jnp.where(dm, spawn_yaw, yaw)
        new_prev_ground = jnp.where(
            dm, sensors.ground_color(new_pos, cfg), curr_color
        )
        completed = jnp.where(done, episode_reward, state.completed_group_reward)
        episode_reward = jnp.where(done, 0.0, episode_reward)
        step_count = jnp.where(done, 0, step_count)
        bstate = bstate.reset_where(done)

        new_state = EnvState(
            pos=new_pos,
            yaw=new_yaw,
            prev_ground=new_prev_ground,
            step_count=step_count,
            episode_reward=episode_reward,
            completed_group_reward=completed,
            behavior=bstate,
            key=key,
        )

        # Observations: discrete variants reuse the pre-step sensor cache
        # (stale across resets, matching the reference); ground is fresh.
        obs = self._observations(new_state, sensor_cache=sensor_cache)
        return new_state, TimeStep(obs=obs, reward=reward, done=done)

    # jitted conveniences ------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def reset_jit(self, key):
        return self.reset(key)

    @partial(jax.jit, static_argnums=0)
    def step_jit(self, state, actions):
        return self.step(state, actions)
