"""Arena-on-lanes env state + fully-fused step driver.

Companion to ops/fused_step.py: keeps the ENTIRE env state in the
kernel's (R, 128) arena-on-lanes layout across a ``lax.scan``, so the
per-step program is one Pallas call plus the jax.random draws — no
(E, N) ↔ (N, E) transposes and no small XLA fusions inside the scan.
Layout conversion happens exactly twice (scan entry / exit).

Usage (the bench's inner loop):

    lanes = state_to_lanes(env, state)
    mod_lanes = to_lanes(module_ids, num_envs=E)          # once
    def body(lanes, _):
        lanes, reward, done, _ = step_lanes(env, lanes, mod_lanes,
                                            want_obs=False)
        return lanes, reward
    lanes, rewards = jax.lax.scan(body, lanes, None, length=T)
    state = lanes_to_state(env, lanes)

RNG: the key-split structure per step is identical to
``DirectionalGateEnv.step`` (key → behaviour/reset, behaviour → 3
duration draws, reset → r/θ/yaw spawn draws); only the draw SHAPE is
(N, Ep) lanes instead of (E, N), so live trajectories are a different —
distributionally identical — sample of the same process (the Pallas
numerics mode already makes trajectories diverge chaotically from the
jnp path regardless). Replay tests inject draws in (E, N) layout.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.fused_step import LANES, fused_env_step
from .state import EnvState
from .behaviors import BehaviorState, _TURN_HI, _TURN_LO


def _padded(E: int) -> int:
    return ((E + LANES - 1) // LANES) * LANES


def to_lanes(x, num_envs: int):
    """(E, ...) leading-env array → lanes tile.

    (E,) → (1, Ep); (E, N) → (N, Ep). Pad lanes are zero-filled and
    carried along; they never affect real lanes (all kernel math is
    lane-local) and are dropped by ``from_lanes``.
    """
    Ep = _padded(num_envs)
    pad = Ep - num_envs
    if x.ndim == 1:
        x = x[None, :]
    else:
        x = jnp.transpose(x)
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x


def from_lanes(x, num_envs: int, squeeze: bool = False):
    """Inverse of ``to_lanes``: (R, Ep) → (E, R) or (E,) when R == 1."""
    x = jnp.transpose(x[:, :num_envs])
    return x[:, 0] if squeeze else x


def state_to_lanes(env, state: EnvState) -> dict:
    """EnvState → lanes dict (bools become int32 tiles)."""
    E = env.num_envs
    t = lambda v: to_lanes(v, E)
    b = state.behavior
    lanes = dict(
        px=t(state.pos[..., 0]), py=t(state.pos[..., 1]),
        yaw=t(state.yaw), prev=t(state.prev_ground),
        sc=t(state.step_count), er=t(state.episode_reward),
        cg=t(state.completed_group_reward), key=state.key,
    )
    if env.cfg.discrete_actions:
        lanes.update(
            es=t(b.explore_state), ek=t(b.explore_steps), ed=t(b.explore_dir),
            pa=t(b.photo_avoiding.astype(jnp.int32)), pk=t(b.photo_steps),
            pd=t(b.photo_dir),
            aa=t(b.antiphoto_avoiding.astype(jnp.int32)),
            ak=t(b.antiphoto_steps), ad=t(b.antiphoto_dir),
        )
    return lanes


def lanes_to_state(env, lanes: dict) -> EnvState:
    """Lanes dict → EnvState (the exact inverse of ``state_to_lanes``)."""
    E, N = env.num_envs, env.num_agents
    f = lambda v: from_lanes(v, E)
    s = lambda v: from_lanes(v, E, squeeze=True)
    if env.cfg.discrete_actions:
        behavior = BehaviorState(
            explore_state=f(lanes["es"]), explore_steps=f(lanes["ek"]),
            explore_dir=f(lanes["ed"]),
            photo_avoiding=f(lanes["pa"]).astype(bool),
            photo_steps=f(lanes["pk"]), photo_dir=f(lanes["pd"]),
            antiphoto_avoiding=f(lanes["aa"]).astype(bool),
            antiphoto_steps=f(lanes["ak"]), antiphoto_dir=f(lanes["ad"]),
        )
    else:
        behavior = BehaviorState.init(E, N)
    return EnvState(
        pos=jnp.stack([f(lanes["px"]), f(lanes["py"])], axis=-1),
        yaw=f(lanes["yaw"]), prev_ground=f(lanes["prev"]),
        step_count=s(lanes["sc"]), episode_reward=s(lanes["er"]),
        completed_group_reward=s(lanes["cg"]),
        behavior=behavior, key=lanes["key"],
    )


def critic_state_from_lanes(env, lanes: dict):
    """5-D polar critic state (E, N, 5) straight from a lanes state —
    what the trainer's per-step critic consumers need
    (sensors.critic_state_5d; directional_gate_env.py:798-809)."""
    from . import sensors

    E = env.num_envs
    pos = jnp.stack([from_lanes(lanes["px"], E), from_lanes(lanes["py"], E)],
                    axis=-1)
    return sensors.critic_state_5d(
        pos, from_lanes(lanes["yaw"], E), env.arena_center,
        env.cfg.arena_circumradius, env.light_dir)


def obs_from_tiles(env, obs_tiles, prev_tile):
    """Assemble (E, N, obs_dim) observations from the kernel's obs tiles
    (ground channel = the post-reset ``prev`` tile, which equals
    ground_color(new_pos) elementwise — see ops/fused_step.py)."""
    E = env.num_envs
    ground = from_lanes(prev_tile, E)[..., None]          # (E, N, 1)
    ground3 = jnp.broadcast_to(ground, ground.shape[:2] + (3,))
    if env.cfg.variant in ("dandelion", "daisy"):
        pv, lv, zt, rp = obs_tiles
        N = env.num_agents

        def multi(x, lead):                                # (lead·N, Ep)
            x = from_lanes(x, E)                           # (E, lead·N)
            return jnp.transpose(x.reshape(E, lead, N), (0, 2, 1))

        return jnp.concatenate(
            [multi(pv, 8), multi(lv, 8), ground3,
             from_lanes(zt, E)[..., None], multi(rp, 4)], axis=-1)
    (zt,) = obs_tiles
    return jnp.concatenate([ground3, from_lanes(zt, E)[..., None]], axis=-1)


def step_lanes(env, lanes: dict, actions, *, want_obs: bool = True,
               injected_durations=None, injected_spawn=None):
    """Fused-kernel equivalent of ``DirectionalGateEnv.step`` on a lanes
    state. ``actions``: (N, Ep) int32 module ids for discrete variants,
    (E, N, 2)-style normalized wheels ALREADY converted to a
    ((N, Ep), (N, Ep)) tuple — use ``to_lanes`` — for dandelion (this
    function applies the reference's clamp·max_speed preprocessing,
    directional_gate_env.py:512-525). Returns
    (new_lanes, reward (E,), done (E,) bool, obs_tiles)."""
    cfg = env.cfg
    E, N = cfg.num_envs, cfg.num_agents
    Ep = _padded(E)
    key, k_behavior, k_reset = jax.random.split(lanes["key"], 3)

    if cfg.discrete_actions:
        if injected_durations is None:
            k1, k2, k3 = jax.random.split(k_behavior, 3)
            draw = lambda k: jax.random.randint(
                k, (N, Ep), _TURN_LO, _TURN_HI, dtype=jnp.int32)
            draws = (draw(k1), draw(k2), draw(k3))
        else:
            draws = tuple(to_lanes(injected_durations[n], E)
                          for n in ("explore", "photo", "antiphoto"))
        acts = actions
    else:
        draws = ()
        left, right = actions
        acts = (jnp.clip(left, -1.0, 1.0) * cfg.max_wheel_speed,
                jnp.clip(right, -1.0, 1.0) * cfg.max_wheel_speed)

    if injected_spawn is None:
        safe_r = cfg.inradius - cfg.robot_radius * 2
        k_r, k_t, k_y = jax.random.split(k_reset, 3)
        r = jnp.sqrt(jax.random.uniform(k_r, (N, Ep))) * safe_r
        theta = jax.random.uniform(k_t, (N, Ep)) * 2 * math.pi
        syaw = jax.random.uniform(k_y, (N, Ep)) * 2 * math.pi - math.pi
        spawn = (r * jnp.cos(theta), r * jnp.sin(theta), syaw)
    else:
        spos, syaw = injected_spawn
        spawn = (to_lanes(spos[..., 0], E), to_lanes(spos[..., 1], E),
                 to_lanes(syaw, E))

    new_lanes, reward, done, obs_tiles = fused_env_step(
        lanes, acts, draws, spawn, cfg, env.wall_segments,
        env.face_normals, env.face_points, want_obs=want_obs)
    new_lanes["key"] = key
    return (new_lanes, from_lanes(reward, E, squeeze=True),
            from_lanes(done, E, squeeze=True).astype(bool), obs_tiles)
