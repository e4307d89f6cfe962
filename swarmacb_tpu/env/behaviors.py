"""The 6 ACB behaviour modules as branchless batched jnp — TPU friendly.

Module IDs (behavior_modules.py:36-43):
  0 Exploration, 1 Stop, 2 Phototaxis, 3 Anti-phototaxis, 4 Attraction,
  5 Repulsion.

The reference keeps three per-robot obstacle-avoidance state machines in
mutable torch tensors and dispatches modules through a masked Python loop
with data-dependent early-outs (behavior_modules.py:177-233,288-312). Here
the state machines are explicit arrays in a ``BehaviorState`` pytree and
every module's wheels are computed densely, then selected with masks — no
data-dependent control flow, so the whole dispatch lives inside the jitted
env step.

RNG: the reference draws ``torch.randint(1, 5)`` turn durations from the
global torch stream only on steps where *some* robot triggers
(behavior_modules.py:291-297,369-377). We draw a (E, N) batch from an
explicit JAX key every step and latch only where triggered — identical
per-robot distribution, deterministic given the key. For cross-framework
replay, ``dispatch`` accepts injected duration arrays.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

EXPLORATION, STOP, PHOTOTAXIS, ANTI_PHOTOTAXIS, ATTRACTION, REPULSION = range(6)

_TURN_LO, _TURN_HI = 1, 5  # Unity Random.Range(1, 5) → {1,2,3,4}


@struct.dataclass
class BehaviorState:
    """Per-robot avoidance state machines (behavior_modules.py:132-155)."""

    explore_state: jax.Array    # (E, N) int32: 0=walk, 1=avoid
    explore_steps: jax.Array    # (E, N) int32
    explore_dir: jax.Array      # (E, N) f32: +1 right / −1 left
    photo_avoiding: jax.Array   # (E, N) bool
    photo_steps: jax.Array      # (E, N) int32
    photo_dir: jax.Array        # (E, N) f32
    antiphoto_avoiding: jax.Array
    antiphoto_steps: jax.Array
    antiphoto_dir: jax.Array

    @classmethod
    def init(cls, E: int, N: int) -> "BehaviorState":
        # distinct arrays per field — shared buffers break jit donation
        zi = lambda: jnp.zeros((E, N), dtype=jnp.int32)
        zf = lambda: jnp.zeros((E, N), dtype=jnp.float32)
        zb = lambda: jnp.zeros((E, N), dtype=bool)
        return cls(zi(), zi(), zf(), zb(), zi(), zf(), zb(), zi(), zf())

    def reset_where(self, env_mask: jax.Array) -> "BehaviorState":
        """Zero all machines for envs where ``env_mask`` (E,) is True.

        Matches behavior_modules.py:161-173.
        """
        m = env_mask[:, None]
        z = BehaviorState.init(*self.explore_state.shape)
        return jax.tree_util.tree_map(
            lambda new, old: jnp.where(
                m if old.ndim == 2 else m[..., None], new, old
            ),
            z,
            self,
        )


def compute_wheels_from_vector(dx, dy, max_speed: float):
    """Body-frame direction → (left, right) wheel velocities.

    Exact replication of Unity ``ComputeWheelsVelocityFromVector``
    (behavior_modules.py:50-90): angle forced into [0, 2π); front hemisphere
    → (L=cosθ, R=1), back → (L=1, R=cosθ); rescaled so max(|L|,|R|) =
    max_speed; near-zero input → (0, 0).
    """
    near_zero = (jnp.abs(dx) < 1e-5) & (jnp.abs(dy) < 1e-5)
    angle = jnp.arctan2(dy, dx)
    angle = jnp.where(angle < 0, angle + 2.0 * math.pi, angle)
    cos_a = jnp.cos(angle)
    front = angle < math.pi
    left = jnp.where(front, cos_a, jnp.ones_like(cos_a))
    right = jnp.where(front, jnp.ones_like(cos_a), cos_a)
    max_val = jnp.clip(jnp.maximum(jnp.abs(left), jnp.abs(right)), min=1e-5)
    scale = max_speed / max_val
    left = left * scale
    right = right * scale
    left = jnp.where(near_zero, jnp.zeros_like(left), left)
    right = jnp.where(near_zero, jnp.zeros_like(right), right)
    return left, right


def _is_obstacle_in_front(prox_value, prox_angle, prox_threshold: float):
    """Unity IsObstacleInFront (behavior_modules.py:237-243)."""
    return (prox_value >= prox_threshold) & (jnp.abs(prox_angle) <= math.pi * 0.5)


def _turn_direction(prox_angle):
    """Latch turn dir: angle<0 → LEFT(−1) else RIGHT(+1) (behavior_modules.py:245-256)."""
    return jnp.where(prox_angle < 0, -jnp.ones_like(prox_angle), jnp.ones_like(prox_angle))


def _steer_from_vector(rx, ry, max_speed: float):
    """Forward fallback (|v|<0.1 → (1,0)) then wheel conversion
    (behavior_modules.py:423-429 et al.)."""
    mag = jnp.sqrt(rx * rx + ry * ry)
    small = mag < 0.1
    rx = jnp.where(small, jnp.ones_like(rx), rx)
    ry = jnp.where(small, jnp.zeros_like(ry), ry)
    return compute_wheels_from_vector(rx, ry, max_speed)


def _exploration(state: BehaviorState, prox_value, prox_angle, active, durations,
                 prox_threshold: float, max_speed: float):
    """Exploration state machine (behavior_modules.py:258-334).

    Order matters (and differs from the photo/antiphoto machine): trigger
    check first, then the decrement — so a newly triggered robot burns one
    step immediately and turns for (duration − 1) steps.
    """
    st, steps, adir = state.explore_state, state.explore_steps, state.explore_dir

    walking = (st == 0) & active
    trigger = walking & _is_obstacle_in_front(prox_value, prox_angle, prox_threshold)
    adir = jnp.where(trigger, _turn_direction(prox_angle), adir)
    steps = jnp.where(trigger, durations, steps)
    st = jnp.where(trigger, jnp.ones_like(st), st)

    avoiding = (st == 1) & active
    steps = jnp.where(avoiding, steps - 1, steps)
    done = avoiding & (steps <= 0)
    st = jnp.where(done, jnp.zeros_like(st), st)

    ms = max_speed
    lv_walk = jnp.full_like(prox_value, ms)
    rv_walk = jnp.full_like(prox_value, ms)
    lv_avoid = adir * ms
    rv_avoid = -adir * ms
    is_avoiding = (st == 1) & active
    lv = jnp.where(is_avoiding, lv_avoid, lv_walk)
    rv = jnp.where(is_avoiding, rv_avoid, rv_walk)

    new_state = state.replace(explore_state=st, explore_steps=steps, explore_dir=adir)
    return lv, rv, new_state


def _avoidance_machine(avoiding, steps, adir, prox_value, prox_angle, active,
                       durations, prox_threshold: float):
    """Shared photo/antiphoto machine (behavior_modules.py:336-380).

    Order: decrement currently-avoiding robots first, THEN trigger new
    avoidance — a newly triggered robot turns for the full duration.
    """
    currently = avoiding & active
    steps = jnp.where(currently, steps - 1, steps)
    done = currently & (steps <= 0)
    avoiding = jnp.where(done, jnp.zeros_like(avoiding), avoiding)

    not_avoiding = ~avoiding & active
    trigger = not_avoiding & _is_obstacle_in_front(prox_value, prox_angle, prox_threshold)
    adir = jnp.where(trigger, _turn_direction(prox_angle), adir)
    steps = jnp.where(trigger, durations, steps)
    avoiding = jnp.where(trigger, jnp.ones_like(avoiding), avoiding)

    is_turning = avoiding & active
    return avoiding, steps, adir, is_turning


def _taxis(light_value, light_angle, prox_value, prox_angle, turn_dir, is_turning,
           sign: float, max_speed: float):
    """Shared phototaxis (+1) / anti-phototaxis (−1) steering
    (behavior_modules.py:382-483): vec = sign·light − 0.5·prox."""
    lx = light_value * jnp.cos(light_angle)
    ly = light_value * jnp.sin(light_angle)
    px = prox_value * jnp.cos(prox_angle)
    py = prox_value * jnp.sin(prox_angle)
    rx = sign * lx - 0.5 * px
    ry = sign * ly - 0.5 * py
    lv_steer, rv_steer = _steer_from_vector(rx, ry, max_speed)
    lv = jnp.where(is_turning, turn_dir * max_speed, lv_steer)
    rv = jnp.where(is_turning, -turn_dir * max_speed, rv_steer)
    return lv, rv


def _attraction(rab_x, rab_y, prox_value, prox_angle, max_speed: float):
    """vec = rab − 0.6·prox (behavior_modules.py:485-512)."""
    px = prox_value * jnp.cos(prox_angle)
    py = prox_value * jnp.sin(prox_angle)
    return _steer_from_vector(rab_x - 0.6 * px, rab_y - 0.6 * py, max_speed)


def _repulsion(rab_x, rab_y, prox_value, prox_angle, alpha: float, max_speed: float):
    """vec = −α·rab − 0.5·prox (behavior_modules.py:514-541).

    Note: rab already carries α/(1+d) weighting from the RAB sensor, so
    repulsion is effectively α²-weighted — replicated as-is.
    """
    px = prox_value * jnp.cos(prox_angle)
    py = prox_value * jnp.sin(prox_angle)
    return _steer_from_vector(-alpha * rab_x - 0.5 * px, -alpha * rab_y - 0.5 * py, max_speed)


def dispatch(
    module_ids,          # (E, N) int in {0..5}
    state: BehaviorState,
    prox_value, prox_angle,
    light_value, light_angle,
    rab_vec_x, rab_vec_y,
    key,                 # PRNG key for turn durations (or None with injected)
    max_speed: float,
    alpha_parameter: float,
    prox_threshold: float = 0.1,
    injected_durations=None,  # optional dict {explore, photo, antiphoto}: (E,N) int32
):
    """Run all 6 behaviour modules densely and select per-robot wheels.

    Replaces the reference's masked Python dispatch loop
    (behavior_modules.py:177-233). Returns (left, right, new_state).
    """
    E, N = module_ids.shape
    if injected_durations is None:
        k1, k2, k3 = jax.random.split(key, 3)
        dur_e = jax.random.randint(k1, (E, N), _TURN_LO, _TURN_HI, dtype=jnp.int32)
        dur_p = jax.random.randint(k2, (E, N), _TURN_LO, _TURN_HI, dtype=jnp.int32)
        dur_a = jax.random.randint(k3, (E, N), _TURN_LO, _TURN_HI, dtype=jnp.int32)
    else:
        dur_e = injected_durations["explore"]
        dur_p = injected_durations["photo"]
        dur_a = injected_durations["antiphoto"]

    active0 = module_ids == EXPLORATION
    active2 = module_ids == PHOTOTAXIS
    active3 = module_ids == ANTI_PHOTOTAXIS

    lv0, rv0, state = _exploration(
        state, prox_value, prox_angle, active0, dur_e, prox_threshold, max_speed
    )

    pav, pst, pdir, p_turn = _avoidance_machine(
        state.photo_avoiding, state.photo_steps, state.photo_dir,
        prox_value, prox_angle, active2, dur_p, prox_threshold,
    )
    lv2, rv2 = _taxis(light_value, light_angle, prox_value, prox_angle,
                      pdir, p_turn, +1.0, max_speed)

    aav, ast, adir, a_turn = _avoidance_machine(
        state.antiphoto_avoiding, state.antiphoto_steps, state.antiphoto_dir,
        prox_value, prox_angle, active3, dur_a, prox_threshold,
    )
    lv3, rv3 = _taxis(light_value, light_angle, prox_value, prox_angle,
                      adir, a_turn, -1.0, max_speed)

    state = state.replace(
        photo_avoiding=pav, photo_steps=pst, photo_dir=pdir,
        antiphoto_avoiding=aav, antiphoto_steps=ast, antiphoto_dir=adir,
    )

    lv4, rv4 = _attraction(rab_vec_x, rab_vec_y, prox_value, prox_angle, max_speed)
    lv5, rv5 = _repulsion(rab_vec_x, rab_vec_y, prox_value, prox_angle,
                          alpha_parameter, max_speed)

    zeros = jnp.zeros_like(prox_value)
    left = jnp.select(
        [module_ids == m for m in range(6)],
        [lv0, zeros, lv2, lv3, lv4, lv5],
        zeros,
    )
    right = jnp.select(
        [module_ids == m for m in range(6)],
        [rv0, zeros, rv2, rv3, rv4, rv5],
        zeros,
    )
    return left, right, state
