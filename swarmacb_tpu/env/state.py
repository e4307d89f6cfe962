"""Environment state pytree for the Directional Gate mission."""

from __future__ import annotations

import jax
from flax import struct

from .behaviors import BehaviorState


@struct.dataclass
class EnvState:
    """Full per-arena-batch simulation state (all arrays lead with E).

    Mirrors the reference env's mutable members (directional_gate_env.py:53-66
    plus Isaac's ``episode_length_buf``) as one immutable pytree so the step
    function is pure and scannable.
    """

    pos: jax.Array                   # (E, N, 2) world XY
    yaw: jax.Array                   # (E, N) heading, rad
    prev_ground: jax.Array           # (E, N) previous ground colour scalar
    step_count: jax.Array            # (E,) int32 — Isaac episode_length_buf
    episode_reward: jax.Array        # (E,) running group reward this episode
    completed_group_reward: jax.Array  # (E,) snapshot at last episode end
    behavior: BehaviorState          # avoidance state machines
    key: jax.Array                   # PRNG key threaded through steps


@struct.dataclass
class TimeStep:
    """One transition's outputs."""

    obs: jax.Array        # (E, N, obs_dim)
    reward: jax.Array     # (E,) shared team reward
    done: jax.Array       # (E,) bool — truncation (time limit only)
