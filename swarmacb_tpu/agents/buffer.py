"""Rollout storage + λ-returns / counterfactual advantages — pure pytrees.

The reference preallocates mutable ``(T, E, …)`` torch tensors and fills
them step by step (poca_buffer.py:28-119); on TPU the rollout is produced
in one shot by ``lax.scan`` stacking per-step pytrees, so the "buffer" is
just an immutable dataclass of ``(T, E, …)`` arrays plus pure functions.

λ-return recursion (poca_buffer.py:125-151, = ML-Agents ``lambda_return``):

    ret[T−1] = r[T−1] + γ·m[T−1]·V_boot
    ret[t]   = γλ·m[t]·ret[t+1] + r[t] + (1−λ)·γ·m[t]·V[t+1]

    advantage_i[t] = ret[t] − baseline_i[t]     (poca_buffer.py:152-154)

implemented as a reverse ``lax.scan`` with the T−1 step kept in its exact
reference form.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Rollout:
    """One collected rollout, all arrays (T, E, …)."""

    obs: jax.Array            # (T, E, N, obs_dim)
    critic_states: jax.Array  # (T, E, N, 5)
    actions: jax.Array        # (T, E, N, act_dim) — raw (pre env-preprocess)
    log_probs: jax.Array      # (T, E, N, act_dim) — PER-DIM
    rewards: jax.Array        # (T, E) team reward (strength applied)
    dones: jax.Array          # (T, E) float
    team_values: jax.Array    # (T, E)
    baselines: jax.Array      # (T, E, N)
    memory_h: Optional[jax.Array] = None  # (T, E, N, mem) pre-step LSTM state
    memory_c: Optional[jax.Array] = None


def lambda_returns(rewards, dones, team_values, bootstrap_value, gamma: float, lam: float):
    """λ-returns over (T, E) arrays; reverse scan, reference-exact formulas."""
    T = rewards.shape[0]
    mask = 1.0 - dones

    ret_last = rewards[T - 1] + gamma * mask[T - 1] * bootstrap_value

    def body(carry, xs):
        r_t, m_t, v_next = xs
        ret_t = gamma * lam * m_t * carry + r_t + (1.0 - lam) * gamma * m_t * v_next
        return ret_t, ret_t

    xs = (rewards[: T - 1], mask[: T - 1], team_values[1:])
    # scan from t = T−2 down to 0
    _, rets = jax.lax.scan(body, ret_last, xs, reverse=True)
    return jnp.concatenate([rets, ret_last[None]], axis=0)


def compute_advantages(rollout: Rollout, bootstrap_value, gamma: float, lam: float):
    """Returns (returns (T,E), advantages (T,E,N) = ret − baseline_i)."""
    returns = lambda_returns(
        rollout.rewards, rollout.dones, rollout.team_values, bootstrap_value,
        gamma, lam,
    )
    advantages = returns[..., None] - rollout.baselines
    return returns, advantages


def normalize_advantages(advantages, eps: float = 1e-10):
    """Mean-0 / std-1 over the WHOLE buffer before the epoch loop
    (poca_trainer.py:676-683). torch.std uses Bessel's correction → ddof=1."""
    mean = advantages.mean()
    std = advantages.std(ddof=1)
    return (advantages - mean) / (std + eps)


def flatten_time_env(x):
    """(T, E, …) → (T·E, …)."""
    return x.reshape((-1,) + x.shape[2:])
