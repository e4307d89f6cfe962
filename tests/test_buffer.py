"""λ-return / advantage tests: hand recursion + reference torch parity."""

import importlib.util
import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from swarmacb_tpu.agents import buffer as buf

REF_AGENTS = pathlib.Path(
    "/root/reference/source/SwarmACB_isaac/SwarmACB_isaac/tasks/direct/agents"
)


def _hand_lambda_returns(rewards, dones, values, bootstrap, gamma, lam):
    """Direct transcription of the recursion (poca_buffer.py:125-151)."""
    T = rewards.shape[0]
    ret = np.zeros_like(rewards)
    mask_last = 1.0 - dones[T - 1]
    ret[T - 1] = rewards[T - 1] + gamma * mask_last * bootstrap
    for t in reversed(range(T - 1)):
        m = 1.0 - dones[t]
        ret[t] = gamma * lam * m * ret[t + 1] + rewards[t] + (1 - lam) * gamma * m * values[t + 1]
    return ret


def _rand(T=17, E=3, seed=0):
    rng = np.random.default_rng(seed)
    rewards = rng.normal(size=(T, E)).astype(np.float32)
    dones = (rng.uniform(size=(T, E)) < 0.1).astype(np.float32)
    values = rng.normal(size=(T, E)).astype(np.float32)
    boot = rng.normal(size=(E,)).astype(np.float32)
    return rewards, dones, values, boot


def test_lambda_returns_vs_hand():
    rewards, dones, values, boot = _rand()
    ours = buf.lambda_returns(jnp.asarray(rewards), jnp.asarray(dones),
                              jnp.asarray(values), jnp.asarray(boot), 0.99, 0.95)
    hand = _hand_lambda_returns(rewards, dones, values, boot, 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(ours), hand, atol=1e-5)


def test_lambda_returns_no_dones_equals_gae_identity():
    """With λ=1 and no dones, return = discounted sum of rewards + bootstrap."""
    T, E = 5, 2
    rewards = np.ones((T, E), np.float32)
    dones = np.zeros((T, E), np.float32)
    values = np.zeros((T, E), np.float32)
    boot = np.zeros(E, np.float32)
    ours = np.asarray(buf.lambda_returns(
        jnp.asarray(rewards), jnp.asarray(dones), jnp.asarray(values),
        jnp.asarray(boot), 0.9, 1.0))
    expected0 = sum(0.9**k for k in range(T))
    np.testing.assert_allclose(ours[0], expected0, atol=1e-5)


def test_done_masking_cuts_bootstrap():
    T, E = 3, 1
    rewards = np.zeros((T, E), np.float32)
    rewards[2] = 1.0
    dones = np.zeros((T, E), np.float32)
    dones[2] = 1.0  # terminal at last step → no bootstrap
    values = np.zeros((T, E), np.float32)
    boot = np.full(E, 100.0, np.float32)
    ours = np.asarray(buf.lambda_returns(
        jnp.asarray(rewards), jnp.asarray(dones), jnp.asarray(values),
        jnp.asarray(boot), 0.99, 0.95))
    np.testing.assert_allclose(ours[2], 1.0, atol=1e-6)


def test_parity_vs_reference_buffer():
    if not REF_AGENTS.exists():
        pytest.skip("reference repo not mounted")
    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_poca_buffer", REF_AGENTS / "poca_buffer.py")
    ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mod)

    T, E, N = 13, 4, 5
    rewards, dones, values, boot = _rand(T, E, seed=5)
    baselines = np.random.default_rng(6).normal(size=(T, E, N)).astype(np.float32)

    ref = ref_mod.POCARolloutBuffer(
        horizon=T, num_envs=E, num_agents=N, obs_dim=3, act_dim=2,
        gamma=0.99, lam=0.95, device="cpu",
    )
    ref.rewards = torch.from_numpy(rewards)
    ref.dones = torch.from_numpy(dones)
    ref.team_values = torch.from_numpy(values)
    ref.baselines = torch.from_numpy(baselines)
    ref.compute_returns_and_advantages(torch.from_numpy(boot))

    returns = buf.lambda_returns(jnp.asarray(rewards), jnp.asarray(dones),
                                 jnp.asarray(values), jnp.asarray(boot), 0.99, 0.95)
    advantages = returns[..., None] - jnp.asarray(baselines)
    np.testing.assert_allclose(np.asarray(returns), ref.returns.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(advantages), ref.advantages.numpy(), atol=1e-5)


def test_normalize_advantages_matches_torch_std():
    import torch

    adv = np.random.default_rng(8).normal(size=(7, 3, 4)).astype(np.float32) * 3
    ours = np.asarray(buf.normalize_advantages(jnp.asarray(adv)))
    t = torch.from_numpy(adv)
    ref = ((t - t.mean()) / (t.std() + 1e-10)).numpy()  # Bessel-corrected std
    np.testing.assert_allclose(ours, ref, atol=1e-5)
