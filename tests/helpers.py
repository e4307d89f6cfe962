"""Shared test helpers: tiny env/config builders and trainer-run utilities.

One copy, imported by the trainer/distributed/split-path test modules, so
tolerance or carry-handling fixes apply everywhere at once.
"""

import jax
import numpy as np

from swarmacb_tpu.agents import POCAConfig, POCATrainer
from swarmacb_tpu.config.env_cfg import DirectionalGateEnvCfg
from swarmacb_tpu.env.directional_gate import DirectionalGateEnv


def tiny_cfg(**kw):
    base = dict(
        horizon=8, num_epochs=2, mini_batch_size=8, hidden_dim=16,
        num_layers=1, total_timesteps=10_000, buffer_size_hint=0,
        summary_freq=10**9, checkpoint_interval=10**9, seed=0,
    )
    base.update(kw)
    return POCAConfig(**base)


def tiny_env(variant="tulip", num_envs=2, num_agents=4):
    return DirectionalGateEnv(DirectionalGateEnvCfg(
        variant=variant, num_envs=num_envs, num_agents=num_agents))


def run_iters(trainer, n=2, key_seed=42):
    """Reset the env, run ``n`` training iterations, return final metrics.

    Handles recurrent actor carries and mesh placement, so the same
    helper drives single-device, recurrent, and sharded trainers.
    """
    key = jax.random.PRNGKey(key_seed)
    env_state, obs = trainer.env.reset(key)
    carry = trainer.init_actor_carry() if trainer.recurrent else ()
    if trainer.mesh is not None:
        env_state, obs, carry = trainer.place_on_mesh(env_state, obs, carry)
    metrics = None
    for _ in range(n):
        env_state, obs, carry, metrics = trainer.train_iteration(
            env_state, obs, carry)
    return metrics


def assert_params_close(t_a, t_b, rtol=1e-5, atol=1e-7):
    """Assert two trainers' full param trees match leaf-by-leaf."""
    for a, b in zip(jax.tree_util.tree_leaves(t_a.train_state.params),
                    jax.tree_util.tree_leaves(t_b.train_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=rtol, atol=atol)
