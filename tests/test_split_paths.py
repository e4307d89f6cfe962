"""Bounded-program training paths: split updates (recurrent), segmented
rollouts, and a large-E smoke (VERDICT r1 next-round #7)."""

import jax
import jax.numpy as jnp
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


def _run_iters(trainer, n=2):
    key = jax.random.PRNGKey(42)
    env_state, obs = trainer.env.reset(key)
    carry = trainer.init_actor_carry() if trainer.recurrent else ()
    metrics = None
    for _ in range(n):
        env_state, obs, carry, metrics = trainer.train_iteration(
            env_state, obs, carry)
    return metrics


def _params_close(t_a, t_b, rtol=1e-5, atol=1e-7):
    for a, b in zip(jax.tree_util.tree_leaves(t_a.train_state.params),
                    jax.tree_util.tree_leaves(t_b.train_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=rtol, atol=atol)


def test_split_update_recurrent_matches_fused():
    """The split path now covers the recurrent (BPTT window) update —
    same window groups, same RNG/permutation streams as the fused
    program, so params must match. horizon=10 with L=4 also exercises
    the uneven tail window group (10 = 4+4+2)."""
    kw = dict(recurrent=True, memory_size=8, sequence_length=4, horizon=10)
    t_fused = POCATrainer(tiny_env("cyclamen"),
                          tiny_cfg(split_update_groups=0, **kw))
    t_split = POCATrainer(tiny_env("cyclamen"),
                          tiny_cfg(split_update_groups=1, **kw))
    assert not t_fused._use_split_update and t_split._use_split_update

    m1 = _run_iters(t_fused, n=2)
    m2 = _run_iters(t_split, n=2)
    _params_close(t_fused, t_split)
    for k in ("policy_loss", "value_loss", "baseline_loss", "entropy"):
        np.testing.assert_allclose(m1[k], m2[k], rtol=1e-4, atol=1e-6)


def test_segmented_rollout_matches_unsegmented():
    """rollout_segments splits the horizon scan into sequential device
    programs with the PRNG key carried across — trajectories, and hence
    the whole training step, must be bit-compatible."""
    t_one = POCATrainer(tiny_env(), tiny_cfg(split_update_groups=1,
                                             rollout_segments=1))
    t_seg = POCATrainer(tiny_env(), tiny_cfg(split_update_groups=1,
                                             rollout_segments=4))
    m1 = _run_iters(t_one, n=2)
    m2 = _run_iters(t_seg, n=2)
    _params_close(t_one, t_seg)
    for k in ("policy_loss", "value_loss", "baseline_loss", "entropy"):
        np.testing.assert_allclose(m1[k], m2[k], rtol=1e-4, atol=1e-6)


def test_rollout_segments_must_divide_horizon():
    import pytest

    with pytest.raises(ValueError):
        POCATrainer(tiny_env(), tiny_cfg(horizon=10, rollout_segments=3))


def test_mixed_precision_trainer_close_to_f32():
    """mixed_precision keeps the critic's counterfactual tiles in bf16 —
    same param tree, finite losses, and per-iteration metrics close to
    the f32 path (bf16 tiles perturb baselines at ~1e-3 relative)."""
    t32 = POCATrainer(tiny_env(), tiny_cfg())
    tbf = POCATrainer(tiny_env(), tiny_cfg(mixed_precision=True))
    assert jax.tree_util.tree_structure(t32.train_state.params) == \
        jax.tree_util.tree_structure(tbf.train_state.params)
    m32 = _run_iters(t32, n=2)
    mbf = _run_iters(tbf, n=2)
    for k in ("policy_loss", "value_loss", "baseline_loss", "entropy"):
        assert np.isfinite(mbf[k])
        np.testing.assert_allclose(mbf[k], m32[k], rtol=0.05, atol=5e-3)


def test_large_e_training_smoke():
    """E=512 trains through the bounded-program path (split update +
    segmented rollout) — the large-E shape round 1 couldn't run."""
    trainer = POCATrainer(
        tiny_env(num_envs=512, num_agents=2),
        tiny_cfg(horizon=4, num_epochs=1, mini_batch_size=256,
                 split_update_groups=256, rollout_segments=2,
                 accum_chunk_groups=128),
    )
    assert trainer._use_split_update
    m = _run_iters(trainer, n=1)
    for k in ("policy_loss", "value_loss", "baseline_loss", "entropy"):
        assert np.isfinite(m[k]), (k, m[k])
