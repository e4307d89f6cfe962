"""Bounded-program training paths: split updates (recurrent), segmented
rollouts, and a large-E smoke (VERDICT r1 next-round #7)."""

import jax
import numpy as np
import pytest

from helpers import assert_params_close as _params_close
from helpers import run_iters as _run_iters
from helpers import tiny_cfg, tiny_env
from swarmacb_tpu.agents import POCATrainer


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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
