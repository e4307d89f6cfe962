"""Trainer integration tests on tiny configs (CPU)."""

import jax
import numpy as np
import pytest

from helpers import run_iters as _run_iters
from helpers import tiny_cfg, tiny_env
from swarmacb_tpu.agents import Checkpointer, POCATrainer


def test_discrete_trainer_runs():
    trainer = POCATrainer(tiny_env("tulip"), tiny_cfg())
    m = _run_iters(trainer)
    for k in ("policy_loss", "value_loss", "baseline_loss", "entropy"):
        assert np.isfinite(m[k]), (k, m[k])
    assert trainer.global_step == 2 * 8 * 2 * 4
    assert trainer.update_count == 2


def test_continuous_trainer_runs():
    trainer = POCATrainer(tiny_env("dandelion"), tiny_cfg())
    m = _run_iters(trainer)
    assert np.isfinite(m["policy_loss"])
    # gaussian entropy of unit std ≈ 1.419 per dim × 2 dims
    assert abs(m["entropy"] - 2 * 1.4189) < 0.3


def test_recurrent_trainer_runs():
    trainer = POCATrainer(tiny_env("cyclamen"),
                          tiny_cfg(recurrent=True, memory_size=8,
                                   sequence_length=4, hidden_dim=8))
    m = _run_iters(trainer)
    assert np.isfinite(m["policy_loss"])
    assert np.isfinite(m["entropy"])


@pytest.mark.slow
def test_recurrent_uneven_windows():
    """horizon=10, seq_len=4 → window groups {4: [0,4], 2: [8]}."""
    trainer = POCATrainer(tiny_env("cyclamen"),
                          tiny_cfg(horizon=10, recurrent=True, memory_size=8,
                                   sequence_length=4, hidden_dim=8))
    groups = trainer._window_groups()
    assert groups == {4: [0, 4], 2: [8]}
    m = _run_iters(trainer, n=1)
    assert np.isfinite(m["policy_loss"])


@pytest.mark.slow
def test_params_change_and_deterministic():
    t1 = POCATrainer(tiny_env("tulip"), tiny_cfg())
    p0 = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(),
                                t1.train_state.params)
    _run_iters(t1, n=1)
    p1 = t1.train_state.params
    changed = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(a, np.asarray(b)), p0, p1)
    assert any(jax.tree_util.tree_leaves(changed))

    # same seeds → identical params
    t2 = POCATrainer(tiny_env("tulip"), tiny_cfg())
    _run_iters(t2, n=1)
    for a, b in zip(jax.tree_util.tree_leaves(t1.train_state.params),
                    jax.tree_util.tree_leaves(t2.train_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_group_minibatch_derivation():
    """ML-Agents derivation (poca_trainer.py:663-674): buffer 20480 /
    batch 2048 → 10 batches/epoch → group_mb = T·E/10."""
    env = tiny_env("tulip", num_envs=5)
    cfg = tiny_cfg(horizon=1000, mini_batch_size=2048, buffer_size_hint=20480)
    trainer = POCATrainer(env, cfg)
    assert trainer.group_mb == (1000 * 5) // 10


def test_reward_strength_applied():
    env = tiny_env("tulip")
    trainer = POCATrainer(env, tiny_cfg(reward_strength=2.0))
    key = jax.random.PRNGKey(0)
    env_state, obs = env.reset(key)
    out = trainer._rollout_jit(trainer.train_state.params, env_state, obs, (),
                               jax.random.PRNGKey(1))
    rollout = out[4]
    # rewards are integers (K+−K−) × strength → all even or zero
    r = np.asarray(rollout.rewards)
    np.testing.assert_allclose(r % 2.0, 0.0, atol=1e-6)


def test_rollout_stores_prestep_obs():
    """The buffer's obs at t must be the obs the action was sampled FROM
    (poca_trainer.py:407-415)."""
    env = tiny_env("tulip")
    trainer = POCATrainer(env, tiny_cfg())
    key = jax.random.PRNGKey(3)
    env_state, obs0 = env.reset(key)
    out = trainer._rollout_jit(trainer.train_state.params, env_state, obs0, (),
                               jax.random.PRNGKey(4))
    rollout = out[4]
    np.testing.assert_allclose(np.asarray(rollout.obs[0]), np.asarray(obs0),
                               atol=1e-7)


def test_checkpoint_roundtrip(tmp_path):
    trainer = POCATrainer(tiny_env("tulip"), tiny_cfg())
    _run_iters(trainer, n=1)
    ck = Checkpointer(tmp_path, keep=2)
    path = ck.save(trainer)

    trainer2 = POCATrainer(tiny_env("tulip"), tiny_cfg(seed=99))
    meta = ck.restore(path, trainer2)
    assert meta["variant"] == "tulip"
    assert trainer2.global_step == trainer.global_step
    for a, b in zip(jax.tree_util.tree_leaves(trainer.train_state.params),
                    jax.tree_util.tree_leaves(trainer2.train_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_params_metadata_target(tmp_path):
    """restore_params builds its target from checkpoint metadata pinned to a
    local device (so TPU-saved checkpoints restore on CPU-only hosts); the
    restored params tree must match the saved one exactly."""
    trainer = POCATrainer(tiny_env("tulip"), tiny_cfg())
    ck = Checkpointer(tmp_path, keep=2)
    path = ck.save(trainer, final=True)

    params = Checkpointer.restore_params(path)
    saved = jax.tree_util.tree_leaves_with_path(trainer.train_state.params)
    restored = jax.tree_util.tree_leaves_with_path(params)
    assert len(saved) == len(restored) and len(saved) > 0
    for (pa, a), (pb, b) in zip(saved, restored):
        assert pa == pb
        assert b.sharding.device_set <= set(jax.local_devices())
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_rotation(tmp_path):
    trainer = POCATrainer(tiny_env("tulip"), tiny_cfg())
    ck = Checkpointer(tmp_path, keep=2)
    for i in range(4):
        trainer.global_step = (i + 1) * 100
        ck.save(trainer)
    ck.flush()  # saves are async; finalize before asserting disk state
    kept = sorted(p.name for p in tmp_path.glob("poca_*"))
    assert len(kept) == 2
    assert "poca_400" in kept


def test_quarantined_checkpoint_never_resumes(tmp_path):
    """A divergence save is kept for post-mortem under poca_diverged_<step>
    but excluded from latest() and from rotation (ADVICE r1: the old
    behaviour made --checkpoint latest restore the diverged params)."""
    trainer = POCATrainer(tiny_env("tulip"), tiny_cfg())
    ck = Checkpointer(tmp_path, keep=2)
    trainer.global_step = 100
    good = ck.save(trainer)
    trainer.global_step = 200
    bad = ck.save(trainer, quarantine=True)
    assert bad.name == "poca_diverged_200" and bad.exists()
    assert ck.latest() == good
    # rotation ignores the quarantined dir and never evicts it
    for step in (300, 400, 500):
        trainer.global_step = step
        ck.save(trainer)
    # periodic saves are async (metadata/rotation deferred to the next
    # save) — flush before asserting on-disk state
    ck.flush()
    names = {p.name for p in tmp_path.glob("poca_*")}
    assert "poca_diverged_200" in names
    assert names - {"poca_diverged_200"} == {"poca_400", "poca_500"}
    assert ck.latest().name == "poca_500"


def test_stale_async_failure_never_aborts_final_or_quarantine(tmp_path):
    """A failed earlier PERIODIC save must not abort a final/quarantine
    save (ADVICE r3): the final/quarantine checkpoint is written FIRST,
    then the stale worker error is re-raised (final) or logged
    (quarantine — so it cannot mask the trainer's FloatingPointError)."""
    import threading

    import pytest

    trainer = POCATrainer(tiny_env("tulip"), tiny_cfg())
    ck = Checkpointer(tmp_path, keep=2)
    orig = ck._finalize_item

    def flaky(path, meta, packed, rotate=True):
        if threading.current_thread().name == "checkpoint-writer":
            raise OSError("disk full")
        return orig(path, meta, packed, rotate=rotate)

    ck._finalize_item = flaky
    trainer.global_step = 100
    ck.save(trainer)  # periodic → fails on the worker thread
    if ck._work is not None:
        ck._work.join()  # ensure the failure has landed
    # quarantine save still lands, stale error only logged (consumed)
    trainer.global_step = 200
    bad = ck.save(trainer, quarantine=True)
    assert (bad / "metadata.json").exists()
    assert ck._worker_error is None

    # final save: written first, THEN the stale error re-raised
    trainer.global_step = 300
    ck.save(trainer)  # periodic → fails again
    if ck._work is not None:
        ck._work.join()
    trainer.global_step = 400
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        ck.save(trainer, final=True)
    assert (tmp_path / "poca_final" / "metadata.json").exists()


@pytest.mark.slow
def test_chunked_accumulation_non_divisible():
    """A minibatch size with no divisor under the cap (prime) is handled by
    a weighted tail chunk — exact math, no silent full-batch fallback
    (ADVICE r1)."""
    # T_E = horizon·E = 7·1 = 7 groups (prime); cap 2 → chunks of 2,2,2,1
    t_full = POCATrainer(tiny_env("tulip", num_envs=1),
                         tiny_cfg(horizon=7, mini_batch_size=7,
                                  accum_chunk_groups=0))
    t_chunk = POCATrainer(tiny_env("tulip", num_envs=1),
                          tiny_cfg(horizon=7, mini_batch_size=7,
                                   accum_chunk_groups=2))
    assert t_chunk._grad_chunks(7) == 4
    _run_iters(t_full, n=2)
    _run_iters(t_chunk, n=2)
    for a, b in zip(jax.tree_util.tree_leaves(t_full.train_state.params),
                    jax.tree_util.tree_leaves(t_chunk.train_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_decision_period_substeps():
    env = tiny_env("tulip")
    trainer = POCATrainer(env, tiny_cfg(decision_period=3, horizon=4))
    key = jax.random.PRNGKey(5)
    env_state, obs = env.reset(key)
    out = trainer._rollout_jit(trainer.train_state.params, env_state, obs, (),
                               jax.random.PRNGKey(6))
    new_env_state = out[0]
    # 4 decisions × 3 sub-steps = 12 env steps
    assert int(new_env_state.step_count[0]) == 12


def test_linear_schedules_decay():
    cfg = tiny_cfg(lr_schedule="linear", eps_schedule="linear",
                   beta_schedule="linear", total_timesteps=1000)
    trainer = POCATrainer(tiny_env("tulip"), cfg)
    trainer.global_step = 0
    lr0, eps0, beta0 = trainer._schedules()
    trainer.global_step = 900
    lr1, eps1, beta1 = trainer._schedules()
    assert float(lr1) < float(lr0)
    assert float(eps1) < float(eps0) and float(eps1) >= 0.1
    assert float(beta1) < float(beta0)


@pytest.mark.slow
def test_chunked_grad_accumulation_matches_full_batch():
    """accum_chunk_groups splits oversize minibatches into equal chunks with
    averaged gradients — must reproduce the full-batch update (identical
    math, fp reduction order aside)."""
    # group_mb = min(mini_batch_size=8, T_E=16) = 8; cap=2 → 4 chunks
    t_full = POCATrainer(tiny_env("tulip"), tiny_cfg(accum_chunk_groups=0))
    t_chunk = POCATrainer(tiny_env("tulip"), tiny_cfg(accum_chunk_groups=2))
    assert t_chunk._grad_chunks(t_chunk.group_mb) > 1

    _run_iters(t_full, n=2)
    _run_iters(t_chunk, n=2)
    for a, b in zip(jax.tree_util.tree_leaves(t_full.train_state.params),
                    jax.tree_util.tree_leaves(t_chunk.train_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


@pytest.mark.slow
def test_chunked_grad_accumulation_recurrent():
    """The chunking path also covers the BPTT sequence batches."""
    cfg = tiny_cfg(recurrent=True, memory_size=8, sequence_length=4,
                   accum_chunk_groups=2)
    trainer = POCATrainer(tiny_env("cyclamen"), cfg)
    m = _run_iters(trainer, n=1)
    for k in ("policy_loss", "value_loss", "baseline_loss", "entropy"):
        assert np.isfinite(m[k])


@pytest.mark.slow
def test_split_update_matches_fused():
    """split_update_groups runs one device program per minibatch with the
    same RNG streams / permutations / update order as the fused program —
    resulting params must match."""
    t_fused = POCATrainer(tiny_env("tulip"), tiny_cfg(split_update_groups=0))
    t_split = POCATrainer(tiny_env("tulip"), tiny_cfg(split_update_groups=1))
    assert not t_fused._use_split_update
    assert t_split._use_split_update

    m1 = _run_iters(t_fused, n=2)
    m2 = _run_iters(t_split, n=2)
    for a, b in zip(jax.tree_util.tree_leaves(t_fused.train_state.params),
                    jax.tree_util.tree_leaves(t_split.train_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    for k in ("policy_loss", "value_loss", "baseline_loss", "entropy"):
        np.testing.assert_allclose(m1[k], m2[k], rtol=1e-4, atol=1e-6)


def test_checkpoint_packed_transit_roundtrip(tmp_path):
    """The transit packing (one flat device array per dtype, see
    Checkpointer._pack) must be lossless for adversarial snapshot trees:
    mixed dtypes (f32/bf16/i32), 0-d scalars (Adam's count), single-leaf
    groups, and nested structure. The on-disk payload must equal the
    plain per-leaf path bit-for-bit."""
    import jax.numpy as jnp

    from swarmacb_tpu.agents.checkpoint import Checkpointer

    tree = {
        "params": {
            "w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
            "b": jnp.full((4,), -1.5, dtype=jnp.float32),
            "h": jnp.ones((2, 2), dtype=jnp.bfloat16) * 0.25,
        },
        "opt_state": (
            jnp.array(7, dtype=jnp.int32),          # 0-d count
            {"mu": jnp.linspace(0, 1, 5, dtype=jnp.float32)},
        ),
    }
    ck = Checkpointer(tmp_path, keep=2)
    kind, transit, spec = ck._pack(tree)
    assert kind == "packed"
    # one flat per dtype, not per leaf
    assert len(transit) == 3
    rebuilt = Checkpointer._unpack(kind, transit, spec)
    ref = jax.tree_util.tree_map(np.asarray, tree)
    assert (jax.tree_util.tree_structure(rebuilt)
            == jax.tree_util.tree_structure(ref))
    for a, b in zip(jax.tree_util.tree_leaves(rebuilt),
                    jax.tree_util.tree_leaves(ref)):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(a, b)
