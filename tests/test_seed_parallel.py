"""Seed-parallel trainer (agents/seed_parallel.py): the vmapped seed axis
must reproduce serial per-seed training exactly (lane independence), keep
the serial checkpoint contract, and survive a single-lane divergence.

Reference anchor: the 10-seed SLURM array run unit
(/root/reference/scripts/hpc/train_dandelion.slurm:3,
submit_all_dirgate.sh:11-15).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swarmacb_tpu.agents import (
    Checkpointer,
    POCAConfig,
    POCATrainer,
    SeedParallelTrainer,
)
from swarmacb_tpu.env import make_env

SCALAR_KEYS = ("policy_loss", "value_loss", "baseline_loss", "entropy",
               "mean_team_value", "mean_rollout_reward")


def tiny_cfg(**kw):
    base = dict(horizon=8, total_timesteps=10**9, hidden_dim=16, num_layers=1,
                buffer_size_hint=64, mini_batch_size=16, summary_freq=10**9,
                checkpoint_interval=10**9, split_update_groups=0)
    base.update(kw)
    return POCAConfig(**base)


def tiny_env(variant="tulip"):
    return make_env("SwarmACB-DirectionalGate-v0", variant=variant,
                    num_envs=2, use_pallas=False)


def run_serial(env, cfg, seed, iters):
    t = POCATrainer(env, dataclasses.replace(cfg, seed=seed))
    key_reset, t.key = jax.random.split(t.key)
    es, obs = t.env.reset(key_reset)
    carry = t.init_actor_carry() if t.recurrent else ()
    out = []
    for _ in range(iters):
        es, obs, carry, m = t.train_iteration(es, obs, carry)
        out.append(m)
    return out, t


def run_parallel(env, cfg, seeds, iters):
    tr = SeedParallelTrainer(env, cfg, seeds)
    es, obs, carry = tr._reset_all()
    out = []
    for _ in range(iters):
        es, obs, carry, m = tr.train_iteration(es, obs, carry)
        out.append(m)
    return out, tr


class TestLaneParity:
    @pytest.mark.slow
    def test_lanes_match_serial_runs(self):
        """Each vmapped lane reproduces the serial trainer for its seed
        (same init-key threading, same rollout/update RNG streams)."""
        env = tiny_env("tulip")
        cfg = tiny_cfg()
        seeds = [0, 1]
        par, _ = run_parallel(env, cfg, seeds, 2)
        for lane, seed in enumerate(seeds):
            ser, _ = run_serial(env, cfg, seed, 2)
            for it in range(2):
                for k in SCALAR_KEYS:
                    np.testing.assert_allclose(
                        float(par[it][k][lane]), ser[it][k],
                        rtol=2e-3, atol=1e-5,
                        err_msg=f"seed={seed} iter={it} key={k}")

    def test_continuous_variant(self):
        """dandelion: Gaussian actor (per-dim log-probs, log_std param)
        under the seed axis."""
        env = tiny_env("dandelion")
        par, tr = run_parallel(env, tiny_cfg(), [3, 4], 1)
        for k in SCALAR_KEYS:
            assert np.isfinite(par[0][k]).all(), k
        log_std = tr.train_state.params["actor"]["log_std"]
        assert log_std.shape[0] == 2  # per-seed leading axis

    @pytest.mark.slow
    def test_recurrent_variant(self):
        """cyclamen: LSTM actor carry + BPTT window update under vmap."""
        env = tiny_env("cyclamen")
        cfg = tiny_cfg(recurrent=True, sequence_length=4)
        par, _ = run_parallel(env, cfg, [0, 1], 1)
        for k in SCALAR_KEYS:
            assert np.isfinite(par[0][k]).all(), k

    @pytest.mark.slow
    def test_recurrent_lane_matches_serial(self):
        env = tiny_env("cyclamen")
        cfg = tiny_cfg(recurrent=True, sequence_length=4)
        par, _ = run_parallel(env, cfg, [0, 1], 1)
        ser, _ = run_serial(env, cfg, 1, 1)
        for k in SCALAR_KEYS:
            np.testing.assert_allclose(float(par[0][k][1]), ser[0][k],
                                       rtol=2e-3, atol=1e-5, err_msg=k)


class TestCheckpointContract:
    @pytest.mark.slow
    def test_per_seed_save_resume(self, tmp_path):
        """Per-seed checkpoints are serial-compatible; try_resume restores
        every lane at the newest common step."""
        env = tiny_env("tulip")
        cfg = tiny_cfg(
            total_timesteps=2 * 8 * 2 * 20,       # 2 iterations
            checkpoint_interval=8 * 2 * 20,       # save every iteration
        )
        seeds = [0, 1]
        tr = SeedParallelTrainer(env, cfg, seeds)
        cks = [Checkpointer(tmp_path / f"s{s}", keep=3) for s in seeds]
        tr.train(checkpointers=cks, progress=False)
        for ck in cks:
            assert (ck.dir / "poca_final" / "metadata.json").exists()

        # a serial-trainer restore of one seed's checkpoint works (the
        # play.py / eval path contract)
        t = POCATrainer(env, dataclasses.replace(cfg, seed=0))
        cks[0].restore(cks[0].dir / "poca_final", t)
        assert t.global_step == cfg.total_timesteps

        # fresh parallel trainer resumes all lanes at the common step
        tr2 = SeedParallelTrainer(env, cfg, seeds)
        assert tr2.try_resume(cks)
        assert tr2.global_step > 0
        # restored lane params equal the saved ones
        lane0 = jax.tree_util.tree_map(lambda x: x[0],
                                       tr2.train_state.params)
        saved = Checkpointer.restore_params(
            cks[0].dir / f"poca_{tr2.global_step}")
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            lane0, saved)

    def test_resume_fresh_when_no_common_step(self, tmp_path):
        env = tiny_env("tulip")
        cfg = tiny_cfg()
        tr = SeedParallelTrainer(env, cfg, [0, 1])
        cks = [Checkpointer(tmp_path / f"s{s}", keep=3) for s in (0, 1)]
        assert not tr.try_resume(cks)


class TestDivergenceGuard:
    @pytest.mark.slow
    def test_nan_lane_is_quarantined_others_continue(self, tmp_path):
        """A NaN lane is dropped from the alive mask (and quarantined)
        while the remaining lanes finish the run."""
        env = tiny_env("tulip")
        cfg = tiny_cfg(total_timesteps=2 * 8 * 2 * 20,
                       checkpoint_interval=10**9)
        tr = SeedParallelTrainer(env, cfg, [0, 1])
        # poison lane 0's params
        tr.train_state = type(tr.train_state)(
            params=jax.tree_util.tree_map(
                lambda x: x.at[0].set(jnp.nan), tr.train_state.params),
            opt_state=tr.train_state.opt_state,
        )
        cks = [Checkpointer(tmp_path / f"s{s}", keep=3) for s in (0, 1)]
        tr.train(checkpointers=cks, progress=False)
        assert list(tr.alive) == [False, True]
        assert list((cks[0].dir).glob("poca_diverged_*"))
        assert (cks[1].dir / "poca_final" / "metadata.json").exists()
        assert not (cks[0].dir / "poca_final").exists()

    @pytest.mark.slow
    def test_all_dead_raises(self):
        env = tiny_env("tulip")
        cfg = tiny_cfg(total_timesteps=2 * 8 * 2 * 20)
        tr = SeedParallelTrainer(env, cfg, [0, 1])
        tr.train_state = type(tr.train_state)(
            params=jax.tree_util.tree_map(
                lambda x: jnp.full_like(x, jnp.nan), tr.train_state.params),
            opt_state=tr.train_state.opt_state,
        )
        with pytest.raises(FloatingPointError):
            tr.train(checkpointers=None, progress=False)


class TestSeedMesh:
    """Seed axis sharded over a device mesh: collective-free data
    parallelism over lanes — the multi-chip layout of the run unit."""

    @pytest.mark.slow
    def test_sharded_seed_axis_matches_unsharded(self):
        from swarmacb_tpu.parallel import make_mesh

        env = tiny_env("tulip")
        cfg = tiny_cfg()
        seeds = list(range(8))
        mesh = make_mesh(8)

        tr_m = SeedParallelTrainer(env, cfg, seeds, mesh=mesh)
        es, obs, carry = tr_m._reset_all()
        # seed-stacked leaves really are sharded over the mesh
        leaf = jax.tree_util.tree_leaves(tr_m.train_state.params)[0]
        assert len(leaf.sharding.device_set) == 8
        es, obs, carry, m_mesh = tr_m.train_iteration(es, obs, carry)

        tr_s = SeedParallelTrainer(env, cfg, seeds)
        es2, obs2, carry2 = tr_s._reset_all()
        es2, obs2, carry2, m_single = tr_s.train_iteration(es2, obs2, carry2)

        for k in SCALAR_KEYS:
            np.testing.assert_allclose(m_mesh[k], m_single[k],
                                       rtol=2e-3, atol=1e-5, err_msg=k)

    def test_indivisible_seed_count_rejected(self):
        from swarmacb_tpu.parallel import make_mesh

        env = tiny_env("tulip")
        with pytest.raises(ValueError, match="divisible"):
            SeedParallelTrainer(env, tiny_cfg(), [0, 1, 2], mesh=make_mesh(8))


class TestGuards:
    def test_split_update_rejected(self):
        env = tiny_env("tulip")
        cfg = tiny_cfg(split_update_groups=4)  # T·E=16 > 4 → split path
        with pytest.raises(ValueError, match="fused train program"):
            SeedParallelTrainer(env, cfg, [0, 1])

    def test_duplicate_seeds_rejected(self):
        env = tiny_env("tulip")
        with pytest.raises(ValueError, match="duplicate"):
            SeedParallelTrainer(env, tiny_cfg(), [1, 1])
