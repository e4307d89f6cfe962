"""Seed-parallel POCA training — the reference's SLURM seed array as ONE
vmapped on-chip program.

The reference's run unit is 10 seeds executing *in parallel* on a
cluster (`/root/reference/scripts/hpc/train_dandelion.slurm:3`
``#SBATCH --array=0-9``; ``submit_all_dirgate.sh:11-15`` submits all
five variants at once — up to 50 concurrent 1-GPU jobs). The TPU-native
equivalent is not a job queue but a *seed axis*: at the validated
single-chip operating point (E=16 arenas) one training run uses a
sliver of a chip that demonstrably sustains E=32,768 arenas
(BENCH_NOTES.md), so S independent seeds fit on the same chip as one
program.

Design: per-seed ``(params, opt_state, env_state, obs, actor_carry,
key)`` are stacked on a leading seed axis and the serial trainer's fused
train iteration (``POCATrainer._train_iter_fn`` — rollout ``lax.scan``
+ PPO update in one XLA program) is ``jax.vmap``-ed over them. vmap
guarantees lane independence — no value ever crosses the seed axis —
so each lane computes exactly the serial ML-Agents update for its seed;
the chip just sees S× the batch in every matmul and env kernel.
Schedules (lr/ε/β) depend only on ``global_step``, which advances in
lockstep across seeds, so they are broadcast unbatched.

Everything host-side stays per-seed and serial-compatible: one
TensorBoard run dir per seed (``runs/<run>_seed<s>`` — the exact layout
``scripts/extract_curves.py`` / ``summarize_matrix.py`` consume), one
checkpoint dir per seed (standard ``Checkpointer`` saves, so
``play.py``/``eval_checkpoints.py`` work unchanged), per-seed episode
accounting, and a per-seed divergence guard (a NaN lane is quarantined
and dropped from logging while the other lanes keep training).
"""

from __future__ import annotations

import dataclasses
import time
from types import SimpleNamespace
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config.poca_cfg import POCAConfig
from ..env.directional_gate import DirectionalGateEnv
from .trainer import POCATrainer, TrainState


class SeedParallelTrainer:
    """Train ``len(seeds)`` independent POCA seeds concurrently on one
    device by vmapping the fused train iteration over a seed axis."""

    def __init__(self, env: DirectionalGateEnv, cfg: Optional[POCAConfig],
                 seeds: Sequence[int], writers: Optional[Sequence] = None,
                 mesh=None):
        """``mesh``: optional 1-D device mesh — shards the SEED axis over
        devices (seeds/device = S / mesh size). Seed lanes are fully
        independent, so this is collective-free data parallelism: unlike
        the single-chip case (where the bandwidth-bound update makes
        aggregate throughput flat in S, BENCH_NOTES round-5), sharded
        seeds scale aggregate matrix throughput linearly with chips —
        the natural multi-chip layout for the run unit. Single-process
        multi-device for now (episode accounting reads full stats
        host-side)."""
        cfg = cfg or POCAConfig()
        self.seeds = [int(s) for s in seeds]
        if len(set(self.seeds)) != len(self.seeds):
            raise ValueError(f"duplicate seeds: {self.seeds}")
        self.S = len(self.seeds)
        self.mesh = mesh
        if mesh is not None:
            if jax.process_count() > 1:
                raise ValueError("seed-parallel mesh is single-process "
                                 "multi-device for now")
            if self.S % mesh.devices.size:
                raise ValueError(
                    f"{self.S} seeds not divisible over "
                    f"{mesh.devices.size} devices")
        # the base trainer supplies networks, schedules, minibatch
        # derivation and the fused iteration function; its own
        # train_state is unused (per-seed states live on self).
        # accum_chunk_groups is an ACTIVATION-memory cap per gradient
        # pass (poca_cfg.py) — under vmap every lane on a device
        # materializes its own chunk activations simultaneously, so the
        # per-lane cap must shrink by lanes-per-DEVICE to keep the same
        # per-chip HBM footprint (S=8 unsharded at the default 1024 OOMs
        # a 16 GB v5e chip; lanes×(cap/lanes) chunks are the same total
        # matmul rows per pass, so throughput is unchanged)
        lanes_per_dev = self.S // (mesh.devices.size if mesh is not None
                                   else 1)
        chunk = cfg.accum_chunk_groups
        if chunk > 0:
            chunk = max(1, chunk // max(1, lanes_per_dev))
        self.base = POCATrainer(
            env, dataclasses.replace(cfg, seed=self.seeds[0],
                                     accum_chunk_groups=chunk),
            writer=None, mesh=None)
        b = self.base
        if b._use_split_update:
            raise ValueError(
                "seed-parallel training requires the fused train program "
                f"(T·E = {cfg.horizon * env.num_envs} exceeds "
                f"split_update_groups={cfg.split_update_groups}); lower "
                "--num_envs (the validated operating point is E=16) or "
                "raise split_update_groups")
        self.cfg = b.cfg
        self.num_envs = b.num_envs
        self.num_agents = b.num_agents
        self.recurrent = b.recurrent
        self.discrete = b.discrete

        # per-seed init with the serial trainer's exact key threading
        inits = [b.init_params_for_seed(s) for s in self.seeds]
        params = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[p for p, _ in inits])
        opt_state = jax.vmap(b.tx.init)(params)
        self.train_state = TrainState(params=params, opt_state=opt_state)
        self.keys = jnp.stack([k for _, k in inits])
        if mesh is not None:
            # shard every seed-stacked leaf on its leading S axis; XLA's
            # SPMD partitioner then runs each device's seed lanes locally
            # with zero collectives (nothing crosses the seed axis)
            from ..parallel import mesh as meshlib

            self.train_state = meshlib.shard_batch_pytree(self.train_state,
                                                          mesh)
            self.keys = jax.device_put(self.keys,
                                       meshlib.batch_sharding(mesh))

        # one program: vmap the fused rollout+update over the seed axis.
        # lr/eps/beta are unbatched (identical across lockstep seeds).
        self._iter_jit = jax.jit(
            jax.vmap(b._train_iter_fn,
                     in_axes=(0, 0, 0, 0, 0, None, None, None)),
            donate_argnums=(1,))

        # one program for a lane slice (checkpoint snapshots): a plain
        # tree_map of x[i] would dispatch one eager gather PER LEAF —
        # hundreds of ~28 ms round trips on a tunnelled runtime, paid
        # once per seed per checkpoint interval
        self._slice_jit = jax.jit(
            lambda ts, i: jax.tree_util.tree_map(lambda x: x[i], ts))

        self.global_step = 0          # per-seed decisions, as in a serial run
        self.update_count = 0
        self.writers = list(writers) if writers is not None else None
        if self.writers is not None and len(self.writers) != self.S:
            raise ValueError("need one writer per seed (or None)")

        # per-seed host episode accounting (trainer.py counterpart)
        E = self.num_envs
        self._ep_acc = np.zeros((self.S, E))
        self._ep_len = np.zeros((self.S, E))
        self.completed_episode_returns = [[] for _ in range(self.S)]
        self.completed_episode_lengths = [[] for _ in range(self.S)]
        self.completed_group_rewards = [[] for _ in range(self.S)]
        self._rollout_reward_history = [[] for _ in range(self.S)]
        self._max_history = 100
        self.alive = np.ones(self.S, dtype=bool)

    # ── per-seed views (checkpoint contract) ───────────────────────

    def _seed_view(self, i: int) -> SimpleNamespace:
        """Duck-typed trainer view of lane ``i`` for the Checkpointer:
        the sliced train_state plus the serial metadata contract, so
        per-seed checkpoints are byte-compatible with serial runs (and
        restorable by play.py / eval_checkpoints.py)."""
        ts = self._slice_jit(self.train_state, i)
        return SimpleNamespace(
            train_state=ts,
            global_step=self.global_step,
            update_count=self.update_count,
            checkpoint_metadata=self.base.checkpoint_metadata,
        )

    def try_resume(self, checkpointers) -> bool:
        """Resume every lane from the newest checkpoint step that ALL
        seed dirs share (lanes advance in lockstep, so after any clean
        interruption that common step exists). Returns False (start
        fresh) when there is no common step."""
        step_sets = []
        for ck in checkpointers:
            steps = set()
            for p in ck.dir.glob("poca_*"):
                tail = p.name.removeprefix("poca_")
                if tail.isdigit() and (p / "metadata.json").exists():
                    steps.add(int(tail))
            step_sets.append(steps)
        common = set.intersection(*step_sets) if step_sets else set()
        if not common:
            return False
        step = max(common)
        for i, ck in enumerate(checkpointers):
            view = self._seed_view(i)
            ck.restore(ck.dir / f"poca_{step}", view)
            self.train_state = jax.tree_util.tree_map(
                lambda full, r: full.at[i].set(jnp.asarray(r, full.dtype)),
                self.train_state, view.train_state)
            self.global_step = view.global_step
            self.update_count = view.update_count
        print(f"[POCA] seed-parallel resume: {self.S} lanes at step "
              f"{self.global_step:,}")
        return True

    # ── setup ──────────────────────────────────────────────────────

    def _reset_all(self):
        """Per-seed env reset with the serial key threading
        (key_reset, key = split(key) — trainer.py train())."""
        b = self.base
        pairs = jax.vmap(jax.random.split)(self.keys)      # (S, 2)
        k_reset, self.keys = pairs[:, 0], pairs[:, 1]
        env_state, obs = jax.vmap(b.env.reset)(k_reset)
        if self.recurrent:
            B = self.num_envs * self.num_agents
            m = self.cfg.memory_size
            carry = (jnp.zeros((self.S, B, m)), jnp.zeros((self.S, B, m)))
        else:
            carry = ()
        if self.mesh is not None:
            from ..parallel import mesh as meshlib

            env_state = meshlib.shard_batch_pytree(env_state, self.mesh)
            obs = jax.device_put(obs, meshlib.batch_sharding(self.mesh))
            carry = meshlib.shard_batch_pytree(carry, self.mesh)
        return env_state, obs, carry

    def _schedules(self):
        b = self.base
        s = self.global_step + (self.cfg.horizon * self.num_envs
                                * self.num_agents)
        return (jnp.float32(b.lr_schedule(s)),
                jnp.float32(b.eps_schedule(s)),
                jnp.float32(b.beta_schedule(s)))

    # ── iteration ──────────────────────────────────────────────────

    def train_iteration(self, env_state, obs, actor_carry):
        """One vmapped rollout+update for all S lanes. Returns
        (env_state, obs, carry, host_metrics) — metric values are
        (S,) numpy arrays plus scalar lr/eps/beta."""
        lr, eps, beta = self._schedules()
        (self.train_state, env_state, obs, actor_carry, self.keys,
         metrics, stats) = self._iter_jit(
            self.train_state, env_state, obs, actor_carry, self.keys,
            lr, eps, beta)
        self.update_count += 1
        self.global_step += self.cfg.horizon * self.num_envs * self.num_agents

        # batch the device→host fetches (tunnel round-trip overlap —
        # trainer.py train_iteration note)
        for leaf in (*metrics.values(), lr, eps, beta,
                     *jax.tree_util.tree_leaves(stats)):
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()

        host = {k: np.asarray(v) for k, v in metrics.items()}   # (S,)
        host["lr"], host["eps"], host["beta"] = float(lr), float(eps), float(beta)
        self._accumulate_episode_stats(stats)
        rewards = np.asarray(stats["rewards"])                  # (S, T, E)
        host["mean_rollout_reward"] = rewards.sum(1).mean(-1)   # (S,)
        host["mean_step_reward"] = rewards.mean((1, 2))
        host["mean_team_value"] = np.asarray(stats["mean_team_value"])
        for i in range(self.S):
            hist = self._rollout_reward_history[i]
            hist.append(float(host["mean_rollout_reward"][i]))
            if len(hist) > self._max_history:
                hist.pop(0)
        return env_state, obs, actor_carry, host

    def _accumulate_episode_stats(self, stats):
        """Per-seed episode returns/lengths across auto-resets
        (trainer.py _accumulate_episode_stats, with a leading S axis)."""
        rewards = np.asarray(stats["rewards"])      # (S, T, E)
        dones = np.asarray(stats["dones"])
        completed = np.asarray(stats["completed_group"])
        dp = self.cfg.decision_period
        for t in range(rewards.shape[1]):
            self._ep_acc += rewards[:, t]
            self._ep_len += dp
            done_mask = dones[:, t] > 0.5           # (S, E)
            if done_mask.any():
                for i in np.nonzero(done_mask.any(axis=1))[0]:
                    m = done_mask[i]
                    self.completed_episode_returns[i].extend(
                        self._ep_acc[i][m].tolist())
                    self.completed_episode_lengths[i].extend(
                        self._ep_len[i][m].tolist())
                    self.completed_group_rewards[i].extend(
                        completed[i, t][m].tolist())
                    self._ep_acc[i][m] = 0.0
                    self._ep_len[i][m] = 0.0

    # ── outer loop ─────────────────────────────────────────────────

    def train(self, checkpointers: Optional[Sequence] = None, progress=True):
        """Full lockstep training loop: logging, checkpointing and the
        per-seed divergence guard (trainer.py train())."""
        c = self.cfg
        env_state, obs, actor_carry = self._reset_all()

        next_summary = c.summary_freq
        next_checkpoint = c.checkpoint_interval
        start = time.time()
        if checkpointers is not None and len(checkpointers) != self.S:
            raise ValueError("need one checkpointer per seed (or None)")

        while self.global_step < c.total_timesteps:
            t_iter = time.time()
            env_state, obs, actor_carry, m = self.train_iteration(
                env_state, obs, actor_carry)
            iter_dt = time.time() - t_iter
            elapsed = time.time() - start
            sps = self.global_step / elapsed if elapsed > 0 else 0.0
            decisions = c.horizon * self.num_envs * self.num_agents
            sps_inst = decisions / iter_dt if iter_dt > 0 else 0.0

            if progress:
                live = self.alive
                mean = {k: float(np.mean(m[k][live])) for k in
                        ("policy_loss", "value_loss", "baseline_loss",
                         "entropy")}
                print(f"[POCA] step={self.global_step:,} upd={self.update_count} "
                      f"S={int(live.sum())}/{self.S} "
                      f"pg={mean['policy_loss']:.3f} vf={mean['value_loss']:.3f} "
                      f"bl={mean['baseline_loss']:.3f} ent={mean['entropy']:.3f} "
                      f"per-seed SPS={sps:,.0f} (inst {sps_inst:,.0f}, "
                      f"aggregate {sps_inst * int(live.sum()):,.0f})",
                      flush=True)

            # per-seed divergence guard: quarantine a NaN lane and keep
            # the rest training; abort only when every lane is dead
            finite = np.ones(self.S, dtype=bool)
            for k in ("policy_loss", "value_loss", "baseline_loss"):
                finite &= np.isfinite(m[k])
            newly_dead = self.alive & ~finite
            for i in np.nonzero(newly_dead)[0]:
                self.alive[i] = False
                msg = (f"[POCA] seed {self.seeds[i]}: non-finite loss at "
                       f"step {self.global_step:,} — lane diverged")
                if checkpointers is not None:
                    path = checkpointers[i].save(self._seed_view(i),
                                                 quarantine=True)
                    msg += f"; params quarantined at {path}"
                print(msg, flush=True)
            if not self.alive.any():
                raise FloatingPointError(
                    "all seed lanes diverged (non-finite losses)")

            if self.writers is not None and self.global_step >= next_summary:
                next_summary += c.summary_freq
                self._write_summaries(m, sps)

            if checkpointers is not None and self.global_step >= next_checkpoint:
                next_checkpoint += c.checkpoint_interval
                for i in np.nonzero(self.alive)[0]:
                    checkpointers[i].save(self._seed_view(i))

        if checkpointers is not None:
            for i in np.nonzero(self.alive)[0]:
                checkpointers[i].save(self._seed_view(i), final=True)
        if self.writers is not None:
            for w in self.writers:
                if w is not None:
                    w.flush()
        return env_state, obs

    def _write_summaries(self, m, sps):
        """Per-seed ML-Agents-exact TensorBoard tags — one writer per
        seed, identical tag set to the serial trainer so curve tooling
        is seed-layout-agnostic."""
        s = self.global_step
        log_std = None
        if not self.discrete:
            log_std = np.asarray(self.train_state.params["actor"]["log_std"])
        for i in np.nonzero(self.alive)[0]:
            w = self.writers[i]
            if w is None:
                continue
            w.add_scalar("Losses/Policy Loss", float(m["policy_loss"][i]), s)
            w.add_scalar("Losses/Value Loss", float(m["value_loss"][i]), s)
            w.add_scalar("Losses/POCA/Baseline Loss",
                         float(m["baseline_loss"][i]), s)
            w.add_scalar("Policy/Entropy", float(m["entropy"][i]), s)
            w.add_scalar("Policy/Learning Rate", m["lr"], s)
            w.add_scalar("Policy/Epsilon", m["eps"], s)
            w.add_scalar("Policy/Beta", m["beta"], s)
            w.add_scalar("Policy/Extrinsic Reward",
                         float(m["mean_step_reward"][i]), s)
            w.add_scalar("Policy/Extrinsic Value Estimate",
                         float(m["mean_team_value"][i]), s)
            if log_std is not None:
                for d in range(log_std.shape[-1]):
                    w.add_scalar(f"Policy/Std dim{d}",
                                 float(np.exp(log_std[i, 0, d])), s)
                w.add_scalar("Policy/Log Std Mean", float(log_std[i].mean()), s)
            if self.completed_episode_returns[i]:
                ep = self.completed_episode_returns[i]
                w.add_scalar("Environment/Cumulative Reward",
                             sum(ep) / len(ep), s)
                ep.clear()
            if self.completed_episode_lengths[i]:
                el = self.completed_episode_lengths[i]
                w.add_scalar("Environment/Episode Length", sum(el) / len(el), s)
                el.clear()
            w.add_scalar("Extra/SPS", sps, s)
            w.add_scalar("Extra/Mean Rollout Reward",
                         float(m["mean_rollout_reward"][i]), s)
            hist = self._rollout_reward_history[i]
            w.add_scalar("Extra/Rolling Avg Rollout Reward",
                         sum(hist) / len(hist), s)
            w.add_scalar("Extra/Mean Abs Advantage",
                         float(m["mean_abs_advantage"][i]), s)
            if self.completed_group_rewards[i]:
                gr = self.completed_group_rewards[i]
                w.add_scalar("Extra/Group Reward Mean", sum(gr) / len(gr), s)
                gr.clear()
