"""POCA trainer — fully on-device rollout + update, one jitted program.

The TPU-native redesign of the reference trainer (poca_trainer.py): where
the reference runs a 1000-iteration Python loop dispatching one CUDA op at
a time (SURVEY.md §3.1 "hot loops"), here the whole rollout is a
``lax.scan`` over the horizon fused with the policy/critic forwards, and
the PPO update is a scan over epochs × minibatches — a single XLA program
per outer iteration, with donated buffers. The outer Python loop only does
logging, checkpointing and schedule evaluation.

Algorithm parity with ML-Agents POCA (all reference-cited):
  - counterfactual baselines from the critic every step (poca_trainer.py:449-455)
  - continuous env-action preprocessing clamp(−3,3)/3, raw actions stored
    (poca_trainer.py:457-467)
  - decision_period sub-stepping with reward accumulation (poca_trainer.py:469-482)
  - λ-return advantage = return − baseline (poca_buffer.py:125-154)
  - advantage normalization before epochs (poca_trainer.py:676-683)
  - per-dim ratio PPO clip + trust-region value/baseline losses
    (poca_trainer.py:139-173)
  - loss = policy + 0.5·(value + 0.5·baseline) − β·entropy, single Adam over
    actor+critic, eps 1e-8, NO grad clipping (poca_trainer.py:271-274,703-712)
  - group-minibatch derivation from buffer_size_hint (poca_trainer.py:663-674)
  - linear schedules with ML-Agents floors (poca_trainer.py:281-287)
  - recurrent (cyclamen) BPTT over fixed windows with done-masked carry
    (poca_trainer.py:577-642, poca_buffer.py:190-246)
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from jax.sharding import PartitionSpec as P

from ..config.poca_cfg import POCAConfig
from ..env.directional_gate import DirectionalGateEnv
from ..models import Actor, DiscreteActor, POCACritic, RecurrentDiscreteActor
from ..parallel import mesh as meshlib
from . import buffer as buf
from . import losses
from .buffer import Rollout


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any


class POCATrainer:
    """End-to-end POCA training on a batched JAX env."""

    STATE_DIM = 5  # critic consumes the 5-D polar state (poca_trainer.py:224-227)

    def __init__(self, env: DirectionalGateEnv, cfg: Optional[POCAConfig] = None,
                 writer=None, mesh=None):
        """``mesh``: optional jax.sharding.Mesh with a 'data' axis — shards
        the env batch over devices (params replicated, grads all-reduced;
        see swarmacb_tpu.parallel.mesh). Requires num_envs % mesh size == 0."""
        self.env = env
        self.cfg = cfg or POCAConfig()
        c = self.cfg
        self.mesh = mesh
        self.n_shards = 1 if mesh is None else mesh.devices.size
        if env.num_envs % self.n_shards != 0:
            raise ValueError(
                f"num_envs={env.num_envs} must divide over {self.n_shards} devices")

        self.num_envs = env.num_envs
        self.num_agents = env.num_agents
        self.obs_dim = env.obs_dim
        self.discrete = env.cfg.discrete_actions
        self.num_actions = env.cfg.num_actions
        self.recurrent = bool(c.recurrent)
        if self.recurrent and not self.discrete:
            raise ValueError("Recurrent POCA actor is only implemented for discrete actions")

        if self.discrete:
            self.act_dim = 1                      # storage dim
            self.act_dim_critic = self.num_actions
        else:
            self.act_dim = env.cfg.act_dim
            self.act_dim_critic = self.act_dim

        # ── networks ───────────────────────────────────────────────
        if self.discrete:
            if self.recurrent:
                self.actor = RecurrentDiscreteActor(
                    num_actions=self.num_actions, hidden=c.hidden_dim,
                    num_layers=c.num_layers, memory=c.memory_size,
                )
            else:
                self.actor = DiscreteActor(
                    num_actions=self.num_actions, hidden=c.hidden_dim,
                    num_layers=c.num_layers,
                )
        else:
            self.actor = Actor(act_dim=self.act_dim, hidden=c.hidden_dim,
                               num_layers=c.num_layers)
        # auto kernel selection keys off the devices this trainer actually
        # runs on (the mesh's, if given), not the process default backend:
        # a CPU mesh in a TPU-backend process must not select Mosaic
        # kernels.
        run_devices = (mesh.devices.ravel().tolist()
                       if mesh is not None else [jax.devices()[0]])
        run_is_tpu = all(dev.platform == "tpu" for dev in run_devices)
        # auto-on only where the kernel's backward block fits scoped VMEM
        # (ops/baseline_tail.py:_pick_G — a G=1 backward group holds
        # ~2·N²·h·9 f32 values of live state; past h=1024 at N=20 that
        # exceeds the 16M scope and Mosaic refuses to compile). Forcing
        # fused_tail=True still wins, e.g. for small-N large-h configs.
        tail_fits = c.hidden_dim * self.num_agents ** 2 <= 1024 * 20 ** 2
        fused_tail = (c.fused_tail if c.fused_tail is not None
                      else run_is_tpu and tail_fits)
        # fused_attention auto stays off: hardware-validated but measured
        # slower fwd+bwd than the fused-tail path (poca_cfg.py); forcing
        # True/False always wins
        fused_attention = bool(c.fused_attention)
        # fused env step in the rollout scan: auto OFF (poca_cfg.py
        # rationale); forcing True/False always wins
        self._use_lanes = bool(c.fused_env_step)
        self.critic = POCACritic(
            state_dim=self.STATE_DIM, act_dim=self.act_dim_critic,
            num_agents=self.num_agents, hidden=c.hidden_dim,
            num_heads=c.critic_num_heads, num_layers=c.num_layers,
            compute_dtype=jnp.bfloat16 if c.mixed_precision else None,
            mp_stages=c.mp_stages,
            fused_tail=fused_tail,
            fused_attention=fused_attention,
        )

        params, key = self.init_params_for_seed(c.seed)

        # single Adam over actor+critic (poca_trainer.py:271-274)
        self.tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=c.lr, eps=c.adam_eps,
        )
        self.train_state = TrainState(params=params, opt_state=self.tx.init(params))

        # schedules (poca_trainer.py:281-291)
        self.lr_schedule = losses.make_schedule(c.lr_schedule, c.lr,
                                                losses.LR_MIN, c.total_timesteps)
        self.eps_schedule = losses.make_schedule(c.eps_schedule, c.clip_eps,
                                                 losses.EPS_MIN, c.total_timesteps)
        self.beta_schedule = losses.make_schedule(c.beta_schedule, c.beta,
                                                  losses.BETA_MIN, c.total_timesteps)

        # minibatch derivation (poca_trainer.py:663-674)
        T_E = c.horizon * self.num_envs
        if c.buffer_size_hint > 0 and c.mini_batch_size > 0:
            bpe = max(1, c.buffer_size_hint // c.mini_batch_size)
            self.group_mb = max(1, T_E // bpe)
        else:
            self.group_mb = min(c.mini_batch_size, T_E)

        self.global_step = 0
        self.update_count = 0
        self.key = key
        self.writer = writer

        # host-side episode accounting (poca_trainer.py:322-330)
        self._episode_reward_acc = np.zeros(self.num_envs)
        self._episode_step_count = np.zeros(self.num_envs)
        self.completed_episode_returns: list[float] = []
        self.completed_episode_lengths: list[float] = []
        self.completed_group_rewards: list[float] = []
        self._rollout_reward_history: list[float] = []
        self._max_history = 100

        # jitted programs. train_state is deliberately NOT donated: the
        # checkpointer snapshots it with async device→host copies that
        # overlap the next iteration's compute (agents/checkpoint.py) —
        # donation would invalidate those refs at the next dispatch. The
        # forgone aliasing costs one ~param-sized HBM copy per program
        # (µs at 21 MB), vs the seconds-per-iteration tunnel transfer the
        # overlap hides.
        self._rollout_jit = jax.jit(self._rollout_fn, donate_argnums=(1,))
        self._update_jit = jax.jit(self._update_fn)
        self._train_iter_jit = jax.jit(self._train_iter_fn, donate_argnums=(1,))

        # split-update mode (see POCAConfig.split_update_groups): identical
        # math to the fused program, but one device call per minibatch so
        # single-program wall time stays bounded at large E. The trigger is
        # the BUFFER size (T·E groups): fused-program wall time scales with
        # total work per epoch, not with the minibatch size. Covers all
        # four shapes (ff/recurrent × single-device/mesh).
        self._use_split_update = (
            c.split_update_groups > 0 and T_E > c.split_update_groups
        )
        if c.rollout_segments > 1 and c.horizon % c.rollout_segments:
            raise ValueError(
                f"horizon={c.horizon} not divisible by "
                f"rollout_segments={c.rollout_segments}")
        self._prep_update_jit = jax.jit(self._prep_dispatch,
                                        donate_argnums=(0,))
        # train_state not donated (see the jitted-programs note above):
        # the iteration's final train_state is held by the checkpointer's
        # async snapshot across the next iteration's first minibatch step
        self._mb_step_jit = jax.jit(self._mb_step_dispatch)
        self._rollout_seg_jit = jax.jit(
            partial(self._rollout_fn,
                    length=c.horizon // max(1, c.rollout_segments),
                    want_bootstrap=False),
            donate_argnums=(1,))
        self._bootstrap_jit = jax.jit(self._bootstrap_fn)

    # ──────────────────────────────────────────────────────────────
    #  helpers
    # ──────────────────────────────────────────────────────────────

    def init_params_for_seed(self, seed: int):
        """Fresh ``(params, key)`` exactly as a serial run with
        ``cfg.seed=seed`` produces them — the same PRNGKey threading as
        the reference trainer's per-seed init. Shared by ``__init__`` and
        the seed-parallel trainer (agents/seed_parallel.py) so a vmapped
        seed lane starts from the identical state its serial counterpart
        would."""
        c = self.cfg
        key = jax.random.PRNGKey(seed)
        key, ka, kc = jax.random.split(key, 3)
        dummy_obs = jnp.zeros((2, self.obs_dim))
        if self.recurrent:
            carry0 = (jnp.zeros((2, c.memory_size)), jnp.zeros((2, c.memory_size)))
            actor_params = self.actor.init(ka, dummy_obs, carry0,
                                           method=self.actor.step)["params"]
        else:
            actor_params = self.actor.init(ka, dummy_obs)["params"]
        critic_params = self.critic.init(
            kc, jnp.zeros((2, self.num_agents, self.STATE_DIM)),
            jnp.zeros((2, self.num_agents, self.act_dim_critic)),
        )["params"]
        return {"actor": actor_params, "critic": critic_params}, key

    def _encode_actions_for_critic(self, actions):
        """One-hot discrete actions for the critic's entity embedding
        (poca_trainer.py:353-366)."""
        if self.discrete:
            idx = actions[..., 0].astype(jnp.int32)
            return jax.nn.one_hot(idx, self.num_actions, dtype=jnp.float32)
        return actions

    def init_actor_carry(self):
        B = self.num_envs * self.num_agents
        m = self.cfg.memory_size
        return (jnp.zeros((B, m)), jnp.zeros((B, m)))

    def _apply_actor(self, params, flat_obs, carry):
        """Returns (dist_params, new_carry)."""
        if self.recurrent:
            logits, new_carry = self.actor.apply(
                {"params": params}, flat_obs, carry, method=self.actor.step
            )
            return logits, new_carry
        if self.discrete:
            return self.actor.apply({"params": params}, flat_obs), carry
        return self.actor.apply({"params": params}, flat_obs), carry

    # ──────────────────────────────────────────────────────────────
    #  rollout (lax.scan over horizon, fully on device)
    # ──────────────────────────────────────────────────────────────

    def _rollout_fn(self, params, env_state, obs, actor_carry, key,
                    length=None, want_bootstrap=True):
        """Collect ``length`` (default horizon) decisions. Returns
        (env_state, obs, actor_carry, key, rollout, bootstrap_value).
        ``want_bootstrap=False`` skips the end-of-rollout critic pass
        (segmented rollouts only need it after the final segment)."""
        if self._use_lanes:
            return self._rollout_fn_lanes(params, env_state, obs,
                                          actor_carry, key, length,
                                          want_bootstrap)
        env = self.env
        E, N = self.num_envs, self.num_agents
        dp = self.cfg.decision_period

        def step_fn(carry, _):
            env_state, obs, actor_carry, key = carry
            key, k_sample = jax.random.split(key)
            flat_obs = obs.reshape(E * N, self.obs_dim)

            if self.recurrent:
                mem = self.cfg.memory_size
                stored_h = actor_carry[0].reshape(E, N, mem)
                stored_c = actor_carry[1].reshape(E, N, mem)
            else:
                stored_h = stored_c = None

            dist_params, new_carry = self._apply_actor(
                params["actor"], flat_obs, actor_carry
            )
            if self.discrete:
                logits = dist_params
                act_flat = DiscreteActor.sample(k_sample, logits)      # (E·N,)
                logp_flat = DiscreteActor.log_prob(logits, act_flat)   # (E·N,)
                actions = act_flat.reshape(E, N, 1).astype(jnp.float32)
                log_probs = logp_flat.reshape(E, N, 1)
                env_actions = act_flat.reshape(E, N).astype(jnp.int32)
            else:
                mu, std = dist_params
                act_flat = Actor.sample(k_sample, mu, std)             # (E·N, A)
                logp_flat = Actor.log_prob(mu, std, act_flat)
                actions = act_flat.reshape(E, N, self.act_dim)
                log_probs = logp_flat.reshape(E, N, self.act_dim)
                # ML-Agents env preprocessing clamp(−3,3)/3; buffer keeps RAW
                # actions (poca_trainer.py:457-467)
                env_actions = jnp.clip(actions, -3.0, 3.0) / 3.0

            critic_state = env.critic_state(env_state)                 # (E,N,5)
            team_val = self.critic.apply(
                {"params": params["critic"]}, critic_state,
                method=self.critic.critic_pass,
            )[:, 0]                                                    # (E,)
            critic_actions = self._encode_actions_for_critic(actions)
            baselines = self.critic.apply(
                {"params": params["critic"]}, critic_state, critic_actions,
                method=self.critic.all_baselines,
            )                                                          # (E,N)

            # decision_period sub-steps with the same action
            # (poca_trainer.py:469-482)
            acc_reward = jnp.zeros(E)
            last_done = jnp.zeros(E)
            next_obs = obs
            for _sub in range(dp):
                env_state, ts = env.step(env_state, env_actions)
                acc_reward = acc_reward + ts.reward
                last_done = jnp.maximum(last_done, ts.done.astype(jnp.float32))
                next_obs = ts.obs

            transition = Rollout(
                obs=obs,
                critic_states=critic_state,
                actions=actions,
                log_probs=log_probs,
                rewards=acc_reward * self.cfg.reward_strength,
                dones=last_done,
                team_values=team_val,
                baselines=baselines,
                memory_h=stored_h,
                memory_c=stored_c,
            )

            if self.recurrent:
                keep = (1.0 - last_done)[:, None].repeat(N, 1).reshape(E * N, 1)
                new_carry = (new_carry[0] * keep, new_carry[1] * keep)

            # per-env episode bookkeeping rides along in auxiliary outputs
            aux = (acc_reward, last_done,
                   env_state.completed_group_reward)
            return (env_state, next_obs, new_carry, key), (transition, aux)

        (env_state, obs, actor_carry, key), (rollout, aux) = jax.lax.scan(
            step_fn, (env_state, obs, actor_carry, key), None,
            length=self.cfg.horizon if length is None else length,
        )

        bootstrap = (self._bootstrap_fn(params["critic"], env_state)
                     if want_bootstrap else None)
        return env_state, obs, actor_carry, key, rollout, bootstrap, aux

    def _rollout_fn_lanes(self, params, env_state, obs, actor_carry, key,
                          length=None, want_bootstrap=True):
        """``_rollout_fn`` with the fused single-Pallas-program env step:
        the scan carries the arena-on-lanes state (env/lanes.py), so the
        per-step env work is ONE kernel call instead of the composed
        step's ~10 small fusions + per-phase kernels. Interface-identical
        to ``_rollout_fn`` — the lanes layout exists only inside this
        function (conversion at scan entry/exit), so the update path,
        checkpoints and the outer loop are unchanged. Gated by
        POCAConfig.fused_env_step."""
        from ..env import lanes as laneslib

        env = self.env
        E, N = self.num_envs, self.num_agents
        dp = self.cfg.decision_period
        lanes0 = laneslib.state_to_lanes(env, env_state)

        def step_fn(carry, _):
            lanes, obs, actor_carry, key = carry
            key, k_sample = jax.random.split(key)
            flat_obs = obs.reshape(E * N, self.obs_dim)

            if self.recurrent:
                mem = self.cfg.memory_size
                stored_h = actor_carry[0].reshape(E, N, mem)
                stored_c = actor_carry[1].reshape(E, N, mem)
            else:
                stored_h = stored_c = None

            dist_params, new_carry = self._apply_actor(
                params["actor"], flat_obs, actor_carry
            )
            if self.discrete:
                logits = dist_params
                act_flat = DiscreteActor.sample(k_sample, logits)
                logp_flat = DiscreteActor.log_prob(logits, act_flat)
                actions = act_flat.reshape(E, N, 1).astype(jnp.float32)
                log_probs = logp_flat.reshape(E, N, 1)
                env_actions = laneslib.to_lanes(
                    act_flat.reshape(E, N).astype(jnp.int32), E)
            else:
                mu, std = dist_params
                act_flat = Actor.sample(k_sample, mu, std)
                logp_flat = Actor.log_prob(mu, std, act_flat)
                actions = act_flat.reshape(E, N, self.act_dim)
                log_probs = logp_flat.reshape(E, N, self.act_dim)
                # clamp(−3,3)/3 preprocessing (poca_trainer.py:457-467);
                # step_lanes applies the env-side ×max_wheel_speed
                ea = jnp.clip(actions, -3.0, 3.0) / 3.0
                env_actions = (laneslib.to_lanes(ea[..., 0], E),
                               laneslib.to_lanes(ea[..., 1], E))

            critic_state = laneslib.critic_state_from_lanes(env, lanes)
            team_val = self.critic.apply(
                {"params": params["critic"]}, critic_state,
                method=self.critic.critic_pass,
            )[:, 0]
            critic_actions = self._encode_actions_for_critic(actions)
            baselines = self.critic.apply(
                {"params": params["critic"]}, critic_state, critic_actions,
                method=self.critic.all_baselines,
            )

            acc_reward = jnp.zeros(E)
            last_done = jnp.zeros(E)
            next_obs = obs
            for sub in range(dp):
                want = sub == dp - 1
                lanes, reward, done, obs_tiles = laneslib.step_lanes(
                    env, lanes, env_actions, want_obs=want)
                acc_reward = acc_reward + reward
                last_done = jnp.maximum(last_done, done.astype(jnp.float32))
                if want:
                    next_obs = laneslib.obs_from_tiles(env, obs_tiles,
                                                       lanes["prev"])

            transition = Rollout(
                obs=obs,
                critic_states=critic_state,
                actions=actions,
                log_probs=log_probs,
                rewards=acc_reward * self.cfg.reward_strength,
                dones=last_done,
                team_values=team_val,
                baselines=baselines,
                memory_h=stored_h,
                memory_c=stored_c,
            )

            if self.recurrent:
                keep = (1.0 - last_done)[:, None].repeat(N, 1).reshape(E * N, 1)
                new_carry = (new_carry[0] * keep, new_carry[1] * keep)

            aux = (acc_reward, last_done,
                   laneslib.from_lanes(lanes["cg"], E, squeeze=True))
            return (lanes, next_obs, new_carry, key), (transition, aux)

        (lanes, obs, actor_carry, key), (rollout, aux) = jax.lax.scan(
            step_fn, (lanes0, obs, actor_carry, key), None,
            length=self.cfg.horizon if length is None else length,
        )
        env_state = laneslib.lanes_to_state(env, lanes)

        bootstrap = (self._bootstrap_fn(params["critic"], env_state)
                     if want_bootstrap else None)
        return env_state, obs, actor_carry, key, rollout, bootstrap, aux

    def _bootstrap_fn(self, critic_params, env_state):
        """V(s_T) for the λ-return bootstrap (poca_trainer.py:528-530)."""
        last_state = self.env.critic_state(env_state)
        return self.critic.apply(
            {"params": critic_params}, last_state,
            method=self.critic.critic_pass,
        )[:, 0]

    # ──────────────────────────────────────────────────────────────
    #  losses
    # ──────────────────────────────────────────────────────────────

    def _feedforward_loss(self, params, batch, eps, beta):
        """poca_trainer.py:534-575."""
        obs = batch["obs"]                  # (MB, N, obs)
        MB, N = obs.shape[:2]
        flat_obs = obs.reshape(MB * N, self.obs_dim)
        actions = batch["actions"]

        if self.discrete:
            logits = self.actor.apply({"params": params["actor"]}, flat_obs)
            act_flat = actions.reshape(MB * N, 1)[:, 0]
            logp = DiscreteActor.log_prob(logits, act_flat)[:, None]   # (MB·N,1)
            ent = DiscreteActor.entropy(logits)
        else:
            mu, std = self.actor.apply({"params": params["actor"]}, flat_obs)
            act_flat = actions.reshape(MB * N, self.act_dim)
            logp = Actor.log_prob(mu, std, act_flat)                   # (MB·N,A)
            ent = Actor.entropy(std)

        policy_loss = losses.trust_region_policy_loss(
            batch["advantages"].reshape(-1, 1),
            logp,
            batch["old_log_probs"].reshape(MB * N, -1),
            eps,
        )
        mean_entropy = ent.mean()

        cs = batch["critic_states"]
        new_tv = self.critic.apply({"params": params["critic"]}, cs,
                                   method=self.critic.critic_pass)[:, 0]
        critic_act = self._encode_actions_for_critic(actions)
        new_bl = self.critic.apply({"params": params["critic"]}, cs, critic_act,
                                   method=self.critic.all_baselines)

        value_loss = losses.trust_region_value_loss(
            new_tv, batch["old_team_values"], batch["returns"], eps)
        ret_exp = jnp.broadcast_to(batch["returns"][:, None], new_bl.shape)
        baseline_loss = losses.trust_region_value_loss(
            new_bl.reshape(-1), batch["old_baselines"].reshape(-1),
            ret_exp.reshape(-1), eps)

        total = losses.poca_total_loss(policy_loss, value_loss, baseline_loss,
                                       mean_entropy, beta)
        return total, (policy_loss, value_loss, baseline_loss, mean_entropy)

    def _recurrent_loss(self, params, batch, eps, beta):
        """poca_trainer.py:577-642 — BPTT with done-masked carry."""
        obs = batch["obs"]                  # (B, L, N, obs)
        B, L, N = obs.shape[:3]
        mem = self.cfg.memory_size

        obs_seq = obs.transpose(0, 2, 1, 3).reshape(B * N, L, self.obs_dim)
        act_seq = batch["actions"].transpose(0, 2, 1, 3).reshape(B * N, L)
        h0 = batch["memory_h"].reshape(B * N, mem)
        c0 = batch["memory_c"].reshape(B * N, mem)
        dones_bn = jnp.broadcast_to(
            batch["dones"][:, None, :], (B, N, L)
        ).reshape(B * N, L)

        logits_seq, _ = self.actor.apply(
            {"params": params["actor"]}, obs_seq, (h0, c0), dones_bn,
            method=self.actor.forward_sequence,
        )                                                # (B·N, L, A)
        logp = DiscreteActor.log_prob(
            logits_seq.reshape(B * N * L, self.num_actions),
            act_seq.reshape(B * N * L),
        ).reshape(B * N, L)
        ent = DiscreteActor.entropy(
            logits_seq.reshape(B * N * L, self.num_actions)
        ).reshape(B * N, L)

        # back to (B, L, N, 1) for the shared policy-loss shape
        new_logp = logp.reshape(B, N, L).transpose(0, 2, 1)[..., None]
        policy_loss = losses.trust_region_policy_loss(
            batch["advantages"].reshape(-1, 1),
            new_logp.reshape(-1, 1),
            batch["old_log_probs"].reshape(-1, 1),
            eps,
        )
        mean_entropy = ent.mean()

        cs = batch["critic_states"].reshape(B * L, N, self.STATE_DIM)
        acts = batch["actions"].reshape(B * L, N, self.act_dim)
        rets = batch["returns"].reshape(B * L)
        old_tv = batch["old_team_values"].reshape(B * L)
        old_bl = batch["old_baselines"].reshape(B * L, N)

        new_tv = self.critic.apply({"params": params["critic"]}, cs,
                                   method=self.critic.critic_pass)[:, 0]
        critic_act = self._encode_actions_for_critic(acts)
        new_bl = self.critic.apply({"params": params["critic"]}, cs, critic_act,
                                   method=self.critic.all_baselines)

        value_loss = losses.trust_region_value_loss(new_tv, old_tv, rets, eps)
        ret_exp = jnp.broadcast_to(rets[:, None], new_bl.shape)
        baseline_loss = losses.trust_region_value_loss(
            new_bl.reshape(-1), old_bl.reshape(-1), ret_exp.reshape(-1), eps)

        total = losses.poca_total_loss(policy_loss, value_loss, baseline_loss,
                                       mean_entropy, beta)
        return total, (policy_loss, value_loss, baseline_loss, mean_entropy)

    # ──────────────────────────────────────────────────────────────
    #  update
    # ──────────────────────────────────────────────────────────────

    def _chunk_rows(self, batch_rows: int, groups_per_row: int = 1) -> int:
        """Rows per gradient-accumulation chunk for a minibatch of
        ``batch_rows`` rows of ``groups_per_row`` arena timesteps each
        (1 for feedforward; the BPTT window length for recurrent batches,
        so the cap is honoured in GROUPS either way — see
        POCAConfig.accum_chunk_groups). Returns ``batch_rows`` (no
        chunking) when the whole batch fits under the cap."""
        cap = self.cfg.accum_chunk_groups
        if cap <= 0 or batch_rows * groups_per_row <= cap:
            return batch_rows
        return max(1, cap // groups_per_row)

    def _grad_chunks(self, batch_rows: int, groups_per_row: int = 1) -> int:
        """Number of gradient-accumulation passes (incl. a possible
        shorter tail chunk) the minibatch will be split into."""
        rows = self._chunk_rows(batch_rows, groups_per_row)
        return -(-batch_rows // rows)

    def _sgd_step(self, train_state: TrainState, batch, eps, beta, loss_fn,
                  groups_per_row: int = 1):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        B = jax.tree_util.tree_leaves(batch)[0].shape[0]
        rows = self._chunk_rows(B, groups_per_row)
        if rows >= B:
            (_, aux), grads = grad_fn(train_state.params, batch, eps, beta)
        else:
            # exact chunked accumulation: chunk means weighted by row count
            # (every loss term is a per-element mean with a fixed element
            # count per row, so Σᵢ wᵢ·meanᵢ with wᵢ = rowsᵢ/B equals the
            # full-batch mean — and likewise for its gradient). The tail
            # chunk (B mod rows) gets its own weighted pass, so the
            # activation-memory cap holds for ANY minibatch size.
            n_full, rem = divmod(B, rows)
            head = jax.tree_util.tree_map(
                lambda x: x[: n_full * rows].reshape(n_full, rows,
                                                     *x.shape[1:]),
                batch)

            def chunk_fn(carry, ch):
                g_acc, aux_acc = carry
                (_, aux_c), g = grad_fn(train_state.params, ch, eps, beta)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                return (g_acc, aux_acc + jnp.stack(aux_c)), None

            g0 = jax.tree_util.tree_map(jnp.zeros_like, train_state.params)
            (g_sum, aux_sum), _ = jax.lax.scan(
                chunk_fn, (g0, jnp.zeros(4)), head)
            w_full = rows / B
            grads = jax.tree_util.tree_map(lambda g: g * w_full, g_sum)
            aux_v = aux_sum * w_full
            if rem:
                tail = jax.tree_util.tree_map(lambda x: x[n_full * rows:],
                                              batch)
                (_, aux_t), g_t = grad_fn(train_state.params, tail, eps, beta)
                w_tail = rem / B
                grads = jax.tree_util.tree_map(
                    lambda a, b: a + b * w_tail, grads, g_t)
                aux_v = aux_v + jnp.stack(aux_t) * w_tail
            aux = tuple(aux_v)
        if self.mesh is not None:
            # data-parallel learner: all-reduce gradients over the mesh
            # (each shard's loss is a mean over its local minibatch slice,
            # so pmean = the global-minibatch gradient)
            grads = jax.lax.pmean(grads, meshlib.DATA_AXIS)
            aux = jax.lax.pmean(jnp.stack(aux), meshlib.DATA_AXIS)
        else:
            aux = jnp.stack(aux)
        updates, opt_state = self.tx.update(grads, train_state.opt_state,
                                            train_state.params)
        params = optax.apply_updates(train_state.params, updates)
        return TrainState(params=params, opt_state=opt_state), aux

    def _normalize_advantages(self, advantages):
        """Mean-0/std-1 over the GLOBAL buffer (Bessel-corrected, matching
        torch.std — poca_trainer.py:676-683); under the mesh the moments
        are all-reduced so every shard normalizes identically."""
        if self.mesh is None:
            return buf.normalize_advantages(advantages)
        n_local = advantages.size
        n_global = n_local * self.n_shards
        mean = jax.lax.pmean(advantages.mean(), meshlib.DATA_AXIS)
        sq = jax.lax.pmean(((advantages - mean) ** 2).sum(), meshlib.DATA_AXIS)
        var = sq * self.n_shards / (n_global - 1)
        return (advantages - mean) / (jnp.sqrt(var) + 1e-10)

    def _update_fn(self, train_state: TrainState, rollout: Rollout, bootstrap,
                   lr, eps, beta, key):
        """num_epochs PPO epochs over the buffer → (train_state, metrics)."""
        c = self.cfg
        if self.mesh is not None:
            # decorrelate each shard's minibatch permutation
            key = jax.random.fold_in(key, jax.lax.axis_index(meshlib.DATA_AXIS))
        returns, advantages = buf.compute_advantages(rollout, bootstrap,
                                                     c.gamma, c.lam)
        advantages = self._normalize_advantages(advantages)

        # schedule the learner's lr through the injected hyperparam
        opt_state = train_state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        train_state = TrainState(params=train_state.params, opt_state=opt_state)

        if self.recurrent:
            return self._update_recurrent(train_state, rollout, returns,
                                          advantages, eps, beta, key)
        return self._update_feedforward(train_state, rollout, returns,
                                        advantages, eps, beta, key)

    @staticmethod
    def _flatten_buffer(rollout: Rollout, returns, advantages) -> dict:
        """(T, E, …) buffer → flat (T·E, …) minibatch source arrays —
        shared by the fused and split update paths."""
        return {
            "obs": buf.flatten_time_env(rollout.obs),
            "critic_states": buf.flatten_time_env(rollout.critic_states),
            "actions": buf.flatten_time_env(rollout.actions),
            "old_log_probs": buf.flatten_time_env(rollout.log_probs),
            "advantages": buf.flatten_time_env(advantages),
            "returns": returns.reshape(-1),
            "old_team_values": buf.flatten_time_env(rollout.team_values),
            "old_baselines": buf.flatten_time_env(rollout.baselines),
        }

    def _update_feedforward(self, train_state, rollout, returns, advantages,
                            eps, beta, key):
        c = self.cfg
        # local shapes (under shard_map E is the per-device slice)
        T_loc, E_loc = rollout.rewards.shape
        T_E = T_loc * E_loc
        flat = self._flatten_buffer(rollout, returns, advantages)
        mb = max(1, self.group_mb // self.n_shards)
        mb = min(mb, T_E)
        n_full = T_E // mb
        rem = T_E % mb

        def epoch_fn(carry, epoch_key):
            train_state = carry
            perm = jax.random.permutation(epoch_key, T_E)

            def mb_fn(ts, idx):
                batch = jax.tree_util.tree_map(lambda x: x[idx], flat)
                return self._sgd_step(ts, batch, eps, beta, self._feedforward_loss)

            idxs = perm[: n_full * mb].reshape(n_full, mb)
            train_state, auxs = jax.lax.scan(mb_fn, train_state, idxs)
            aux_sum = auxs.sum(0)
            n_batches = n_full
            if rem > 0:
                train_state, aux_tail = mb_fn(train_state, perm[n_full * mb:])
                aux_sum = aux_sum + aux_tail
                n_batches += 1
            return train_state, (aux_sum, jnp.asarray(n_batches, jnp.float32))

        epoch_keys = jax.random.split(key, c.num_epochs)
        train_state, (aux_sums, counts) = jax.lax.scan(epoch_fn, train_state,
                                                       epoch_keys)
        metrics = aux_sums.sum(0) / counts.sum()
        return train_state, {
            "policy_loss": metrics[0], "value_loss": metrics[1],
            "baseline_loss": metrics[2], "entropy": metrics[3],
            "mean_abs_advantage": jnp.abs(advantages).mean(),
        }

    # ── split-update path (one device program per minibatch) ──────

    def _pmean(self, x):
        return x if self.mesh is None else jax.lax.pmean(x, meshlib.DATA_AXIS)

    def _prep_update_fn(self, rollout: Rollout, bootstrap):
        """Returns/advantages + minibatch source arrays (flat buffer, or
        the BPTT window-group batches when recurrent).

        The rollout is DONATED into this program (its buffers are reused
        for the flat arrays rather than held alongside them — the split
        path's equivalent of the fused program's rollout donation); the
        per-step stats the outer loop needs are re-emitted as outputs.
        Under the mesh this runs inside shard_map (advantage moments and
        scalar stats all-reduced), so normalization matches the fused
        mesh program exactly.
        """
        c = self.cfg
        returns, advantages = buf.compute_advantages(rollout, bootstrap,
                                                     c.gamma, c.lam)
        advantages = self._normalize_advantages(advantages)
        stats = {
            "rewards": rollout.rewards,
            "dones": rollout.dones,
            "mean_team_value": self._pmean(rollout.team_values.mean()),
        }
        if self.recurrent:
            batches = self._window_batches(rollout, returns, advantages)
        else:
            batches = self._flatten_buffer(rollout, returns, advantages)
        return batches, self._pmean(jnp.abs(advantages).mean()), stats

    def _prep_dispatch(self, rollout: Rollout, bootstrap):
        if self.mesh is None:
            return self._prep_update_fn(rollout, bootstrap)
        batch_spec = P(None, meshlib.DATA_AXIS)
        rollout_specs = jax.tree_util.tree_map(lambda _: batch_spec, rollout)
        return jax.shard_map(
            self._prep_update_fn,
            mesh=self.mesh,
            in_specs=(rollout_specs, P(meshlib.DATA_AXIS)),
            # batches: every leaf is sharded on its leading (row) axis
            out_specs=(P(meshlib.DATA_AXIS), P(),
                       {"rewards": batch_spec, "dones": batch_spec,
                        "mean_team_value": P()}),
            check_vma=False,
        )(rollout, bootstrap)

    def _mb_step_fn(self, train_state, flat, idx, eps, beta):
        batch = jax.tree_util.tree_map(lambda x: x[idx], flat)
        if self.recurrent:
            # each BPTT-window row holds L arena timesteps (L = static
            # window length from the batch shape)
            return self._sgd_step(train_state, batch, eps, beta,
                                  self._recurrent_loss,
                                  groups_per_row=batch["obs"].shape[1])
        return self._sgd_step(train_state, batch, eps, beta,
                              self._feedforward_loss)

    def _mb_step_dispatch(self, train_state, flat, idx, eps, beta):
        """One minibatch SGD step; shard_map'd under the mesh (per-shard
        local row indices, grads pmean'd inside _sgd_step)."""
        if self.mesh is None:
            return self._mb_step_fn(train_state, flat, idx, eps, beta)
        ts_specs = jax.tree_util.tree_map(lambda _: P(), train_state)
        return jax.shard_map(
            self._mb_step_fn,
            mesh=self.mesh,
            in_specs=(ts_specs, P(meshlib.DATA_AXIS), P(meshlib.DATA_AXIS),
                      P(), P()),
            out_specs=(ts_specs, P()),
            check_vma=False,
        )(train_state, flat, idx, eps, beta)

    def _shard_epoch_keys(self, key):
        """Per-shard epoch key streams replicating the fused program's RNG
        (fold_in(axis_index) under the mesh, then per-epoch split)."""
        if self.mesh is None:
            return [jax.random.split(key, self.cfg.num_epochs)]
        return [jax.random.split(jax.random.fold_in(key, s),
                                 self.cfg.num_epochs)
                for s in range(self.n_shards)]

    def _place_idx(self, per_shard_idx):
        """Stack per-shard local index slices into one array sharded so
        each device receives ITS slice inside shard_map."""
        if self.mesh is None:
            return per_shard_idx[0]
        return jax.device_put(jnp.concatenate(per_shard_idx),
                              meshlib.batch_sharding(self.mesh))

    def _update_split(self, rollout, bootstrap, lr, eps, beta, key):
        """Same epochs/minibatches/permutations as the fused update, driven
        from the host so no single device program exceeds one minibatch —
        bit-compatible with the fused program in all four shapes
        (ff/recurrent × single-device/mesh)."""
        c = self.cfg
        batches, mean_abs_adv, stats = self._prep_update_jit(rollout,
                                                             bootstrap)

        # rebuild (never mutate) the live opt_state to inject the lr: the
        # checkpointer's pipelined snapshot may still hold a reference to
        # this exact pytree (agents/checkpoint.py), so host-side in-place
        # mutation would corrupt the pending checkpoint's hyperparams
        opt_state = self.train_state.opt_state._replace(
            hyperparams={**self.train_state.opt_state.hyperparams,
                         "learning_rate": jnp.asarray(lr)})
        train_state = TrainState(params=self.train_state.params,
                                 opt_state=opt_state)

        epoch_keys = self._shard_epoch_keys(key)
        aux_sum = jnp.zeros(4)
        n_batches = 0

        def run_batch(ts, source, per_shard_slices):
            idx = self._place_idx(per_shard_slices)
            return self._mb_step_jit(ts, source, idx, eps, beta)

        if not self.recurrent:
            T_E_loc = c.horizon * self.num_envs // self.n_shards
            mb = min(max(1, self.group_mb // self.n_shards), T_E_loc)
            n_full, rem = divmod(T_E_loc, mb)
            for e in range(c.num_epochs):
                perms = [jax.random.permutation(epoch_keys[s][e], T_E_loc)
                         for s in range(self.n_shards)]
                for i in range(n_full):
                    sl = slice(i * mb, (i + 1) * mb)
                    train_state, aux = run_batch(
                        train_state, batches, [p[sl] for p in perms])
                    aux_sum = aux_sum + aux
                    n_batches += 1
                if rem > 0:
                    train_state, aux = run_batch(
                        train_state, batches,
                        [p[n_full * mb:] for p in perms])
                    aux_sum = aux_sum + aux
                    n_batches += 1
        else:
            for e in range(c.num_epochs):
                ek = [epoch_keys[s][e] for s in range(self.n_shards)]
                for L, group in sorted(batches.items()):
                    W_loc = group["obs"].shape[0] // self.n_shards
                    seq_bs = max(1, (self.group_mb // self.n_shards)
                                 // max(L, 1))
                    seq_bs = min(seq_bs, W_loc)
                    n_full, rem = divmod(W_loc, seq_bs)
                    perms = []
                    for s in range(self.n_shards):
                        ek[s], k_perm = jax.random.split(ek[s])
                        perms.append(jax.random.permutation(k_perm, W_loc))
                    for i in range(n_full):
                        sl = slice(i * seq_bs, (i + 1) * seq_bs)
                        train_state, aux = run_batch(
                            train_state, group, [p[sl] for p in perms])
                        aux_sum = aux_sum + aux
                        n_batches += 1
                    if rem > 0:
                        train_state, aux = run_batch(
                            train_state, group,
                            [p[n_full * seq_bs:] for p in perms])
                        aux_sum = aux_sum + aux
                        n_batches += 1

        metrics_v = aux_sum / n_batches
        metrics = {
            "policy_loss": metrics_v[0], "value_loss": metrics_v[1],
            "baseline_loss": metrics_v[2], "entropy": metrics_v[3],
            "mean_abs_advantage": mean_abs_adv,
        }
        return train_state, metrics, stats

    def _train_iteration_split(self, env_state, obs, actor_carry, lr, eps, beta):
        key, k_up = jax.random.split(self.key)
        segs = max(1, self.cfg.rollout_segments)
        if segs == 1:
            (env_state, obs, actor_carry, key, rollout, bootstrap,
             aux) = self._rollout_jit(self.train_state.params, env_state,
                                      obs, actor_carry, key)
        else:
            # horizon in `segs` sequential device programs; the PRNG key is
            # carried across segments so per-step keys (and therefore
            # trajectories) are bit-identical to the unsegmented scan
            parts, auxes = [], []
            for _ in range(segs):
                (env_state, obs, actor_carry, key, part, _,
                 a) = self._rollout_seg_jit(self.train_state.params,
                                            env_state, obs, actor_carry, key)
                parts.append(part)
                auxes.append(a)
            rollout = jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs, axis=0), *parts)
            aux = jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs, axis=0), *auxes)
            # the λ-return bootstrap only needs V(s_T) after the FINAL
            # segment — one small program, not one critic pass per segment
            bootstrap = self._bootstrap_jit(
                self.train_state.params["critic"], env_state)
        # rollout is donated into the update prep; per-step stats come back
        # out of it (plus the env-side completed-reward snapshot from aux)
        train_state, metrics, stats = self._update_split(
            rollout, bootstrap, lr, eps, beta, k_up)
        stats["completed_group"] = aux[2]
        self.train_state = train_state
        self.key = key
        return env_state, obs, actor_carry, metrics, stats

    def _window_groups(self):
        """Static BPTT window layout (poca_buffer.py:190-208): fixed-stride
        windows grouped by length."""
        T, L = self.cfg.horizon, max(1, min(self.cfg.sequence_length, self.cfg.horizon))
        groups: dict[int, list[int]] = {}
        for s in range(0, T, L):
            length = min(L, T - s)
            groups.setdefault(length, []).append(s)
        return groups

    def _window_batches(self, rollout, returns, advantages):
        """BPTT window-group batches {L: batch} from the buffer — shared by
        the fused and split recurrent updates (poca_buffer.py:190-246)."""
        def windows_for(starts, length):
            """Stack (n_starts·E) windows of a given length from the buffer."""
            def win(x):
                # x: (T, E, …) → (n_s, L, E, …) → (n_s, E, L, …) → (n_s·E, L, …)
                pieces = jnp.stack([
                    jax.lax.dynamic_slice_in_dim(x, s, length, axis=0)
                    for s in starts
                ])
                moved = jnp.moveaxis(pieces, 2, 1)
                return moved.reshape((-1, length) + x.shape[2:])

            return {
                "obs": win(rollout.obs),
                "critic_states": win(rollout.critic_states),
                "actions": win(rollout.actions),
                "old_log_probs": win(rollout.log_probs),
                "advantages": win(advantages),
                "dones": win(rollout.dones),
                "returns": win(returns),
                "old_team_values": win(rollout.team_values),
                "old_baselines": win(rollout.baselines),
                # initial memory = state at window start (poca_buffer.py:240-245)
                "memory_h": jnp.concatenate([rollout.memory_h[s] for s in starts]),
                "memory_c": jnp.concatenate([rollout.memory_c[s] for s in starts]),
            }

        return {L: windows_for(starts, L)
                for L, starts in self._window_groups().items()}

    def _update_recurrent(self, train_state, rollout, returns, advantages,
                          eps, beta, key):
        c = self.cfg
        group_batches = self._window_batches(rollout, returns, advantages)

        def epoch_fn(train_state, epoch_key):
            aux_sum = jnp.zeros(4)
            n_batches = 0.0
            # sorted: jit boundaries canonicalize dict key order, so the
            # split path sees sorted groups — iterate identically here to
            # keep the RNG/permutation streams bit-compatible
            for L, batch_all in sorted(group_batches.items()):
                W = batch_all["obs"].shape[0]
                seq_bs = max(1, (self.group_mb // self.n_shards) // max(L, 1))
                seq_bs = min(seq_bs, W)
                n_full = W // seq_bs
                rem = W % seq_bs
                epoch_key, k_perm = jax.random.split(epoch_key)
                perm = jax.random.permutation(k_perm, W)

                def mb_fn(ts, idx, _batch_all=batch_all, _L=L):
                    batch = jax.tree_util.tree_map(lambda x: x[idx], _batch_all)
                    # each BPTT-window row holds L arena timesteps, so the
                    # accumulation cap counts groups_per_row=L
                    return self._sgd_step(ts, batch, eps, beta,
                                          self._recurrent_loss,
                                          groups_per_row=_L)

                idxs = perm[: n_full * seq_bs].reshape(n_full, seq_bs)
                train_state, auxs = jax.lax.scan(mb_fn, train_state, idxs)
                aux_sum = aux_sum + auxs.sum(0)
                n_batches += n_full
                if rem > 0:
                    train_state, aux_tail = mb_fn(train_state,
                                                  perm[n_full * seq_bs:])
                    aux_sum = aux_sum + aux_tail
                    n_batches += 1
            return train_state, (aux_sum, jnp.asarray(n_batches, jnp.float32))

        # epochs as a Python loop (static, 3) — group dict isn't scannable
        keys = jax.random.split(key, c.num_epochs)
        aux_total = jnp.zeros(4)
        count_total = 0.0
        for e in range(c.num_epochs):
            train_state, (aux_sum, n_b) = epoch_fn(train_state, keys[e])
            aux_total = aux_total + aux_sum
            count_total = count_total + n_b
        metrics = aux_total / count_total
        return train_state, {
            "policy_loss": metrics[0], "value_loss": metrics[1],
            "baseline_loss": metrics[2], "entropy": metrics[3],
            "mean_abs_advantage": jnp.abs(advantages).mean(),
        }

    # ──────────────────────────────────────────────────────────────
    #  fused train iteration
    # ──────────────────────────────────────────────────────────────

    def _update_dispatch(self, train_state, rollout, bootstrap, lr, eps, beta, key):
        """Plain update on one device; shard_map'd update over the mesh."""
        if self.mesh is None:
            return self._update_fn(train_state, rollout, bootstrap,
                                   lr, eps, beta, key)

        batch_spec = P(None, meshlib.DATA_AXIS)  # (T, E, …) sharded on E
        rollout_specs = jax.tree_util.tree_map(lambda _: batch_spec, rollout)
        ts_specs = jax.tree_util.tree_map(lambda _: P(), train_state)
        sharded_update = jax.shard_map(
            self._update_fn,
            mesh=self.mesh,
            in_specs=(ts_specs, rollout_specs, P(meshlib.DATA_AXIS),
                      P(), P(), P(), P()),
            out_specs=(ts_specs, P()),
            check_vma=False,
        )
        return sharded_update(train_state, rollout, bootstrap, lr, eps, beta, key)

    def place_on_mesh(self, env_state, obs, actor_carry):
        """Shard env-batch arrays on 'data' (leading dim a multiple of E_local),
        replicate everything else (e.g. the env PRNG key); replicate params."""
        data = meshlib.batch_sharding(self.mesh)
        rep = meshlib.replicated_sharding(self.mesh)
        E = self.num_envs

        def place(x):
            if getattr(x, "ndim", 0) >= 1 and x.shape[0] in (E, E * self.num_agents):
                return jax.device_put(x, data)
            return jax.device_put(x, rep)

        env_state = jax.tree_util.tree_map(place, env_state)
        obs = jax.device_put(obs, data)
        actor_carry = jax.tree_util.tree_map(place, actor_carry)
        self.train_state = meshlib.replicate_pytree(self.train_state, self.mesh)
        return env_state, obs, actor_carry

    def _train_iter_fn(self, train_state, env_state, obs, actor_carry, key,
                       lr, eps, beta):
        """rollout + update in ONE jitted program (the on-device
        actor-learner loop from SURVEY.md §2's north-star row)."""
        key, k_up = jax.random.split(key)
        env_state, obs, actor_carry, key, rollout, bootstrap, aux = \
            self._rollout_fn(train_state.params, env_state, obs, actor_carry, key)
        train_state, metrics = self._update_dispatch(
            train_state, rollout, bootstrap, lr, eps, beta, k_up
        )
        rollout_stats = {
            "rewards": rollout.rewards,        # (T, E)
            "dones": rollout.dones,            # (T, E)
            "completed_group": aux[2],         # (T, E)
            "mean_team_value": rollout.team_values.mean(),
        }
        return train_state, env_state, obs, actor_carry, key, metrics, rollout_stats

    # ──────────────────────────────────────────────────────────────
    #  outer loop
    # ──────────────────────────────────────────────────────────────

    def _schedules(self):
        # the reference evaluates schedules AFTER the rollout advanced
        # global_step (poca_trainer.py:372-382,525)
        s = self.global_step + self.cfg.horizon * self.num_envs * self.num_agents
        return (jnp.float32(self.lr_schedule(s)),
                jnp.float32(self.eps_schedule(s)),
                jnp.float32(self.beta_schedule(s)))

    def train_iteration(self, env_state, obs, actor_carry):
        """One rollout+update; returns (env_state, obs, carry, host_metrics)."""
        lr, eps, beta = self._schedules()
        if self._use_split_update:
            env_state, obs, actor_carry, metrics, stats = \
                self._train_iteration_split(env_state, obs, actor_carry,
                                            lr, eps, beta)
        else:
            (self.train_state, env_state, obs, actor_carry, self.key,
             metrics, stats) = self._train_iter_jit(
                self.train_state, env_state, obs, actor_carry, self.key,
                lr, eps, beta,
            )
        self.update_count += 1
        decisions = self.cfg.horizon * self.num_envs * self.num_agents
        self.global_step += decisions

        # Batch the device→host fetches: on the tunnelled TPU runtime each
        # blocking scalar read is a ~28 ms round trip, and this method
        # reads ~10 leaves per iteration (metrics scalars + episode-stat
        # arrays). Dispatching all copies async first overlaps the round
        # trips, so the block below pays ~one latency instead of ten.
        for leaf in (*metrics.values(), lr, eps, beta,
                     *jax.tree_util.tree_leaves(stats)):
            if (hasattr(leaf, "copy_to_host_async")
                    and getattr(leaf, "is_fully_addressable", True)):
                leaf.copy_to_host_async()

        host = {k: float(v) for k, v in metrics.items()}
        host["lr"], host["eps"], host["beta"] = float(lr), float(eps), float(beta)
        self._accumulate_episode_stats(stats)
        local_rewards = self._host_local(stats["rewards"])
        host["mean_rollout_reward"] = float(local_rewards.sum(0).mean())
        host["mean_step_reward"] = float(local_rewards.mean())
        host["mean_team_value"] = float(stats["mean_team_value"])
        self._rollout_reward_history.append(host["mean_rollout_reward"])
        if len(self._rollout_reward_history) > self._max_history:
            self._rollout_reward_history.pop(0)
        return env_state, obs, actor_carry, host

    @staticmethod
    def _host_local(x):
        """Fetch the host-addressable part of a (T, E) array.

        Single-process (or fully-replicated) arrays come back whole; under
        multi-process meshes each host gets ITS env-shard columns — episode
        accounting and TB metrics are host-local by design (multi-host
        aggregation would serialize every host's stats through one writer
        for no learning-relevant gain; the learner itself is all-reduced).
        """
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            shards = sorted(x.addressable_shards,
                            key=lambda s: s.index[-1].start or 0)
            return np.concatenate([np.asarray(s.data) for s in shards],
                                  axis=-1)
        return np.asarray(x)

    def _accumulate_episode_stats(self, stats):
        """Episode returns/lengths across auto-resets (poca_trainer.py:498-515)."""
        rewards = self._host_local(stats["rewards"])    # (T, E_local)
        dones = self._host_local(stats["dones"])
        completed = self._host_local(stats["completed_group"])
        if self._episode_reward_acc.shape[0] != rewards.shape[1]:
            # multi-process: this host accounts only its local env shard
            self._episode_reward_acc = np.zeros(rewards.shape[1])
            self._episode_step_count = np.zeros(rewards.shape[1])
        dp = self.cfg.decision_period
        for t in range(rewards.shape[0]):
            self._episode_reward_acc += rewards[t]
            self._episode_step_count += dp
            done_mask = dones[t] > 0.5
            if done_mask.any():
                self.completed_episode_returns.extend(
                    self._episode_reward_acc[done_mask].tolist())
                self.completed_episode_lengths.extend(
                    self._episode_step_count[done_mask].tolist())
                self.completed_group_rewards.extend(
                    completed[t][done_mask].tolist())
                self._episode_reward_acc[done_mask] = 0.0
                self._episode_step_count[done_mask] = 0.0

    def train(self, checkpointer=None, progress=True):
        """Full training loop with logging + checkpointing
        (poca_trainer.py:811-975)."""
        c = self.cfg
        key_reset, self.key = jax.random.split(self.key)
        env_state, obs = self.env.reset(key_reset)
        actor_carry = self.init_actor_carry() if self.recurrent else ()
        if self.mesh is not None:
            env_state, obs, actor_carry = self.place_on_mesh(
                env_state, obs, actor_carry)

        next_summary = c.summary_freq
        next_checkpoint = c.checkpoint_interval
        start = time.time()
        # optional jax.profiler capture of iterations 2-4 (skip the
        # compile-heavy first one) — set via scripts/train.py --profile
        profile_dir = getattr(self, "profile_dir", None)
        iteration = 0

        while self.global_step < c.total_timesteps:
            if profile_dir is not None and iteration == 1:
                jax.profiler.start_trace(profile_dir)
            t_iter = time.time()
            env_state, obs, actor_carry, m = self.train_iteration(
                env_state, obs, actor_carry)
            iter_dt = time.time() - t_iter
            iteration += 1
            if profile_dir is not None and iteration == 4:
                jax.profiler.stop_trace()
                print(f"[POCA] profiler trace → {profile_dir}", flush=True)
                profile_dir = None
            elapsed = time.time() - start
            # cumulative SPS (the reference's tqdm/TB number — includes
            # compile) plus the last-iteration instantaneous rate, which
            # is what wall-time-to-budget extrapolations should use
            sps = self.global_step / elapsed if elapsed > 0 else 0.0
            decisions = c.horizon * self.num_envs * self.num_agents
            sps_inst = decisions / iter_dt if iter_dt > 0 else 0.0

            if progress:
                print(f"[POCA] step={self.global_step:,} upd={self.update_count} "
                      f"pg={m['policy_loss']:.3f} vf={m['value_loss']:.3f} "
                      f"bl={m['baseline_loss']:.3f} ent={m['entropy']:.3f} "
                      f"SPS={sps:,.0f} (inst {sps_inst:,.0f})", flush=True)

            # numerics guard (SURVEY §5 "race detection / sanitizers" row):
            # a NaN loss means diverged training — stop at the iteration it
            # appears instead of burning the rest of the budget
            bad = [k for k in ("policy_loss", "value_loss", "baseline_loss")
                   if not np.isfinite(m[k])]
            if bad:
                msg = (f"non-finite {bad} at step {self.global_step:,} — "
                       "diverged")
                if checkpointer is not None:
                    # quarantined save for post-mortem: excluded from
                    # latest()/rotation so `--checkpoint latest` resumes
                    # from the last GOOD periodic checkpoint, not the
                    # diverged params
                    path = checkpointer.save(self, quarantine=True)
                    msg += (f"; diverged params quarantined at {path}, "
                            "resume from the last periodic checkpoint")
                raise FloatingPointError(msg)

            if self.writer is not None and self.global_step >= next_summary:
                next_summary += c.summary_freq
                self._write_summaries(m, sps)

            if checkpointer is not None and self.global_step >= next_checkpoint:
                next_checkpoint += c.checkpoint_interval
                checkpointer.save(self)

        if profile_dir is not None and iteration >= 2:
            # run ended before iteration 4 — close the trace so it's written
            jax.profiler.stop_trace()
            print(f"[POCA] profiler trace → {profile_dir}", flush=True)

        if checkpointer is not None:
            checkpointer.save(self, final=True)
        if self.writer is not None:
            self.writer.flush()
        return env_state, obs

    def _write_summaries(self, m, sps):
        """ML-Agents-exact TensorBoard tags (poca_trainer.py:861-958)."""
        w, s = self.writer, self.global_step
        w.add_scalar("Losses/Policy Loss", m["policy_loss"], s)
        w.add_scalar("Losses/Value Loss", m["value_loss"], s)
        w.add_scalar("Losses/POCA/Baseline Loss", m["baseline_loss"], s)
        w.add_scalar("Policy/Entropy", m["entropy"], s)
        w.add_scalar("Policy/Learning Rate", m["lr"], s)
        w.add_scalar("Policy/Epsilon", m["eps"], s)
        w.add_scalar("Policy/Beta", m["beta"], s)
        w.add_scalar("Policy/Extrinsic Reward", m["mean_step_reward"], s)
        w.add_scalar("Policy/Extrinsic Value Estimate", m["mean_team_value"], s)
        if not self.discrete:
            log_std = np.asarray(self.train_state.params["actor"]["log_std"])
            for d in range(log_std.shape[-1]):
                w.add_scalar(f"Policy/Std dim{d}", float(np.exp(log_std[0, d])), s)
            w.add_scalar("Policy/Log Std Mean", float(log_std.mean()), s)
        if self.completed_episode_returns:
            ep = self.completed_episode_returns
            w.add_scalar("Environment/Cumulative Reward", sum(ep) / len(ep), s)
            self.completed_episode_returns.clear()
        if self.completed_episode_lengths:
            el = self.completed_episode_lengths
            w.add_scalar("Environment/Episode Length", sum(el) / len(el), s)
            self.completed_episode_lengths.clear()
        w.add_scalar("Extra/SPS", sps, s)
        w.add_scalar("Extra/Mean Rollout Reward", m["mean_rollout_reward"], s)
        hist = self._rollout_reward_history
        w.add_scalar("Extra/Rolling Avg Rollout Reward", sum(hist) / len(hist), s)
        w.add_scalar("Extra/Mean Abs Advantage", m["mean_abs_advantage"], s)
        if self.completed_group_rewards:
            gr = self.completed_group_rewards
            w.add_scalar("Extra/Group Reward Mean", sum(gr) / len(gr), s)
            self.completed_group_rewards.clear()

    # ── checkpoint metadata (play.py rebuild contract,
    #    poca_trainer.py:981-999) ─────────────────────────────────
    def checkpoint_metadata(self) -> dict:
        c = self.cfg
        return {
            "hidden_dim": c.hidden_dim,
            "num_layers": c.num_layers,
            "recurrent": self.recurrent,
            "memory_size": c.memory_size if self.recurrent else 0,
            "sequence_length": c.sequence_length if self.recurrent else 0,
            "discrete": self.discrete,
            "num_actions": self.num_actions if self.discrete else 0,
            "act_dim": self.act_dim,
            "state_dim": self.STATE_DIM,
            "obs_dim": self.obs_dim,
            "variant": self.env.cfg.variant,
        }
