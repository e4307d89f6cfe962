#!/usr/bin/env python3
"""Learner perf deep-dive: phase split, MFU, and all_baselines microbench.

Measures on the current backend (run on the TPU for real numbers):
  1. rollout-only and update-only wall time for a training iteration
     (the fused train program overlaps nothing — phases are additive),
  2. analytic matmul FLOPs of the update → MFU vs the v5e peak,
  3. the critic's counterfactual `all_baselines` fwd+bwd (the hot op,
     SURVEY §3.5) — current dedup layout vs the round-1 tiled-projection
     layout, at a real minibatch size.

Usage: python scripts/profile_update.py [--variant dandelion] [--num_envs 64]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

V5E_PEAK_FLOPS = 197e12  # bf16 MXU peak; f32 matmuls run the same pipeline
                         # at DEFAULT precision (one bf16 pass + f32 accum)


def mm_flops_update(cfg, E, N, obs_dim, act_dim_critic, discrete):
    """Matmul FLOPs per UPDATE (3 epochs fwd+bwd over the whole buffer)."""
    h, L = cfg.hidden_dim, cfg.num_layers
    A = 6 if discrete else 2
    per_agent_actor = 2 * (obs_dim * h + (L - 1) * h * h + h * A)
    # all_baselines per group (N agents): embeds + deduped QKV + attention
    # + fc_out + linear encoder (per counterfactual row)
    embeds = 2 * N * 2 * ((5 + act_dim_critic) * h)
    qkv = 2 * N * 3 * 2 * h * h
    attn = N * 4 * 2 * N * N * h // 2            # scores + out, all heads
    fc_out = N * N * 2 * h * h
    lenc = N * L * 2 * h * h
    critic_pass = N * 2 * (5 * h) + N * 3 * 2 * h * h // N + 4 * 2 * N * N * h // 2 \
        + 2 * h * h * L
    per_group_critic = embeds + qkv + attn + fc_out + lenc + critic_pass
    groups = cfg.horizon * E
    fwd = groups * (N * per_agent_actor + per_group_critic)
    return cfg.num_epochs * 3 * fwd               # bwd ≈ 2× fwd


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="dandelion")
    p.add_argument("--num_envs", type=int, default=64)
    p.add_argument("--horizon", type=int, default=100)
    p.add_argument("--hidden_dim", type=int, default=512)
    p.add_argument("--mb_groups", type=int, default=1024)
    p.add_argument("--platform", default=None)
    p.add_argument("--fused_tail", choices=("auto", "on", "off"),
                   default="auto",
                   help="baseline-tail Pallas kernel for the measured "
                        "trainer (auto = POCAConfig default: on on TPU)")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    fused_tail = {"auto": None, "on": True, "off": False}[args.fused_tail]

    from swarmacb_tpu.agents import POCAConfig, POCATrainer
    from swarmacb_tpu.config.env_cfg import DirectionalGateEnvCfg
    from swarmacb_tpu.env.directional_gate import DirectionalGateEnv

    E, N = args.num_envs, 20
    print(f"devices: {jax.devices()}")
    env = DirectionalGateEnv(DirectionalGateEnvCfg(
        variant=args.variant, num_envs=E, num_agents=N))
    cfg = POCAConfig(horizon=args.horizon, num_epochs=3, mini_batch_size=2048,
                     buffer_size_hint=20480, hidden_dim=args.hidden_dim,
                     num_layers=2, total_timesteps=10**9,
                     split_update_groups=0, fused_tail=fused_tail)
    tr = POCATrainer(env, cfg)
    print(f"fused_tail: {tr.critic.fused_tail}")
    key = jax.random.PRNGKey(0)
    env_state, obs = env.reset(key)

    # ── phase split ────────────────────────────────────────────────
    def timed(fn, *a, reps=3, **kw):
        out = jax.block_until_ready(fn(*a, **kw))   # compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(*a, **kw))
            best = min(best, time.perf_counter() - t0)
        return best, out

    # non-donating jits: the trainer's programs donate their inputs, which
    # can't be re-fed on repeated timed calls on TPU
    rollout_jit = jax.jit(tr._rollout_fn)
    update_jit = jax.jit(tr._update_fn)
    t_roll, roll_out = timed(rollout_jit, tr.train_state.params,
                             env_state, obs, (), key)
    env_state2, obs2, _, key2, rollout, bootstrap, aux = roll_out

    lr, eps, beta = tr._schedules()
    t_up, _ = timed(
        lambda: update_jit(tr.train_state, rollout, bootstrap, lr, eps,
                           beta, key2))
    decisions = cfg.horizon * E * N
    print(f"rollout: {t_roll*1e3:8.1f} ms  ({decisions/t_roll:,.0f} dec/s)")
    print(f"update : {t_up*1e3:8.1f} ms  ({decisions/t_up:,.0f} dec/s)")
    print(f"fused SPS estimate: {decisions/(t_roll+t_up):,.0f} dec/s")

    flops = mm_flops_update(cfg, E, N, env.obs_dim,
                            tr.act_dim_critic, tr.discrete)
    mfu = flops / t_up / V5E_PEAK_FLOPS
    print(f"update matmul FLOPs: {flops/1e12:.2f} TF → "
          f"{flops/t_up/1e12:.1f} TF/s → MFU {mfu*100:.1f}% of v5e peak")

    # ── all_baselines microbench: dedup vs round-1 tiled layout ────
    B = args.mb_groups
    states = jax.random.normal(jax.random.PRNGKey(1), (B, N, 5))
    actions = jax.random.normal(jax.random.PRNGKey(2),
                                (B, N, tr.act_dim_critic))
    critic = tr.critic
    cparams = tr.train_state.params["critic"]

    def old_all_baselines(mdl, all_states, all_actions):
        """Round-1 layout: LN+QKV computed on the (B·N, N, h) tile."""
        Bv, Nv, _ = all_states.shape
        obs_emb = mdl.obs_entity_enc(all_states)
        sa = jnp.concatenate([all_states, all_actions], axis=-1)
        act_emb = mdl.obs_act_entity_enc(sa)
        eye = jnp.eye(Nv, dtype=bool)[None, :, :, None]
        t_a = jnp.broadcast_to(act_emb[:, None], (Bv, Nv, Nv, mdl.hidden))
        t_s = jnp.broadcast_to(obs_emb[:, :, None], (Bv, Nv, Nv, mdl.hidden))
        ents = jnp.where(eye, t_s, t_a).reshape(Bv * Nv, Nv, mdl.hidden)
        return mdl._encode_and_value(ents, Nv).reshape(Bv, Nv)

    for name, method in (("dedup (current)", critic.all_baselines),
                         ("tiled (round 1)", old_all_baselines)):
        @jax.jit
        def fwd_bwd(p, method=method):
            def loss(p):
                return critic.apply({"params": p}, states, actions,
                                    method=method).mean()
            return jax.value_and_grad(loss)(p)

        t, (val, _) = timed(fwd_bwd, cparams)
        print(f"all_baselines fwd+bwd [{name}]: {t*1e3:8.2f} ms "
              f"at B={B} groups (val={float(val):.4f})")


if __name__ == "__main__":
    main()
