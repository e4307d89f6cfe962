#!/usr/bin/env python3
"""Evaluate a trained POCA policy — TPU-native counterpart of the
reference's scripts/play.py.

Rebuilds the actor purely from checkpoint metadata (hidden/layers/
recurrent/memory/discrete — reference play.py:114-143), rolls out episodes
with stochastic or deterministic actions (argmax for discrete, mean for
continuous), applies the same clamp(−3,3)/3 continuous preprocessing
(play.py:193), accounts per-env episodes with LSTM resets on done
(play.py:199-212), and prints mean/std/min/max/median returns
(play.py:215-223).

Usage:
    python scripts/play.py --checkpoint checkpoints/DirGate_tulip/poca_final \
        --num_episodes 10 [--deterministic]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser(description="SwarmACB-TPU POCA Evaluation")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="Checkpoint directory (orbax)")
    p.add_argument("--task", type=str, default="SwarmACB-DirectionalGate-v0")
    p.add_argument("--num_envs", type=int, default=5)
    p.add_argument("--num_episodes", type=int, default=10)
    p.add_argument("--deterministic", action="store_true",
                   help="argmax (discrete) / mean (continuous) actions")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--episode_length", type=float, default=None,
                   help="Override episode length in seconds (default: the "
                        "mission's 120 s; shorter is useful for smoke tests)")
    p.add_argument("--render", action="store_true",
                   help="pygame viewer of arena 0 while evaluating (the "
                        "TPU-native stand-in for the reference's Isaac "
                        "viewport playback, play.py:146-213 + the C24 "
                        "marker visuals, directional_gate_env.py:261-310)")
    p.add_argument("--hz", type=float, default=10.0,
                   help="render frame rate (with --render)")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from swarmacb_tpu.agents import Checkpointer
    from swarmacb_tpu.env import make_env
    from swarmacb_tpu.models import Actor, DiscreteActor, RecurrentDiscreteActor

    meta = Checkpointer.load_metadata(args.checkpoint)
    variant = meta.get("variant", "dandelion")
    overrides = {}
    if args.episode_length is not None:
        overrides["episode_length_s"] = args.episode_length
    env = make_env(args.task, variant=variant, num_envs=args.num_envs,
                   **overrides)
    E, N = env.num_envs, env.num_agents

    # ── rebuild actor from metadata ────────────────────────────────
    discrete = bool(meta["discrete"])
    recurrent = bool(meta["recurrent"])
    if recurrent:
        actor = RecurrentDiscreteActor(
            num_actions=meta["num_actions"], hidden=meta["hidden_dim"],
            num_layers=meta["num_layers"], memory=meta["memory_size"],
        )
        carry = (jnp.zeros((E * N, meta["memory_size"])),
                 jnp.zeros((E * N, meta["memory_size"])))
        abstract = actor.init(jax.random.PRNGKey(0),
                              jnp.zeros((2, meta["obs_dim"])),
                              (jnp.zeros((2, meta["memory_size"])),
                               jnp.zeros((2, meta["memory_size"]))),
                              method=actor.step)["params"]
    elif discrete:
        actor = DiscreteActor(num_actions=meta["num_actions"],
                              hidden=meta["hidden_dim"],
                              num_layers=meta["num_layers"])
        carry = ()
        abstract = actor.init(jax.random.PRNGKey(0),
                              jnp.zeros((2, meta["obs_dim"])))["params"]
    else:
        actor = Actor(act_dim=meta["act_dim"], hidden=meta["hidden_dim"],
                      num_layers=meta["num_layers"])
        carry = ()
        abstract = actor.init(jax.random.PRNGKey(0),
                              jnp.zeros((2, meta["obs_dim"])))["params"]

    # shapes come from the checkpoint's own metadata: restore_params builds
    # a restore target from it, pinned to a local device (cross-backend)
    del abstract
    params = Checkpointer.restore_params(args.checkpoint)
    actor_params = params["actor"]
    print(f"[play] restored {args.checkpoint}  variant={variant} "
          f"discrete={discrete} recurrent={recurrent}")

    @jax.jit
    def policy(obs, carry, key):
        flat = obs.reshape(E * N, meta["obs_dim"])
        if recurrent:
            logits, carry = actor.apply({"params": actor_params}, flat, carry,
                                        method=actor.step)
        elif discrete:
            logits = actor.apply({"params": actor_params}, flat)
        else:
            mu, std = actor.apply({"params": actor_params}, flat)
        if discrete:
            if args.deterministic:
                act = jnp.argmax(logits, axis=-1)
            else:
                act = jax.random.categorical(key, logits)
            env_actions = act.reshape(E, N).astype(jnp.int32)
        else:
            a = mu if args.deterministic else mu + std * jax.random.normal(key, mu.shape)
            env_actions = (jnp.clip(a, -3.0, 3.0) / 3.0).reshape(E, N, -1)
        return env_actions, carry

    # ── optional pygame viewer over arena 0 ───────────────────────
    draw = None
    if args.render:
        import math

        import pygame

        cfg = env.cfg
        pygame.init()
        W, H = 780, 760
        screen = pygame.display.set_mode((W, H))
        pygame.display.set_caption(f"SwarmACB-TPU — play {variant}")
        font = pygame.font.SysFont("monospace", 14)
        clock = pygame.time.Clock()
        SCALE, CX, CY = 270.0, W // 2, H // 2

        def w2s(x, y):
            return int(CX + x * SCALE), int(CY - y * SCALE)

        R0 = cfg.arena_circumradius
        verts = [w2s(R0 * math.cos(2 * math.pi * i / 12 + math.pi / 12),
                     R0 * math.sin(2 * math.pi * i / 12 + math.pi / 12))
                 for i in range(12)]
        ni, cs, gs = cfg.north_inradius, cfg.corridor_south_y, cfg.gate_south_y
        ghw, chw = cfg.gate_width / 2, cfg.corridor_width / 2

        def draw(state, step_i, ret0):
            for ev in pygame.event.get():
                if ev.type == pygame.QUIT or (
                        ev.type == pygame.KEYDOWN and ev.key == pygame.K_ESCAPE):
                    pygame.quit()
                    sys.exit(0)
            screen.fill((60, 60, 60))
            pygame.draw.polygon(screen, (115, 115, 115), verts)
            pygame.draw.rect(screen, (240, 240, 240),
                             (*w2s(-ghw, cs), int(2 * ghw * SCALE),
                              int((cs - gs) * SCALE)))
            pygame.draw.rect(screen, (20, 20, 20),
                             (*w2s(-chw, ni), int(2 * chw * SCALE),
                              int((ni - cs) * SCALE)))
            pygame.draw.polygon(screen, (200, 180, 100), verts, 3)
            for sx in (-chw, chw):
                pygame.draw.line(screen, (220, 100, 50), w2s(sx, gs),
                                 w2s(sx, gs + cfg.side_wall_length), 3)
            pygame.draw.circle(screen, (230, 40, 40), w2s(*env.light_pos), 9)
            pos = np.asarray(state.pos[0])
            yaw = np.asarray(state.yaw[0])
            for i in range(N):
                cx, cy = w2s(pos[i, 0], pos[i, 1])
                pygame.draw.circle(screen, (80, 140, 220), (cx, cy),
                                   max(3, int(cfg.robot_radius * SCALE)))
                hx = pos[i, 0] + 1.6 * cfg.robot_radius * math.cos(yaw[i])
                hy = pos[i, 1] + 1.6 * cfg.robot_radius * math.sin(yaw[i])
                pygame.draw.line(screen, (255, 255, 120), (cx, cy),
                                 w2s(hx, hy), 2)
            hud = (f"step {step_i}   ep return[env0] {ret0:+.0f}   "
                   f"episodes {len(returns)}/{args.num_episodes}")
            screen.blit(font.render(hud, True, (230, 230, 230)), (16, 12))
            pygame.display.flip()
            clock.tick(args.hz)

    key = jax.random.PRNGKey(args.seed)
    key, k_reset = jax.random.split(key)
    state, obs = env.reset(k_reset)
    step_jit = jax.jit(env.step)

    returns: list[float] = []
    lengths: list[float] = []
    ep_ret = np.zeros(E)
    ep_len = np.zeros(E)

    step_i = 0
    while len(returns) < args.num_episodes:
        key, k_act = jax.random.split(key)
        actions, carry = policy(obs, carry, k_act)
        state, ts = step_jit(state, actions)
        obs = ts.obs
        ep_ret += np.asarray(ts.reward)
        ep_len += 1
        step_i += 1
        if draw is not None:
            draw(state, step_i, ep_ret[0])
        done = np.asarray(ts.done)
        if done.any():
            returns.extend(ep_ret[done].tolist())
            lengths.extend(ep_len[done].tolist())
            ep_ret[done] = 0.0
            ep_len[done] = 0.0
            if recurrent:
                keep = jnp.asarray(~done, jnp.float32)[:, None].repeat(N, 1)
                keep = keep.reshape(E * N, 1)
                carry = (carry[0] * keep, carry[1] * keep)
            print(f"[play] {len(returns)}/{args.num_episodes} episodes", flush=True)

    r = np.asarray(returns[: args.num_episodes])
    print("\n── Evaluation results ─────────────────────────")
    print(f"  episodes : {len(r)}")
    print(f"  mean     : {r.mean():.3f}")
    print(f"  std      : {r.std():.3f}")
    print(f"  min      : {r.min():.3f}")
    print(f"  max      : {r.max():.3f}")
    print(f"  median   : {np.median(r):.3f}")
    print(f"  mean len : {np.asarray(lengths[: args.num_episodes]).mean():.1f}")


if __name__ == "__main__":
    main()
