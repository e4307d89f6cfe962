#!/usr/bin/env python3
"""Interactive manual control — the de-facto sensor/physics test harness.

TPU-native counterpart of the reference's scripts/manual_control.py
(pygame, Isaac-free). The key difference: the reference maintained a
SECOND, duplicated environment (StandaloneDGTEnv, manual_control.py:65-369)
because its Isaac env wasn't importable standalone; here there is exactly
ONE world implementation — this script composes the same library functions
(sensors / behaviors / physics) the training env uses, with robot 0 driven
by the keyboard and the rest running a selectable behaviour module.

Controls:
    arrows / WASD   drive robot 0 (up/down = both wheels, left/right = turn)
    0-5             set behaviour module for the other robots
                    (0 explore, 1 stop, 2 photo, 3 anti-photo, 4 attract,
                     5 repel)
    R               reset episode
    ESC / window ×  quit

Headless smoke test:  SDL_VIDEODRIVER=dummy python scripts/manual_control.py
                      --smoke-frames 20
"""

from __future__ import annotations

import argparse
import math
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser(description="SwarmACB-TPU manual control")
    p.add_argument("--num_agents", type=int, default=20)
    p.add_argument("--smoke-frames", type=int, default=0,
                   help="run N frames without keyboard then exit (smoke test)")
    p.add_argument("--hz", type=float, default=10.0, help="control frequency")
    p.add_argument("--sim-hz", type=float, default=0.0,
                   help="physics sub-step frequency (reference "
                        "manual_control_isaac.py:49-52 runs sim at 60 Hz "
                        "while behaviours re-evaluate at the 10 Hz control "
                        "rate; 0 = no sub-stepping, one dt per control tick)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # interactive → CPU

    import jax.numpy as jnp
    import numpy as np
    import pygame

    from swarmacb_tpu.config.env_cfg import DirectionalGateEnvCfg
    from swarmacb_tpu.env import behaviors, physics, sensors
    from swarmacb_tpu.env.behaviors import BehaviorState
    from swarmacb_tpu.env.directional_gate import DirectionalGateEnv

    cfg = DirectionalGateEnvCfg(variant="daisy", num_envs=1,
                                num_agents=args.num_agents)
    env = DirectionalGateEnv(cfg)
    N = cfg.num_agents
    ms = cfg.max_wheel_speed
    # sim/control split (C21, manual_control_isaac.py:49-52,576,693):
    # sensors + behaviour dispatch run once per CONTROL tick, physics
    # integrates `substeps` finer steps of dt/substeps with the wheels
    # held — same net displacement, finer contact resolution, and
    # colour transitions (reward) counted per sim frame as Isaac does
    substeps = max(1, round(args.sim_hz / args.hz)) if args.sim_hz else 1
    dt_sub = cfg.dt / substeps

    # ── one mixed-control step: robot 0 keyboard, others module-driven ──
    def mixed_step(state, wheels0, module_id, key):
        cache = env._compute_sensor_block(state.pos, state.yaw)
        module_ids = jnp.full((1, N), module_id, dtype=jnp.int32)
        left, right, bstate = behaviors.dispatch(
            module_ids, state.behavior,
            cache["prox_value"], cache["prox_angle"],
            cache["light_value"], cache["light_angle"],
            cache["rab_x"], cache["rab_y"],
            key, ms, cfg.alpha_parameter, cfg.prox_threshold,
        )
        left = left.at[0, 0].set(wheels0[0])
        right = right.at[0, 0].set(wheels0[1])
        # lax.scan over substeps (not a Python loop): trace/compile time
        # stays constant in --sim-hz instead of inlining 3 collision
        # solves + ground sensing per substep into the program
        def _substep(carry, _):
            pos, yaw, prev, kp, km = carry
            pos, yaw = physics.integrate_and_wrap(pos, yaw, left, right,
                                                  cfg.wheelbase, dt_sub)
            pos = physics.resolve_wall_collisions(
                pos, env.face_normals, env.face_points, cfg.robot_radius)
            pos = physics.resolve_gate_wall_collisions(
                pos, cfg.robot_radius, cfg.corridor_width / 2.0,
                cfg.gate_south_y, cfg.side_wall_length)
            pos = physics.resolve_robot_collisions(pos, cfg.robot_radius)
            curr = sensors.ground_color(pos, cfg)
            kp += ((prev < 0.25) & (curr > 0.75)).astype(jnp.float32).sum()
            km += ((prev > 0.75) & (curr < 0.25)).astype(jnp.float32).sum()
            return (pos, yaw, curr, kp, km), None

        carry0 = (state.pos, state.yaw, state.prev_ground,
                  jnp.float32(0.0), jnp.float32(0.0))
        (pos, yaw, prev, kp, km), _ = jax.lax.scan(
            _substep, carry0, None, length=substeps)
        state = state.replace(pos=pos, yaw=yaw, prev_ground=prev,
                              behavior=bstate)
        return state, cache, kp, km

    mixed_step_jit = jax.jit(mixed_step)

    # ── pygame setup ─────────────────────────────────────────────
    pygame.init()
    W, H = 1100, 760
    screen = pygame.display.set_mode((W, H))
    pygame.display.set_caption("SwarmACB-TPU — Directional Gate manual control")
    font = pygame.font.SysFont("monospace", 14)
    clock = pygame.time.Clock()

    SCALE = 270.0
    CX, CY = 390, H // 2

    def w2s(x, y):
        return int(CX + x * SCALE), int(CY - y * SCALE)

    R = cfg.arena_circumradius
    verts = [w2s(R * math.cos(2 * math.pi * i / 12 + math.pi / 12),
                 R * math.sin(2 * math.pi * i / 12 + math.pi / 12))
             for i in range(12)]
    ni, cs, gs = cfg.north_inradius, cfg.corridor_south_y, cfg.gate_south_y
    ghw, chw = cfg.gate_width / 2, cfg.corridor_width / 2

    key0 = jax.random.PRNGKey(args.seed)
    key0, k_reset = jax.random.split(key0)
    state, _ = env.reset(k_reset)
    module_id = 0
    k_plus_total = k_minus_total = 0.0
    frame = 0
    mod_names = ["EXPLORE", "STOP", "PHOTO", "ANTI-PHOTO", "ATTRACT", "REPEL"]

    running = True
    while running:
        for ev in pygame.event.get():
            if ev.type == pygame.QUIT:
                running = False
            elif ev.type == pygame.KEYDOWN:
                if ev.key == pygame.K_ESCAPE:
                    running = False
                elif ev.key == pygame.K_r:
                    key0, k_reset = jax.random.split(key0)
                    state, _ = env.reset(k_reset)
                    k_plus_total = k_minus_total = 0.0
                elif pygame.K_0 <= ev.key <= pygame.K_5:
                    module_id = ev.key - pygame.K_0
                elif pygame.K_KP0 <= ev.key <= pygame.K_KP5:
                    module_id = ev.key - pygame.K_KP0

        keys = pygame.key.get_pressed()
        fwd = (keys[pygame.K_UP] or keys[pygame.K_w]) - (
            keys[pygame.K_DOWN] or keys[pygame.K_s])
        turn = (keys[pygame.K_RIGHT] or keys[pygame.K_d]) - (
            keys[pygame.K_LEFT] or keys[pygame.K_a])
        lw = ms * (fwd + 0.7 * turn)
        rw = ms * (fwd - 0.7 * turn)
        lw = max(-ms, min(ms, lw))
        rw = max(-ms, min(ms, rw))

        key0, k_step = jax.random.split(key0)
        state, cache, kp, km = mixed_step_jit(state, jnp.array([lw, rw]),
                                              module_id, k_step)
        k_plus_total += float(kp)
        k_minus_total += float(km)

        # ── draw ──────────────────────────────────────────────────
        screen.fill((60, 60, 60))
        # grey floor + zones
        pygame.draw.polygon(screen, (115, 115, 115), verts)
        gate_rect = (*w2s(-ghw, cs), int(2 * ghw * SCALE), int((cs - gs) * SCALE))
        pygame.draw.rect(screen, (240, 240, 240), gate_rect)
        corr_rect = (*w2s(-chw, ni), int(2 * chw * SCALE), int((ni - cs) * SCALE))
        pygame.draw.rect(screen, (20, 20, 20), corr_rect)
        pygame.draw.polygon(screen, (200, 180, 100), verts, 3)
        for sx in (-chw, chw):
            pygame.draw.line(screen, (220, 100, 50), w2s(sx, gs),
                             w2s(sx, gs + cfg.side_wall_length), 3)
        pygame.draw.circle(screen, (230, 40, 40), w2s(*env.light_pos), 9)

        pos = np.asarray(state.pos[0])
        yaw = np.asarray(state.yaw[0])
        for i in range(N):
            col = (90, 200, 90) if i == 0 else (80, 140, 220)
            cx, cy = w2s(pos[i, 0], pos[i, 1])
            pygame.draw.circle(screen, col, (cx, cy),
                               max(3, int(cfg.robot_radius * SCALE)))
            hx = pos[i, 0] + 1.6 * cfg.robot_radius * math.cos(yaw[i])
            hy = pos[i, 1] + 1.6 * cfg.robot_radius * math.sin(yaw[i])
            pygame.draw.line(screen, (255, 255, 120), (cx, cy), w2s(hx, hy), 2)

        # ── HUD (robot 0 sensors) ─────────────────────────────────
        hud_x = 790
        lines = [
            f"frame {frame}   module[others]: {module_id} {mod_names[module_id]}",
            f"wheels0: L={lw:+.3f} R={rw:+.3f}",
            f"K+ = {k_plus_total:.0f}   K- = {k_minus_total:.0f}   "
            f"r = {k_plus_total - k_minus_total:+.0f}",
            "",
            "prox[8]: " + " ".join(
                f"{v:.2f}" for v in np.asarray(cache['prox_vals'][0, 0])),
            f"prox agg: v={float(cache['prox_value'][0,0]):.3f} "
            f"a={float(cache['prox_angle'][0,0]):+.2f}",
            "light[8]: " + " ".join(
                f"{v:.2f}" for v in np.asarray(cache['light_vals'][0, 0])),
            f"light agg: v={float(cache['light_value'][0,0]):.3f} "
            f"a={float(cache['light_angle'][0,0]):+.2f}",
            f"ground: {float(state.prev_ground[0,0]):.1f}   "
            f"ztilde: {float(cache['ztilde'][0,0]):.3f}",
            "rab proj: " + " ".join(
                f"{v:+.2f}" for v in np.asarray(cache['rab_proj'][0, 0])),
            f"rab attr: ({float(cache['rab_x'][0,0]):+.2f}, "
            f"{float(cache['rab_y'][0,0]):+.2f})",
            "",
            "keys: arrows/WASD drive | 0-5 module | R reset | ESC quit",
        ]
        for i, line in enumerate(lines):
            screen.blit(font.render(line, True, (230, 230, 230)),
                        (hud_x, 30 + 18 * i))

        pygame.display.flip()
        clock.tick(args.hz)
        frame += 1
        if args.smoke_frames and frame >= args.smoke_frames:
            print(f"[manual_control] smoke OK: {frame} frames, "
                  f"K+={k_plus_total:.0f} K-={k_minus_total:.0f}")
            running = False

    pygame.quit()


if __name__ == "__main__":
    main()
