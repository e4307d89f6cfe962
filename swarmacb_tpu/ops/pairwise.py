"""Fused Pallas TPU kernel for the N² pairwise sensor pass.

The env's hot per-step work is three pairwise passes over the same robot
positions (SURVEY.md §3.1 "hot loops"): the 8-ray robot-proximity cone
test (epuck_sensors.py:238-284), the range-and-bearing sensor
(epuck_sensors.py:374-442), and (post-integration) the robot collision
push-out (directional_gate_env.py:612-644). This module fuses the two
*sensor* passes into one kernel that reads positions once, and provides a
second kernel for the collision pass.

Layout — **arena-on-lanes**: N=20 robots is tiny next to the 128-lane VPU
width, so instead of padding the robot axis we put the *arena* axis on
lanes: every value is an (R, 128)-shaped register tile where R indexes
robots/pairs and each lane is a different arena. One grid step processes
128 arenas; pairwise quantities are (N², 128) tiles. All N² math then runs
at full lane utilization regardless of N.

Semantics are identical to swarmacb_tpu.env.sensors (same formula order,
same epsilons) — verified by parity tests. Selected via
``DirectionalGateEnvCfg.use_pallas`` — the TPU DEFAULT since round 2
(``scripts/train.py --use_pallas auto`` turns it on whenever the backend
is a TPU); the jnp path remains the off-TPU default and the kernels fall
back to interpret mode when forced on elsewhere.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..env.geometry import EPUCK_SENSOR_ANGLES, RAB_PROJ_ANGLES

LANES = 128


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# ──────────────────────────────────────────────────────────────────────
#  Fused sensor kernel: robot proximity (8 rays) + RAB
# ──────────────────────────────────────────────────────────────────────

def _sensor_kernel(px_ref, py_ref, cy_ref, sy_ref,
                   prox_ref, zt_ref, proj_ref, ax_ref, ay_ref,
                   *, N, prox_range, robot_radius, rab_range, alpha_rab,
                   segments):
    px = px_ref[:]          # (N, 128) robot x per arena-lane
    py = py_ref[:]
    cos_y = cy_ref[:]       # (N, 128)
    sin_y = sy_ref[:]

    # pairwise offsets dx[i,j] = x_j − x_i → (N, N, 128)
    dx = px[None, :, :] - px[:, None, :]
    dy = py[None, :, :] - py[:, None, :]
    d2 = dx * dx + dy * dy

    # ── robot proximity (epuck_sensors.py:238-284) ────────────────
    dist_p = jnp.sqrt(d2 + 1e-12)
    is_self = dist_p < 1e-4
    in_range_p = dist_p < (prox_range + robot_radius)
    reading_val = jnp.clip(1.0 - dist_p / (prox_range + robot_radius), 0.0, 1.0)

    cos_a = np.cos(EPUCK_SENSOR_ANGLES)     # (8,) python consts
    sin_a = np.sin(EPUCK_SENSOR_ANGLES)
    inv_range = 1.0 / prox_range
    # cone test dot/(dist+1e-8) > 0.9659 rewritten as dot > 0.9659·(dist+1e-8)
    # — one shared rhs tile instead of a per-sensor N² multiply (the rhs is
    # positive, so the inequality is exactly equivalent in real arithmetic;
    # fp rounding can differ only within ~1 ulp of the 15° boundary)
    cone_rhs = 0.9659 * (dist_p + 1e-8)
    base_mask = in_range_p & ~is_self
    for s in range(8):
        # world-frame sensor dir for sensor s: (N, 128)
        wdx = cos_a[s] * cos_y - sin_a[s] * sin_y
        wdy = cos_a[s] * sin_y + sin_a[s] * cos_y
        dot = wdx[:, None, :] * dx + wdy[:, None, :] * dy
        hit = base_mask & (dot > cone_rhs)
        reading = jnp.where(hit, reading_val, jnp.zeros_like(reading_val))
        out = reading.max(axis=1)

        # ── wall raycast fused in (epuck_sensors.py:178-236): max over
        # the static segment list of (1 − t/range) for valid ray hits ──
        for ax_s, ay_s, sx_s, sy_s in segments:
            denom = wdx * sy_s - wdy * sx_s                  # (N, 128)
            valid = jnp.abs(denom) > 1e-8
            inv_denom = 1.0 / (denom + 1e-12)
            rel_x = ax_s - px
            rel_y = ay_s - py
            t = (rel_x * sy_s - rel_y * sx_s) * inv_denom
            u = (rel_x * wdy - rel_y * wdx) * inv_denom
            w_hit = valid & (t >= 0) & (t <= prox_range) & (u >= 0) & (u <= 1)
            w_read = jnp.where(w_hit, 1.0 - t * inv_range, 0.0)
            out = jnp.maximum(out, w_read)

        prox_ref[s * N:(s + 1) * N, :] = out

    # ── range-and-bearing (epuck_sensors.py:374-442) ──────────────
    dist_r = jnp.sqrt(d2 + 1e-8)
    # build the (N, N, 1) mask directly in 3D — Mosaic can't minor-dim
    # reshape i1 vectors
    ii = jax.lax.broadcasted_iota(jnp.int32, (N, N, 1), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (N, N, 1), 1)
    not_self = ii != jj
    in_range_r = (dist_r < rab_range) & not_self
    in_f = in_range_r.astype(px.dtype)

    n_neighbors = in_f.sum(axis=1)                       # (N, 128)
    zt_ref[:] = 1.0 - 2.0 / (1.0 + jnp.exp(n_neighbors))

    inv_dist = 1.0 / (dist_r + 1e-8)
    body_x = dx * cos_y[:, None, :] + dy * sin_y[:, None, :]
    body_y = -dx * sin_y[:, None, :] + dy * cos_y[:, None, :]
    # cos/sin of atan2(body_y, body_x) without atan2 (no Pallas lowering):
    # the body-frame rotation preserves the norm, so hypot² == d2 exactly;
    # the +1e-12 keeps self-pairs (d2=0) at cos=sin=0 instead of NaN —
    # they are masked by in_f anyway (atan2(0,0)=0 in the jnp path).
    # One Newton–Raphson step refines the TPU's ~12-bit hardware rsqrt to
    # full f32 (~1e-7), closing the bearing deviation vs the jnp path
    # (round-1 gap was ~4e-4 without it).
    h2 = d2 + 1e-12
    r0 = jax.lax.rsqrt(h2)
    inv_hyp = r0 * (1.5 - 0.5 * h2 * r0 * r0)
    cos_b = body_x * inv_hyp
    sin_b = body_y * inv_hyp

    w_x = (inv_dist * cos_b * in_f).sum(axis=1)          # (N, 128)
    w_y = (inv_dist * sin_b * in_f).sum(axis=1)
    rc = np.cos(RAB_PROJ_ANGLES)
    rs = np.sin(RAB_PROJ_ANGLES)
    for k in range(4):
        proj_ref[k * N:(k + 1) * N, :] = w_x * rc[k] + w_y * rs[k]

    alpha_w = alpha_rab / (1.0 + dist_r)
    ax_ref[:] = (alpha_w * cos_b * in_f).sum(axis=1)
    ay_ref[:] = (alpha_w * sin_b * in_f).sum(axis=1)


def pairwise_sensors(pos, yaw, *, prox_range, robot_radius, rab_range,
                     alpha_rab, wall_segments=None, interpret=None):
    """Fused robot-proximity + RAB pass, optionally with the wall raycast.

    Args:  pos (E, N, 2), yaw (E, N); wall_segments: optional static
    (S, 4) [ax, ay, bx, by] array — when given, the 8-ray wall raycast
    (epuck_sensors.py:178-236) is fused into the kernel and the returned
    prox already carries max(wall, robot) per sensor.
    Returns: prox (E, N, 8), ztilde (E, N), rab_proj (E, N, 4),
             rab_attr_x (E, N), rab_attr_y (E, N).
    """
    E, N = yaw.shape
    if interpret is None:
        interpret = not _on_tpu()
    segments = ()
    if wall_segments is not None:
        seg = np.asarray(wall_segments, dtype=np.float64)
        # python-float consts per segment: (ax, ay, sx, sy)
        segments = tuple(
            (float(a[0]), float(a[1]), float(a[2] - a[0]), float(a[3] - a[1]))
            for a in seg
        )

    # arena-on-lanes: (E, N) → (N, E), pad E to LANES multiple
    Ep = ((E + LANES - 1) // LANES) * LANES
    pad = Ep - E

    def to_lanes(x):  # (E, N) → (N, Ep); padded arena lanes are discarded
        x = jnp.transpose(x)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad)))
        return x

    px = to_lanes(pos[..., 0])
    py = to_lanes(pos[..., 1])
    cy = to_lanes(jnp.cos(yaw))
    sy = to_lanes(jnp.sin(yaw))

    grid = (Ep // LANES,)
    spec_n = pl.BlockSpec((N, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec_8n = pl.BlockSpec((8 * N, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec_4n = pl.BlockSpec((4 * N, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _sensor_kernel, N=N, prox_range=prox_range, robot_radius=robot_radius,
        rab_range=rab_range, alpha_rab=alpha_rab, segments=segments,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_n, spec_n, spec_n, spec_n],
        out_specs=(spec_8n, spec_n, spec_4n, spec_n, spec_n),
        out_shape=(
            jax.ShapeDtypeStruct((8 * N, Ep), pos.dtype),
            jax.ShapeDtypeStruct((N, Ep), pos.dtype),
            jax.ShapeDtypeStruct((4 * N, Ep), pos.dtype),
            jax.ShapeDtypeStruct((N, Ep), pos.dtype),
            jax.ShapeDtypeStruct((N, Ep), pos.dtype),
        ),
        interpret=interpret,
    )(px, py, cy, sy)
    prox_l, zt_l, proj_l, ax_l, ay_l = outs

    def from_lanes(x, lead):  # (lead*N, Ep) → (E, N, lead)
        x = x[:, :E]
        x = x.reshape(lead, N, E)
        return jnp.transpose(x, (2, 1, 0))

    robot_prox = from_lanes(prox_l, 8)
    ztilde = jnp.transpose(zt_l[:, :E])
    rab_proj = from_lanes(proj_l, 4)
    attr_x = jnp.transpose(ax_l[:, :E])
    attr_y = jnp.transpose(ay_l[:, :E])
    return robot_prox, ztilde, rab_proj, attr_x, attr_y


# ──────────────────────────────────────────────────────────────────────
#  Collision push-out kernel
# ──────────────────────────────────────────────────────────────────────

def _collision_kernel(px_ref, py_ref, ox_ref, oy_ref, *, N, robot_radius):
    px = px_ref[:]
    py = py_ref[:]
    dx = px[:, None, :] - px[None, :, :]   # x_i − x_j (note: i-major like ref)
    dy = py[:, None, :] - py[None, :, :]
    dist = jnp.sqrt(dx * dx + dy * dy + 1e-8)

    ii = jax.lax.broadcasted_iota(jnp.int32, (N, N, 1), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (N, N, 1), 1)
    triu = (jj > ii).astype(px.dtype)

    overlap = jnp.clip(2.0 * robot_radius - dist, 0.0, None) * triu
    inv = 1.0 / (dist + 1e-8)
    nx = dx * inv
    ny = dy * inv
    half_x = overlap * nx * 0.5
    half_y = overlap * ny * 0.5
    ox_ref[:] = px + half_x.sum(axis=1) - half_x.sum(axis=0)
    oy_ref[:] = py + half_y.sum(axis=1) - half_y.sum(axis=0)


def resolve_robot_collisions(pos, robot_radius, interpret=None):
    """Pallas version of physics.resolve_robot_collisions. pos (E, N, 2)."""
    E, N = pos.shape[:2]
    if interpret is None:
        interpret = not _on_tpu()
    Ep = ((E + LANES - 1) // LANES) * LANES
    pad = Ep - E

    def to_lanes(x):
        x = jnp.transpose(x)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad)))
        return x

    px = to_lanes(pos[..., 0])
    py = to_lanes(pos[..., 1])

    spec = pl.BlockSpec((N, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
    kernel = functools.partial(_collision_kernel, N=N, robot_radius=robot_radius)
    ox, oy = pl.pallas_call(
        kernel,
        grid=(Ep // LANES,),
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((N, Ep), pos.dtype),
                   jax.ShapeDtypeStruct((N, Ep), pos.dtype)),
        interpret=interpret,
    )(px, py)
    return jnp.stack([jnp.transpose(ox[:, :E]), jnp.transpose(oy[:, :E])], axis=-1)
