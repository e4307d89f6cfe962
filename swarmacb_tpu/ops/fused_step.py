"""Fully-fused Pallas TPU kernel: ONE program per env control tick.

Round 3's profile of the bench step (BENCH_NOTES.md) showed the fused
sensor kernel (ops/pairwise.py) at ~59% of step time with the remaining
~40% spread over ~10 small XLA fusions — behaviours, integration, three
collision passes, reward, reset folding — plus the (E, N) ↔ (N, E)
layout transposes around each kernel call. This module fuses the ENTIRE
step (SURVEY.md §3.2 ordering contract) into a single arena-on-lanes
Pallas program, so per step the only HBM traffic is the state tiles in
and out, and the only work outside the kernel is the jax.random draws:

  [discrete] sensors (pre-step poses) → behaviour dispatch (3 avoidance
  state machines) → differential-drive integrate + yaw wrap → wall
  push-out (12 faces) → gate-wall clamp → robot push-out (N²) →
  colour-transition team reward → time-limit done → folded auto-reset;
  observations reuse the pre-step sensor block (the reference's stale
  sensor-cache contract, directional_gate_env.py:495-504,657-662).

  [continuous] integrate from input wheels first, sensors once on the
  post-reset poses for fresh observations (directional_gate_env.py
  :512-525,650-692).

Layout — arena-on-lanes like ops/pairwise.py: every tile is (R, 128)
with robots on sublanes and 128 arenas on lanes; per-arena scalars
(step count, rewards, done) are (1, 128) tiles. The caller keeps the
whole env state in this layout across a lax.scan (env/lanes.py), so no
transposes happen inside the scan at all.

Numerics mode (same contract as ops/pairwise.py, tolerance-level vs the
jnp path, validated by parity tests + full-budget training):
  * Mosaic has no atan2 lowering, so every angle consumer is rewritten
    in terms of vector components: the |angle| ≤ π/2 obstacle test is a
    half-plane test (sum_x ≥ 0), the turn direction is sign(sum_y), the
    wheels-from-vector hemisphere test (behavior_modules.py:50-90,
    angle < π after the [0,2π) shift) is (dy > 0) | (dy == 0 ∧ dx > 0),
    and cos(angle) terms are x·rsqrt(x²+y²) with one Newton–Raphson
    refinement (~1e-7 vs atan2+cos).
  * yaw wrap uses a branchless ±2π correction instead of the reference's
    atan2(sin, cos) round-trip (directional_gate_env.py:527-536) — the
    per-step |Δyaw| < 0.5 rad makes one correction exact.
All integer/boolean logic — state-machine counters and latches, colour
thresholds, reward counts (integers, exact in f32), done/reset — is
bit-identical to the jnp path given the same random draws, so behaviour
and episode accounting carry NO numerics drift; only positions/yaw do.

RNG: turn-duration and spawn draws are taken OUTSIDE the kernel from the
same explicit jax.random stream machinery as the jnp path and passed in
as tiles (env/lanes.py), so draw distribution and replay injection
(tests) are unchanged.
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


def check_atan2_band(scales=(0.01, 0.11, 0.73, 1.0, 2.3, 37.0),
                     max_ulp=2):
    """Guard against XLA atan2-lowering drift under the kernel's band.

    The kernel's obstacle-in-front test replicates the backend's f32
    ``|atan2(sy, sx)| ≤ π/2`` with the band predicate
    ``sx·2²⁴ > −|sy|`` (see _behavior_dispatch). That replication is an
    empirical property of the CURRENT lowering (f32(π/2) − atan(sx/sy)
    with round-to-nearest at the half-ULP boundary): measured on v5e,
    the atan2 test's first-accepted sx sits at b+{0,1,2} ULPs around the
    exact boundary b = −2⁻²⁴·|sy| (mantissa-dependent; the band predicate
    itself flips at exactly b+1), and b itself always REJECTS — which is
    what pins the kernel's strict ``>``. A toolchain upgrade that changes
    the lowering would move the transition outside that bracket or break
    its monotone half-ULP structure and silently re-open the int-state
    divergence the round-3 kernel had; this probe (seconds of device
    time) fails loudly instead. Wired into
    scripts/tpu_validate_fused_step.py and bench.py startup.

    Returns {scale: first_accept_ulp_offset}; raises RuntimeError on
    drift.
    """
    @jax.jit
    def accept(sy, sx):
        return jnp.abs(jnp.arctan2(sy, sx)) <= (math.pi * 0.5)

    offsets = {}
    for sy in scales:
        sy32 = np.float32(sy)
        b = np.float32(-(2.0 ** -24)) * sy32     # exact (power-of-two scale)
        pts = []
        x = b
        for _ in range(3):
            x = np.nextafter(x, np.float32(-1))
            pts.insert(0, x)
        pts.append(b)
        x = b
        for _ in range(max_ulp + 2):
            x = np.nextafter(x, np.float32(1))
            pts.append(x)
        pts = np.asarray(pts, dtype=np.float32)
        got = np.asarray(accept(jnp.full(pts.shape, sy32), jnp.asarray(pts)))
        if not np.all(np.diff(got.astype(int)) >= 0):
            raise RuntimeError(
                f"atan2 band check: non-monotone accept pattern at "
                f"|sy|={sy}: {got.astype(int).tolist()} — XLA atan2 "
                "lowering changed; recalibrate ops/fused_step.py "
                "(scripts/tpu_calibrate_atan2_bands.py)")
        if got[3]:   # index 3 is the exact boundary b
            raise RuntimeError(
                f"atan2 band check: exact boundary −2⁻²⁴·|sy| ACCEPTED at "
                f"|sy|={sy} — the kernel's strict '>' no longer matches; "
                "recalibrate ops/fused_step.py")
        if not got.any():
            raise RuntimeError(
                f"atan2 band check: no acceptance within b+{max_ulp + 2} "
                f"ULPs at |sy|={sy} — lowering changed; recalibrate")
        off = int(np.argmax(got)) - 3
        if off < 0 or off > max_ulp:
            raise RuntimeError(
                f"atan2 band check: first accept at b{off:+d} ULPs at "
                f"|sy|={sy}, outside the calibrated [0, {max_ulp}] "
                "bracket — lowering changed; recalibrate")
        offsets[float(sy)] = off
    return offsets


def _nr_rsqrt(x):
    """Hardware rsqrt + one Newton–Raphson step → full f32 accuracy."""
    r0 = jax.lax.rsqrt(x)
    return r0 * (1.5 - 0.5 * x * r0 * r0)


def _sensor_block(px, py, cos_y, sin_y, *, N, prox_range, robot_radius,
                  rab_range, alpha_rab, segments, light_xy, light_threshold):
    """All sensors for one 128-arena block; returns a dict of tiles.

    Same math as ops/pairwise.py:_sensor_kernel (robot prox + wall
    raycast + RAB) plus the light sensor (epuck_sensors.py:290-348) and
    the vector-form prox/light aggregates the behaviour modules consume
    (epuck_sensors.py:128-136 without atan2 — see module docstring).
    """
    dx = px[None, :, :] - px[:, None, :]
    dy = py[None, :, :] - py[:, None, :]
    d2 = dx * dx + dy * dy

    # robot proximity + fused wall raycast (epuck_sensors.py:178-284)
    dist_p = jnp.sqrt(d2 + 1e-12)
    is_self = dist_p < 1e-4
    in_range_p = dist_p < (prox_range + robot_radius)
    reading_val = jnp.clip(1.0 - dist_p / (prox_range + robot_radius), 0.0, 1.0)

    cos_a = np.cos(EPUCK_SENSOR_ANGLES)
    sin_a = np.sin(EPUCK_SENSOR_ANGLES)
    inv_range = 1.0 / prox_range
    cone_rhs = 0.9659 * (dist_p + 1e-8)
    base_mask = in_range_p & ~is_self

    prox_vals = []
    light_vals = []
    lxr = light_xy[0] - px
    lyr = light_xy[1] - py
    ldist = jnp.sqrt(lxr * lxr + lyr * lyr + 1e-6)
    lint = 1.0 / ldist
    lnx = lxr / (ldist + 1e-8)
    lny = lyr / (ldist + 1e-8)

    for s in range(8):
        wdx = cos_a[s] * cos_y - sin_a[s] * sin_y
        wdy = cos_a[s] * sin_y + sin_a[s] * cos_y
        dot = wdx[:, None, :] * dx + wdy[:, None, :] * dy
        hit = base_mask & (dot > cone_rhs)
        reading = jnp.where(hit, reading_val, jnp.zeros_like(reading_val))
        out = reading.max(axis=1)
        for ax_s, ay_s, sx_s, sy_s in segments:
            denom = wdx * sy_s - wdy * sx_s
            valid = jnp.abs(denom) > 1e-8
            inv_denom = 1.0 / (denom + 1e-12)
            rel_x = ax_s - px
            rel_y = ay_s - py
            t = (rel_x * sy_s - rel_y * sx_s) * inv_denom
            u = (rel_x * wdy - rel_y * wdx) * inv_denom
            w_hit = valid & (t >= 0) & (t <= prox_range) & (u >= 0) & (u <= 1)
            w_read = jnp.where(w_hit, 1.0 - t * inv_range, 0.0)
            out = jnp.maximum(out, w_read)
        prox_vals.append(out)
        # light reading for the same sensor dir (epuck_sensors.py:310-329)
        ldot = jnp.clip(wdx * lnx + wdy * lny, 0.0, None)
        light_vals.append(jnp.clip(lint * ldot, 0.0, 1.0))

    # prox aggregate in vector form (epuck_sensors.py:128-136):
    # value = clip(|Σ v_s·dir_s|, ≤1); consumers get (value·cosθ,
    # value·sinθ) and the sign tests, never the angle itself
    psum_x = sum(v * float(c) for v, c in zip(prox_vals, cos_a))
    psum_y = sum(v * float(s_) for v, s_ in zip(prox_vals, sin_a))
    phyp2 = psum_x * psum_x + psum_y * psum_y
    pinv = _nr_rsqrt(phyp2 + 1e-12)
    pval = jnp.minimum(phyp2 * pinv, 1.0)            # = clip(hyp, max=1)
    pvx = pval * psum_x * pinv
    pvy = pval * psum_y * pinv

    lmax = light_vals[0]
    for v in light_vals[1:]:
        lmax = jnp.maximum(lmax, v)
    lsum_x = sum(v * float(c) for v, c in zip(light_vals, cos_a))
    lsum_y = sum(v * float(s_) for v, s_ in zip(light_vals, sin_a))
    linv = _nr_rsqrt(lsum_x * lsum_x + lsum_y * lsum_y + 1e-12)
    above = lmax > light_threshold
    zeros = jnp.zeros_like(lmax)
    lvx = jnp.where(above, lmax * lsum_x * linv, zeros)
    lvy = jnp.where(above, lmax * lsum_y * linv, zeros)

    # RAB (epuck_sensors.py:374-442) — as in ops/pairwise.py
    dist_r = jnp.sqrt(d2 + 1e-8)
    ii = jax.lax.broadcasted_iota(jnp.int32, (N, N, 1), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (N, N, 1), 1)
    not_self = ii != jj
    in_range_r = (dist_r < rab_range) & not_self
    in_f = in_range_r.astype(px.dtype)

    n_neighbors = in_f.sum(axis=1)
    ztilde = 1.0 - 2.0 / (1.0 + jnp.exp(n_neighbors))

    inv_dist = 1.0 / (dist_r + 1e-8)
    body_x = dx * cos_y[:, None, :] + dy * sin_y[:, None, :]
    body_y = -dx * sin_y[:, None, :] + dy * cos_y[:, None, :]
    inv_hyp = _nr_rsqrt(d2 + 1e-12)
    cos_b = body_x * inv_hyp
    sin_b = body_y * inv_hyp

    w_x = (inv_dist * cos_b * in_f).sum(axis=1)
    w_y = (inv_dist * sin_b * in_f).sum(axis=1)
    alpha_w = alpha_rab / (1.0 + dist_r)
    rab_x = (alpha_w * cos_b * in_f).sum(axis=1)
    rab_y = (alpha_w * sin_b * in_f).sum(axis=1)

    return dict(prox_vals=prox_vals, light_vals=light_vals,
                psum_x=psum_x, psum_y=psum_y, pval=pval, pvx=pvx, pvy=pvy,
                lvx=lvx, lvy=lvy, ztilde=ztilde, w_x=w_x, w_y=w_y,
                rab_x=rab_x, rab_y=rab_y)


def _wheels_from_vector(vx, vy, max_speed):
    """behavior_modules.py:50-90 without atan2: the [0,2π) front
    hemisphere (angle < π) is (vy > 0) | (vy == 0 ∧ vx > 0); cosθ is
    vx·rsqrt(vx²+vy²)."""
    near_zero = (jnp.abs(vx) < 1e-5) & (jnp.abs(vy) < 1e-5)
    inv = _nr_rsqrt(vx * vx + vy * vy + 1e-12)
    cos_t = vx * inv
    front = (vy > 0) | ((vy == 0) & (vx > 0))
    ones = jnp.ones_like(cos_t)
    left = jnp.where(front, cos_t, ones)
    right = jnp.where(front, ones, cos_t)
    max_val = jnp.maximum(jnp.maximum(jnp.abs(left), jnp.abs(right)), 1e-5)
    scale = max_speed / max_val
    zeros = jnp.zeros_like(cos_t)
    left = jnp.where(near_zero, zeros, left * scale)
    right = jnp.where(near_zero, zeros, right * scale)
    return left, right


def _steer(vx, vy, max_speed):
    """Forward fallback |v| < 0.1 → (1, 0), then wheel conversion
    (behavior_modules.py:423-429)."""
    small = (vx * vx + vy * vy) < 0.01          # mag < 0.1, squared
    vx = jnp.where(small, jnp.ones_like(vx), vx)
    vy = jnp.where(small, jnp.zeros_like(vy), vy)
    return _wheels_from_vector(vx, vy, max_speed)


def _behaviours(sb, mod, es, ek, ed, pa, pk, pd, aa, ak, ad,
                de, dp, da, *, max_speed, alpha, prox_threshold):
    """The 6 behaviour modules + 3 avoidance machines on lanes tiles —
    env/behaviors.py:dispatch re-expressed without atan2. Int latches and
    counters are exact; only the steering floats carry numerics mode."""
    pvx, pvy = sb["pvx"], sb["pvy"]
    # obstacle-in-front (behavior_modules.py:237-243): value ≥ thr and
    # |angle| ≤ π/2. The jnp path evaluates |atan2(sy, sx)| ≤ π/2 in f32,
    # and on TPU that test accepts a sliver of the sx < 0 half-plane:
    # XLA's atan2 near ±x→0 evaluates f32(π/2) − atan(x/y), so for
    # −x/|y| < 2⁻²⁴ (half-ULP of f32(π/2)) the result still rounds to
    # f32(π/2) and passes the ≤ comparison (measured transition at
    # ratio −5.96e−8 across 4 decades of |sy| — scale-invariant).
    # This matters systematically: a robot running parallel to a wall
    # reads equal values on symmetric sensor pairs whose cos components
    # cancel to an ~1e−9 residue, parking sum_x inside the band for many
    # consecutive steps. Replicate the band: accept iff
    # sx > −2⁻²⁴·|sy| (the ×2²⁴ is a power of two, so the comparison is
    # exact f32). Measured precision of the replication (round-5 probe,
    # check_atan2_band): the lowering's true first-accept sits at
    # b+{0,1,2} ULPs of sx around the exact boundary b (mantissa-
    # dependent rounding of the atan term), while this predicate flips
    # at exactly b+1 — i.e. band vs atan2 can disagree on single-ULP
    # slivers of sx at some |sy| mantissas; b itself always rejects,
    # which pins the strict '>'. check_atan2_band() guards that bracket
    # against XLA lowering changes at validator/bench startup. The
    # sx==sy==0 corner differs (atan2(0,0)=0 passes) but is unreachable
    # under the pval ≥ threshold gate.
    in_front = sb["psum_x"] * 16777216.0 > -jnp.abs(sb["psum_y"])
    obstacle = (sb["pval"] >= prox_threshold) & in_front
    # turn dir (behavior_modules.py:245-256): angle < 0 ⟺ sum_y < 0
    fones = jnp.ones_like(pvx)
    turn = jnp.where(sb["psum_y"] < 0, -fones, fones)
    ms = max_speed

    # exploration machine (env/behaviors.py:_exploration — trigger first,
    # THEN decrement)
    active0 = mod == 0
    walking = (es == 0) & active0
    trig0 = walking & obstacle
    ed = jnp.where(trig0, turn, ed)
    ek = jnp.where(trig0, de, ek)
    es = jnp.where(trig0, jnp.ones_like(es), es)
    avoiding0 = (es == 1) & active0
    ek = jnp.where(avoiding0, ek - 1, ek)
    done0 = avoiding0 & (ek <= 0)
    es = jnp.where(done0, jnp.zeros_like(es), es)
    is_avoid0 = (es == 1) & active0
    lv0 = jnp.where(is_avoid0, ed * ms, ms * fones)
    rv0 = jnp.where(is_avoid0, -ed * ms, ms * fones)

    def avoidance(av, st, dr, active, dur):
        # photo/antiphoto machine (env/behaviors.py:_avoidance_machine —
        # decrement first, THEN trigger)
        currently = (av != 0) & active
        st = jnp.where(currently, st - 1, st)
        fin = currently & (st <= 0)
        av = jnp.where(fin, jnp.zeros_like(av), av)
        trig = (av == 0) & active & obstacle
        dr = jnp.where(trig, turn, dr)
        st = jnp.where(trig, dur, st)
        av = jnp.where(trig, jnp.ones_like(av), av)
        return av, st, dr, (av != 0) & active

    def taxis(sign, dr, turning):
        vx = sign * sb["lvx"] - 0.5 * pvx
        vy = sign * sb["lvy"] - 0.5 * pvy
        lv_s, rv_s = _steer(vx, vy, ms)
        lv = jnp.where(turning, dr * ms, lv_s)
        rv = jnp.where(turning, -dr * ms, rv_s)
        return lv, rv

    pa, pk, pd, p_turn = avoidance(pa, pk, pd, mod == 2, dp)
    lv2, rv2 = taxis(1.0, pd, p_turn)
    aa, ak, ad, a_turn = avoidance(aa, ak, ad, mod == 3, da)
    lv3, rv3 = taxis(-1.0, ad, a_turn)

    lv4, rv4 = _steer(sb["rab_x"] - 0.6 * pvx, sb["rab_y"] - 0.6 * pvy, ms)
    lv5, rv5 = _steer(-alpha * sb["rab_x"] - 0.5 * pvx,
                      -alpha * sb["rab_y"] - 0.5 * pvy, ms)

    zeros = jnp.zeros_like(pvx)
    left = jnp.where(mod == 0, lv0, zeros)
    left = jnp.where(mod == 2, lv2, left)
    left = jnp.where(mod == 3, lv3, left)
    left = jnp.where(mod == 4, lv4, left)
    left = jnp.where(mod == 5, lv5, left)
    right = jnp.where(mod == 0, rv0, zeros)
    right = jnp.where(mod == 2, rv2, right)
    right = jnp.where(mod == 3, rv3, right)
    right = jnp.where(mod == 4, rv4, right)
    right = jnp.where(mod == 5, rv5, right)
    return left, right, es, ek, ed, pa, pk, pd, aa, ak, ad


def _ground(px, py, *, ni, corr_south, gate_south, corr_hw, gate_hw):
    """Ground colour scalar (env/sensors.py:ground_color)."""
    color = jnp.full_like(px, 0.5)
    ax = jnp.abs(px)
    in_gate = (ax < gate_hw) & (py > gate_south) & (py < corr_south)
    color = jnp.where(in_gate, jnp.ones_like(color), color)
    in_corr = (ax < corr_hw) & (py >= corr_south) & (py < ni)
    color = jnp.where(in_corr, jnp.zeros_like(color), color)
    return color


def _step_kernel(*refs, N, discrete, obs24, want_obs,
                 dt, wheelbase, max_speed, alpha, prox_threshold,
                 prox_range, robot_radius, rab_range, light_threshold,
                 light_xy, segments, faces, gate_hw, gate_south, wall_len,
                 ni, corr_south, corr_hw, gate_zone_hw, max_episode_length):
    sens = functools.partial(
        _sensor_block, N=N, prox_range=prox_range, robot_radius=robot_radius,
        rab_range=rab_range, alpha_rab=alpha, segments=segments,
        light_xy=light_xy, light_threshold=light_threshold)

    if discrete:
        (px_r, py_r, yaw_r, prev_r, mod_r, es_r, ek_r, ed_r, pa_r, pk_r,
         pd_r, aa_r, ak_r, ad_r, de_r, dp_r, da_r, sx_r, sy_r, sw_r,
         sc_r, er_r, cg_r) = refs[:23]
        out = refs[23:]
    else:
        (px_r, py_r, yaw_r, prev_r, l_r, r_r, sx_r, sy_r, sw_r,
         sc_r, er_r, cg_r) = refs[:12]
        out = refs[12:]

    px, py, yaw, prev = px_r[:], py_r[:], yaw_r[:], prev_r[:]
    cos_y = jnp.cos(yaw)
    sin_y = jnp.sin(yaw)

    if discrete:
        sb = sens(px, py, cos_y, sin_y)
        left, right, es, ek, ed, pa, pk, pd, aa, ak, ad = _behaviours(
            sb, mod_r[:], es_r[:], ek_r[:], ed_r[:], pa_r[:], pk_r[:],
            pd_r[:], aa_r[:], ak_r[:], ad_r[:], de_r[:], dp_r[:], da_r[:],
            max_speed=max_speed, alpha=alpha, prox_threshold=prox_threshold)
    else:
        left, right = l_r[:], r_r[:]

    # differential drive + branchless yaw wrap (env/physics.py:19-41;
    # per-step |Δyaw| ≤ 2·ms/wb·dt < 0.5 rad, so one ±2π suffices)
    v = 0.5 * (left + right)
    npx = px + v * cos_y * dt
    npy = py + v * sin_y * dt
    nyaw = yaw + (right - left) * (dt / wheelbase)
    two_pi = 2.0 * math.pi
    nyaw = jnp.where(nyaw > math.pi, nyaw - two_pi, nyaw)
    nyaw = jnp.where(nyaw < -math.pi, nyaw + two_pi, nyaw)

    # wall push-out, summed over the 12 faces (env/physics.py:44-60)
    push_x = jnp.zeros_like(npx)
    push_y = jnp.zeros_like(npy)
    for fnx, fny, fpx, fpy in faces:
        pen = robot_radius - ((npx - fpx) * fnx + (npy - fpy) * fny)
        pen = jnp.maximum(pen, 0.0)
        push_x += pen * fnx
        push_y += pen * fny
    npx = npx + push_x
    npy = npy + push_y

    # gate side-wall clamp (env/physics.py:63-99 — left first, right
    # reads the updated x)
    wall_top = gate_south + wall_len
    in_wall_y = (npy > gate_south) & (npy < wall_top)
    dx_l = npx + gate_hw
    near_l = (robot_radius - jnp.abs(dx_l) > 0) & in_wall_y & (npx < 0)
    sign_l = jnp.where(dx_l > 0, 1.0, -1.0)   # sign with 0 → −1 (ref)
    sign_l = jnp.where(dx_l < 0, -1.0, sign_l)
    npx = jnp.where(near_l, -gate_hw + sign_l * robot_radius, npx)
    dx_r = npx - gate_hw
    near_r = (robot_radius - jnp.abs(dx_r) > 0) & in_wall_y & (npx > 0)
    sign_r = jnp.where(dx_r < 0, -1.0, 1.0)   # sign with 0 → +1 (ref)
    npx = jnp.where(near_r, gate_hw + sign_r * robot_radius, npx)

    # robot push-out (env/physics.py:102-129 / ops/pairwise.py kernel)
    cdx = npx[:, None, :] - npx[None, :, :]
    cdy = npy[:, None, :] - npy[None, :, :]
    cdist = jnp.sqrt(cdx * cdx + cdy * cdy + 1e-8)
    ii = jax.lax.broadcasted_iota(jnp.int32, (N, N, 1), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (N, N, 1), 1)
    triu = (jj > ii).astype(npx.dtype)
    overlap = jnp.maximum(2.0 * robot_radius - cdist, 0.0) * triu
    cinv = 1.0 / (cdist + 1e-8)
    half_x = overlap * cdx * cinv * 0.5
    half_y = overlap * cdy * cinv * 0.5
    npx = npx + half_x.sum(axis=1) - half_x.sum(axis=0)
    npy = npy + half_y.sum(axis=1) - half_y.sum(axis=0)

    # colour-transition team reward (env/directional_gate.py:239-248);
    # counts are small integers — exact in f32 in any summation order
    gnd = functools.partial(_ground, ni=ni, corr_south=corr_south,
                            gate_south=gate_south, corr_hw=corr_hw,
                            gate_hw=gate_zone_hw)
    curr = gnd(npx, npy)
    b2w = ((prev < 0.25) & (curr > 0.75)).astype(npx.dtype)
    w2b = ((prev > 0.75) & (curr < 0.25)).astype(npx.dtype)
    reward = (b2w - w2b).sum(axis=0, keepdims=True)       # (1, 128)
    er = er_r[:] + reward

    # time-limit done + folded auto-reset (directional_gate_env.py:744-792)
    sc = sc_r[:] + 1
    done = sc >= (max_episode_length - 1)                  # (1, 128) bool
    dm = jnp.broadcast_to(done, (N, done.shape[1]))
    npx = jnp.where(dm, sx_r[:], npx)
    npy = jnp.where(dm, sy_r[:], npy)
    nyaw = jnp.where(dm, sw_r[:], nyaw)
    nprev = gnd(npx, npy)       # == where(done, ground(spawn), curr)
    cg = jnp.where(done, er, cg_r[:])
    er = jnp.where(done, jnp.zeros_like(er), er)
    sc = jnp.where(done, jnp.zeros_like(sc), sc)

    if not discrete:
        # fresh observations from the post-reset poses
        sb = sens(npx, npy, jnp.cos(nyaw), jnp.sin(nyaw))

    if discrete:
        zi = jnp.zeros_like(es)
        zf = jnp.zeros_like(ed)
        es = jnp.where(dm, zi, es)
        ek = jnp.where(dm, zi, ek)
        ed = jnp.where(dm, zf, ed)
        pa = jnp.where(dm, zi, pa)
        pk = jnp.where(dm, zi, pk)
        pd = jnp.where(dm, zf, pd)
        aa = jnp.where(dm, zi, aa)
        ak = jnp.where(dm, zi, ak)
        ad = jnp.where(dm, zf, ad)
        state_out = (npx, npy, nyaw, nprev, es, ek, ed, pa, pk, pd, aa, ak,
                     ad, sc, er, cg, reward, done.astype(jnp.int32))
    else:
        state_out = (npx, npy, nyaw, nprev, sc, er, cg, reward,
                     done.astype(jnp.int32))

    for ref, val in zip(out, state_out):
        ref[:] = val
    if want_obs:
        obs_refs = out[len(state_out):]
        if obs24:
            pv_ref, lv_ref, zt_ref, rp_ref = obs_refs
            for s in range(8):   # slice stores — no in-kernel concat
                pv_ref[s * N:(s + 1) * N, :] = sb["prox_vals"][s]
                lv_ref[s * N:(s + 1) * N, :] = sb["light_vals"][s]
            zt_ref[:] = sb["ztilde"]
            rc = np.cos(RAB_PROJ_ANGLES)
            rs = np.sin(RAB_PROJ_ANGLES)
            for k in range(4):
                rp_ref[k * N:(k + 1) * N, :] = (
                    sb["w_x"] * float(rc[k]) + sb["w_y"] * float(rs[k]))
        else:
            obs_refs[0][:] = sb["ztilde"]


def fused_env_step(lanes, actions, draws, spawn, cfg, wall_segments,
                   face_normals, face_points, *, want_obs=True,
                   interpret=None):
    """One fully-fused env step on an arena-on-lanes state.

    Args:
        lanes: dict of (R, Ep) tiles — px, py, yaw, prev (N, Ep) f32;
            for discrete variants also the 9 behaviour-machine tiles
            (i32/f32); sc (1, Ep) i32; er, cg (1, Ep) f32.
        actions: discrete → module ids (N, Ep) i32; continuous →
            (left, right) tuple of (N, Ep) f32 (already clamped/scaled).
        draws: discrete → (dur_e, dur_p, dur_a) (N, Ep) i32; continuous
            → ().
        spawn: (spawn_px, spawn_py, spawn_yaw) (N, Ep) f32.
        cfg: DirectionalGateEnvCfg (static).
        wall_segments / face_normals / face_points: env geometry arrays.
        want_obs: also emit the observation tiles.

    Returns (new_lanes, reward (1, Ep) f32, done (1, Ep) i32, obs_tiles)
    where obs_tiles is (prox (8N, Ep), light (8N, Ep), ztilde (N, Ep),
    rab_proj (4N, Ep)) for 24-dim variants, (ztilde,) for 4-dim ones
    (the ground channel is the returned ``prev`` tile), or () when
    ``want_obs`` is False.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N = cfg.num_agents
    Ep = lanes["px"].shape[1]
    assert Ep % LANES == 0, Ep
    discrete = cfg.discrete_actions
    obs24 = cfg.variant in ("dandelion", "daisy")

    seg = np.asarray(wall_segments, dtype=np.float64)
    segments = tuple(
        (float(a[0]), float(a[1]), float(a[2] - a[0]), float(a[3] - a[1]))
        for a in seg)
    faces = tuple(
        (float(n[0]), float(n[1]), float(p[0]), float(p[1]))
        for n, p in zip(np.asarray(face_normals), np.asarray(face_points)))

    kernel = functools.partial(
        _step_kernel, N=N, discrete=discrete, obs24=obs24, want_obs=want_obs,
        dt=cfg.dt, wheelbase=cfg.wheelbase, max_speed=cfg.max_wheel_speed,
        alpha=cfg.alpha_parameter, prox_threshold=cfg.prox_threshold,
        prox_range=cfg.prox_range, robot_radius=cfg.robot_radius,
        rab_range=cfg.rab_range, light_threshold=cfg.light_threshold,
        light_xy=(float(cfg.light_position[0]), float(cfg.light_position[1])),
        segments=segments, faces=faces,
        gate_hw=cfg.corridor_width / 2.0, gate_south=cfg.gate_south_y,
        wall_len=cfg.side_wall_length, ni=cfg.north_inradius,
        corr_south=cfg.corridor_south_y, corr_hw=cfg.corridor_width / 2.0,
        gate_zone_hw=cfg.gate_width / 2.0,
        max_episode_length=cfg.max_episode_length)

    f32, i32 = jnp.float32, jnp.int32

    def spec(rows):
        return pl.BlockSpec((rows, LANES), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def shape(rows, dtype):
        return jax.ShapeDtypeStruct((rows, Ep), dtype)

    if discrete:
        inputs = [lanes["px"], lanes["py"], lanes["yaw"], lanes["prev"],
                  actions,
                  lanes["es"], lanes["ek"], lanes["ed"],
                  lanes["pa"], lanes["pk"], lanes["pd"],
                  lanes["aa"], lanes["ak"], lanes["ad"],
                  draws[0], draws[1], draws[2],
                  spawn[0], spawn[1], spawn[2],
                  lanes["sc"], lanes["er"], lanes["cg"]]
        in_rows = [N] * 20 + [1, 1, 1]
        out_shapes = [shape(N, f32)] * 4 + [
            shape(N, i32), shape(N, i32), shape(N, f32),
            shape(N, i32), shape(N, i32), shape(N, f32),
            shape(N, i32), shape(N, i32), shape(N, f32),
            shape(1, i32), shape(1, f32), shape(1, f32),
            shape(1, f32), shape(1, i32)]
    else:
        inputs = [lanes["px"], lanes["py"], lanes["yaw"], lanes["prev"],
                  actions[0], actions[1],
                  spawn[0], spawn[1], spawn[2],
                  lanes["sc"], lanes["er"], lanes["cg"]]
        in_rows = [N] * 9 + [1, 1, 1]
        out_shapes = [shape(N, f32)] * 4 + [
            shape(1, i32), shape(1, f32), shape(1, f32),
            shape(1, f32), shape(1, i32)]
    if want_obs:
        if obs24:
            out_shapes += [shape(8 * N, f32), shape(8 * N, f32),
                           shape(N, f32), shape(4 * N, f32)]
        else:
            out_shapes += [shape(N, f32)]

    outs = pl.pallas_call(
        kernel,
        grid=(Ep // LANES,),
        in_specs=[spec(r) for r in in_rows],
        out_specs=tuple(spec(s.shape[0]) for s in out_shapes),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(*inputs)

    if discrete:
        (npx, npy, nyaw, nprev, es, ek, ed, pa, pk, pd, aa, ak, ad,
         sc, er, cg, reward, done) = outs[:18]
        obs_tiles = outs[18:]
        new_lanes = dict(px=npx, py=npy, yaw=nyaw, prev=nprev,
                         es=es, ek=ek, ed=ed, pa=pa, pk=pk, pd=pd,
                         aa=aa, ak=ak, ad=ad, sc=sc, er=er, cg=cg)
    else:
        npx, npy, nyaw, nprev, sc, er, cg, reward, done = outs[:9]
        obs_tiles = outs[9:]
        new_lanes = dict(px=npx, py=npy, yaw=nyaw, prev=nprev,
                         sc=sc, er=er, cg=cg)
    return new_lanes, reward, done, tuple(obs_tiles)
