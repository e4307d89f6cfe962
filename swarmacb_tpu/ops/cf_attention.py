"""Fully-fused counterfactual attention for ``POCACritic.all_baselines``:
scores → softmax → value contraction → fc_out → residual → LayerNorm →
pool, in one Pallas TPU kernel (forward + custom-vjp backward).

Supersedes ops/baseline_tail.py (which fused only the fc/LN/pool tail and
still consumed a softmaxed, transposed (B, N², H·N) attention tensor from
XLA). The remaining HBM traffic there was the score pipeline itself: XLA
materializes the (B, I, H, n, m) score tensor, softmaxes it, transposes it
into the kernel layout, and walks all of that again in backward — several
(B·N²·H·N)-sized HBM round-trips per update.

This kernel removes the (B, I, H, n, m) expansion entirely, using the
structure of the counterfactual sets (poca_networks.py:583-635): for
counterfactual agent I, the score row of agent n differs from the shared
"all-actions" base row in EXACTLY ONE element,

    row n ≠ I : S_aa[n, :] with element m=I replaced by S_as[n, I]
    row n = I : S_sa[I, :] with element m=I replaced by S_ss[I]

so softmax and the value contraction decompose into a base term plus a
rank-1 correction, computed per group block in VMEM:

    E_aa = exp(S_aa/√d − M),  Z_b[n] = Σ_m E_aa[n, m]
    num[n, :]   = Σ_m E_aa[n, m] · wa[m, :]            (one (N,N)@(N,h))
    zc[n, I]    = E_as[n, I] − E_aa[n, I]
    ctx_I[n, :] = (num[n] + zc[n,I]·wa[I] + E_as[n,I]·dws[I])
                  / (Z_b[n] + zc[n, I])                        (n ≠ I)

with the analogous one-matmul form for the n = I rows (E_sa base, E_ss
diagonal). The row maxes M are shared across counterfactuals (max of the
base row and its possible replacements — a valid softmax shift for every
I) and detached, exactly like jax.nn.softmax's stop_gradient(max).

Everything is laid out [n, I, h] — LayerNorm is per (I, n) row and the
pool averages over n, so no transposes are needed anywhere. Per-group
FLOPs drop ~4× vs the tail kernel's (N², H·N)@(H·N, h) matmul, and the
kernel inputs are the raw (B, H, N, N) score tensors (≈20× smaller than
the attention tile) plus the folded values.

Math is exact; only fp association differs from the XLA composition
(incremental Z = Z_b − E_aa + E_as vs a fresh row sum; shared vs per-row
max — both exact softmax shifts). Parity pinned in
tests/test_cf_attention.py, CPU-refereed like ops/baseline_tail.py.

Inputs (B groups, N agents, H heads, d = head dim, h hidden):
    S_aa, S_as, S_sa (B, H, N, N)  raw scores q_a·k_a, q_a·k_s, q_s·k_a
    S_ss (B, H, N, 1)              diagonal q_s·k_s
    wa, dws (B, H, N, h)           W_out-folded values: v_a·W, (v_s−v_a)·W
    x_a, delta (B, N, h)           residual entities: x_a and (x_s − x_a)
    bias (h,)                      fc_out bias
Output: pooled (B, N, h).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .baseline_tail import (LN_EPS, _bias_block, _block, _eye_mask,
                            _ln_stats, _on_tpu)


# ──────────────────────────────────────────────────────────────────────
#  shared in-kernel math (per single group g, per head)
# ──────────────────────────────────────────────────────────────────────

def _head_terms(Saa, Sas, Ssa, Sss, scale):
    """Shared exponentials for one head: base/replacement numerators and
    partition terms, with detached shared row maxes."""
    Paa, Pas, Psa = Saa * scale, Sas * scale, Ssa * scale
    Pss = Sss * scale                                      # (N, 1)
    # off-diagonal rows (n ≠ I): base row P_aa[n,:], replacement P_as[n,I]
    M = jnp.maximum(Paa.max(axis=-1, keepdims=True),
                    Pas.max(axis=-1, keepdims=True))       # (N, 1)
    Eaa = jnp.exp(Paa - M)
    Eas = jnp.exp(Pas - M)
    Zb = Eaa.sum(axis=-1, keepdims=True)                   # (N, 1)
    zc = Eas - Eaa                                         # (N, N) [n, I]
    Z = Zb + zc                                            # (N, N) [n, I]
    # diagonal rows (n = I): base row P_sa[I,:], replacement P_ss[I]
    M2 = jnp.maximum(Psa.max(axis=-1, keepdims=True), Pss)  # (N, 1)
    Esa = jnp.exp(Psa - M2)
    Ess = jnp.exp(Pss - M2)                                # (N, 1)
    diag_Esa = (Esa * _eye_mask2(Esa.shape[0])).sum(axis=-1, keepdims=True)
    zc2 = Ess - diag_Esa                                   # (N, 1)
    Z2 = Esa.sum(axis=-1, keepdims=True) + zc2             # (N, 1)
    return Eaa, Eas, zc, Z, Esa, Ess, zc2, Z2


def _eye_mask2(N):
    ii = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    return (ii == jj).astype(jnp.float32)


def _matmul(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _ctx_terms(Eaa, Eas, zc, Z, Esa, Ess, zc2, Z2, wa_h, dws_h):
    """Per-head context rows in [n, I, h] layout (diag rows included)."""
    num = _matmul(Eaa, wa_h)                               # (N, h)
    ctx = (num[:, None, :]
           + zc[:, :, None] * wa_h[None, :, :]
           + Eas[:, :, None] * dws_h[None, :, :]) / Z[:, :, None]
    num2 = _matmul(Esa, wa_h)                              # (N, h), row I
    ctx2 = (num2 + zc2 * wa_h + Ess * dws_h) / Z2          # (N, h)
    return num, ctx, num2, ctx2


def _fc_group(S_aa_g, S_as_g, S_sa_g, S_ss_g, wa_g, dws_g, xa_g, delta_g,
              bias_row, *, N, H, scale):
    """fc (N·N, h) for one group in [n, I] row order, built in VMEM."""
    eye3 = _eye_mask(N)                                    # (N, N, 1)
    fc = None
    for hh in range(H):
        terms = _head_terms(S_aa_g[hh], S_as_g[hh], S_sa_g[hh], S_ss_g[hh],
                            scale)
        _, ctx, _, ctx2 = _ctx_terms(*terms, wa_g[hh], dws_g[hh])
        head_fc = jnp.where(eye3, ctx2[None, :, :], ctx)
        fc = head_fc if fc is None else fc + head_fc
    # residual: x_a[n] on every row, delta[I] on the diagonal n = I
    fc = fc + xa_g[:, None, :] + bias_row[None, :, :]
    fc = fc + jnp.where(eye3, delta_g[None, :, :], jnp.zeros_like(fc))
    return fc.reshape(N * N, -1)


# ──────────────────────────────────────────────────────────────────────
#  forward
# ──────────────────────────────────────────────────────────────────────

def _fwd_kernel(S_aa, S_as, S_sa, S_ss, wa, dws, xa, delta, bias, out,
                *, G, N, H, scale):
    bias_row = bias[:]                                     # (1, h)
    h = wa.shape[-1]
    for g in range(G):
        fc = _fc_group(S_aa[g], S_as[g], S_sa[g], S_ss[g], wa[g], dws[g],
                       xa[g], delta[g], bias_row, N=N, H=H, scale=scale)
        xc, rstd = _ln_stats(fc)
        y = xc * rstd
        # rows are [n, I]: pool averages over n for each I → axis 0
        out[g] = y.reshape(N, N, h).mean(axis=0)


# ──────────────────────────────────────────────────────────────────────
#  backward
# ──────────────────────────────────────────────────────────────────────

def _bwd_kernel(S_aa, S_as, S_sa, S_ss, wa, dws, xa, delta, bias, dout,
                dS_aa, dS_as, dS_sa, dS_ss, d_wa, d_dws, d_xa, d_delta,
                d_bias, *, G, N, H, scale):
    """Recompute fc; chain pool → LN → per-head softmax/value terms."""
    bias_row = bias[:]                                     # (1, h)
    h = wa.shape[-1]
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        d_bias[:] = jnp.zeros_like(d_bias)

    eye3 = _eye_mask(N)
    eye2 = _eye_mask2(N)
    off3 = 1.0 - eye2[:, :, None]
    acc_bias = jnp.zeros((1, h), dtype=jnp.float32)
    for g in range(G):
        fc = _fc_group(S_aa[g], S_as[g], S_sa[g], S_ss[g], wa[g], dws[g],
                       xa[g], delta[g], bias_row, N=N, H=H, scale=scale)
        xc, rstd = _ln_stats(fc)
        y = xc * rstd

        # pool bwd: every n row of counterfactual I gets dout[I]/N
        d_y = jnp.broadcast_to((dout[g] / N)[None, :, :],
                               (N, N, h)).reshape(N * N, h)
        m1 = d_y.mean(axis=-1, keepdims=True)
        m2 = (d_y * y).mean(axis=-1, keepdims=True)
        d_fc = (rstd * (d_y - m1 - y * m2)).reshape(N, N, h)  # [n, I, h]

        # residual grads
        d_xa[g] = d_fc.sum(axis=1)                         # Σ_I → per n
        d_diag = (d_fc * eye3).sum(axis=0)                 # (N, h) = d_fc[I,I]
        d_delta[g] = d_diag
        acc_bias = acc_bias + d_fc.reshape(N * N, h).sum(axis=0,
                                                         keepdims=True)

        d_off = d_fc * off3                                # n ≠ I rows
        for hh in range(H):
            terms = _head_terms(S_aa[g][hh], S_as[g][hh], S_sa[g][hh],
                                S_ss[g][hh], scale)
            Eaa, Eas, zc, Z, Esa, Ess, zc2, Z2 = terms
            wa_h, dws_h = wa[g][hh], dws[g][hh]
            num, ctx, num2, ctx2 = _ctx_terms(*terms, wa_h, dws_h)

            # ── off-diagonal rows ─────────────────────────────────
            dctxZ = d_off / Z[:, :, None]                  # (n, I, h)
            dZ = -(ctx * dctxZ).sum(axis=-1)               # (n, I)
            d_num = dctxZ.sum(axis=1)                      # (n, h)
            d_zc = (dctxZ * wa_h[None, :, :]).sum(axis=-1) + dZ
            d_Eas = (dctxZ * dws_h[None, :, :]).sum(axis=-1) + d_zc
            d_Eaa = -d_zc + dZ.sum(axis=1, keepdims=True)  # via zc and Z_b
            d_wa_h = (zc[:, :, None] * dctxZ).sum(axis=0)  # (I, h)
            d_dws_h = (Eas[:, :, None] * dctxZ).sum(axis=0)
            # num = E_aa @ wa_h
            d_Eaa = d_Eaa + jax.lax.dot_general(
                d_num, wa_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (n, m=I idx)
            d_wa_h = d_wa_h + jax.lax.dot_general(
                Eaa, d_num, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            # ── diagonal rows (n = I) ─────────────────────────────
            dU2 = d_diag / Z2                              # (N, h)
            dZ2 = -(ctx2 * dU2).sum(axis=-1, keepdims=True)  # (N, 1)
            d_num2 = dU2
            d_zc2 = (dU2 * wa_h).sum(axis=-1, keepdims=True) + dZ2
            d_Ess = (dU2 * dws_h).sum(axis=-1, keepdims=True) + d_zc2
            # Z2 row sum and num2 = E_sa @ wa_h; zc2 = E_ss − diag(E_sa)
            d_Esa = jnp.broadcast_to(dZ2, (N, N)) - eye2 * d_zc2
            d_Esa = d_Esa + jax.lax.dot_general(
                d_num2, wa_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            d_wa_h = d_wa_h + zc2 * dU2 + jax.lax.dot_general(
                Esa, d_num2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            d_dws_h = d_dws_h + Ess * dU2

            # exp chain (row maxes detached, as in jax.nn.softmax)
            dS_aa[g, hh] = Eaa * d_Eaa * scale
            dS_as[g, hh] = Eas * d_Eas * scale
            dS_sa[g, hh] = Esa * d_Esa * scale
            dS_ss[g, hh] = Ess * d_Ess * scale
            d_wa[g, hh] = d_wa_h
            d_dws[g, hh] = d_dws_h
    d_bias[:] = d_bias[:] + acc_bias


# ──────────────────────────────────────────────────────────────────────
#  custom_vjp wrapper
# ──────────────────────────────────────────────────────────────────────

@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def fused_cf_attention(S_aa, S_as, S_sa, S_ss, wa, dws, x_a, delta, bias,
                       d, interpret=None):
    """pooled (B, N, h) from raw scores + folded values (module docstring).
    ``d`` is the per-head dimension (softmax scale = 1/√d)."""
    out, _ = _cf_fwd(S_aa, S_as, S_sa, S_ss, wa, dws, x_a, delta, bias,
                     d, interpret)
    return out


def _pick_G(B, h, bwd=False):
    # Live VMEM per group ≈ fc + one (N, N, h) per-head temp chain; the
    # bwd kernel roughly doubles that (d_fc, dctxZ, ctx recompute).
    budget = 4 if h <= 256 else 2
    if bwd:
        budget = max(1, budget // 2)
    for g in range(budget, 0, -1):
        if B % g == 0:
            return g
    return 1


def _cf_fwd(S_aa, S_as, S_sa, S_ss, wa, dws, x_a, delta, bias, d,
            interpret):
    B, H, N, _ = S_aa.shape
    h = wa.shape[-1]
    if interpret is None:
        interpret = not _on_tpu()
    G = _pick_G(B, h)
    scale = 1.0 / math.sqrt(d)
    bias2 = bias.reshape(1, h)
    kernel = functools.partial(_fwd_kernel, G=G, N=N, H=H, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[_block(G, H, N, N), _block(G, H, N, N), _block(G, H, N, N),
                  _block(G, H, N, 1), _block(G, H, N, h), _block(G, H, N, h),
                  _block(G, N, h), _block(G, N, h), _bias_block(h)],
        out_specs=_block(G, N, h),
        out_shape=jax.ShapeDtypeStruct((B, N, h), jnp.float32),
        interpret=interpret,
    )(S_aa, S_as, S_sa, S_ss, wa, dws, x_a, delta, bias2)
    return out, (S_aa, S_as, S_sa, S_ss, wa, dws, x_a, delta, bias2)


def _cf_bwd(d, interpret, res, dout):
    S_aa, S_as, S_sa, S_ss, wa, dws, x_a, delta, bias2 = res
    B, H, N, _ = S_aa.shape
    h = wa.shape[-1]
    if interpret is None:
        interpret = not _on_tpu()
    G = _pick_G(B, h, bwd=True)
    scale = 1.0 / math.sqrt(d)
    kernel = functools.partial(_bwd_kernel, G=G, N=N, H=H, scale=scale)
    outs = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[_block(G, H, N, N), _block(G, H, N, N), _block(G, H, N, N),
                  _block(G, H, N, 1), _block(G, H, N, h), _block(G, H, N, h),
                  _block(G, N, h), _block(G, N, h), _bias_block(h),
                  _block(G, N, h)],
        out_specs=(_block(G, H, N, N), _block(G, H, N, N),
                   _block(G, H, N, N), _block(G, H, N, 1),
                   _block(G, H, N, h), _block(G, H, N, h),
                   _block(G, N, h), _block(G, N, h),
                   # d_bias: every grid step maps to the SAME block and
                   # accumulates (the TPU grid is sequential)
                   _bias_block(h)),
        out_shape=(jax.ShapeDtypeStruct((B, H, N, N), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, N, N), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, N, N), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, N, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, N, h), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, N, h), jnp.float32),
                   jax.ShapeDtypeStruct((B, N, h), jnp.float32),
                   jax.ShapeDtypeStruct((B, N, h), jnp.float32),
                   jax.ShapeDtypeStruct((1, h), jnp.float32)),
        interpret=interpret,
    )(S_aa, S_as, S_sa, S_ss, wa, dws, x_a, delta, bias2, dout)
    (dS_aa, dS_as, dS_sa, dS_ss, d_wa, d_dws, d_xa, d_delta, d_bias) = outs
    return (dS_aa, dS_as, dS_sa, dS_ss, d_wa, d_dws, d_xa, d_delta,
            d_bias.reshape(-1))


fused_cf_attention.defvjp(_cf_fwd, _cf_bwd)


# ──────────────────────────────────────────────────────────────────────
#  pure-XLA reference composition (parity target for the tests — the
#  assembled-scores math of the non-kernel POCACritic.all_baselines)
# ──────────────────────────────────────────────────────────────────────

def cf_reference(S_aa, S_as, S_sa, S_ss, wa, dws, x_a, delta, bias, d,
                 preferred=jnp.float32):
    """``preferred``: einsum accumulation dtype. The f32 default is the
    production numerics being pinned; pass jnp.float64 (under an x64
    scope) to use this composition as a true high-precision referee —
    with the default, f64 operands would silently truncate back to f32
    inside the contractions."""
    B, H, N, _ = S_aa.shape
    h = wa.shape[-1]
    ii = jnp.arange(N)
    I_idx = ii[None, :, None, None, None]
    n_idx = ii[None, None, None, :, None]
    m_idx = ii[None, None, None, None, :]
    base = S_aa[:, None]                                   # (B,1,H,n,m)
    row_I = jnp.transpose(S_sa, (0, 2, 1, 3))[:, :, :, None, :]
    col_I = jnp.transpose(S_as, (0, 3, 1, 2))[:, :, :, :, None]
    diag_I = jnp.transpose(S_ss[..., 0], (0, 2, 1))[:, :, :, None, None]
    scores = jnp.where(n_idx == I_idx, row_I, base)
    scores = jnp.where(m_idx == I_idx,
                       jnp.where(n_idx == I_idx, diag_I, col_I), scores)
    attn = jax.nn.softmax(scores / math.sqrt(d), axis=-1)  # (B,I,H,n,m)

    fc = jnp.einsum("bIhnm,bhmo->bIno", attn, wa,
                    preferred_element_type=preferred)
    attn_mI = jnp.take_along_axis(attn, I_idx[..., :1], axis=-1)[..., 0]
    fc = fc + jnp.einsum("bIhn,bhIo->bIno", attn_mI, dws,
                         preferred_element_type=preferred)
    fc = fc + bias + x_a[:, None, :, :]
    eye = (ii[:, None] == ii[None, :])[None, :, :, None]
    fc = fc + jnp.where(eye, delta[:, :, None, :], 0.0)
    flat = fc.reshape(B * N * N, h)
    mu = flat.mean(-1, keepdims=True)
    xc = flat - mu
    var = (xc * xc).mean(-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + LN_EPS)
    return y.reshape(B, N, N, h).mean(axis=2)
