"""Pallas TPU kernel for the counterfactual-attention TAIL of
``POCACritic.all_baselines`` — the only stage whose natural XLA form
materializes (B·N, N, h) tensors in HBM.

After round 2's assembled-scores + W_out-folding rewrites
(models/networks.py:all_baselines), the remaining hot chain per group is

    fc[I,n,:] = Σ_{h,m} attn[I,h,n,m]·wa[h,m,:]               (matmul)
              + Σ_h    attn_mI[I,h,n]·dws[h,I,:]              (rank-1)
              + bias + x_a[n,:] + δ_{n,I}·delta[I,:]          (residual)
    y    = LayerNorm_nonaffine(fc)       # per (I,n) row, eps 1e-5
    out[I,:] = mean_n y[I,n,:]           # average pool

XLA must write fc (840 MB at B=1024 groups, h=512) and re-read it for the
LayerNorm in forward AND backward — measured, that traffic is most of the
op's wall time. This kernel takes only the SMALL inputs (attention, the
W_out-folded values, the residual entities), builds fc in VMEM per group
block (MXU matmul + VPU rank-1/residual), applies LN + pool in-register,
and writes only the (N, h) pooled rows. The backward kernel recomputes fc
from the same small inputs (flash-attention-style) and emits exact
cotangents for every input — no tile-sized tensor in either direction.

Numerics: identical formulas in f32; only fp fusion order differs from
the XLA composition (parity pinned in tests/test_baseline_tail.py).
Interpret-mode fallback off-TPU, like ops/pairwise.py.

Inputs (B groups, N agents, H heads, h hidden, HM = H·N):
    attn_lhs (B, N², HM)  attention laid out (I·n, h·m)
    attn_mI  (B, H, N, N) attn[I,h,n,m=I] laid out [h, I, n] — head-major
                          so per-head slices are LEADING-axis (Mosaic
                          lowers mid-axis integer indexing to >2D gather,
                          which it rejects; leading-axis is a slice)
    wa       (B, HM, h)   W_out-folded "others" values (v_a·W_out)
    dws      (B, H, N, h) W_out-folded (v_s − v_a)
    x_a, delta (B, N, h)  residual entities: x_a and (x_s − x_a)
    bias     (h,)         fc_out bias
Output: pooled (B, N, h).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-5


def _on_tpu() -> bool:
    """Interpret-mode fallback for callers that force the kernel without
    passing ``interpret`` explicitly. Whether the kernel is used at all is
    decided by POCATrainer from the devices it actually runs on (its
    mesh's, if any) — this default-backend check only picks the execution
    mode once the kernel was already chosen."""
    return jax.default_backend() == "tpu"


# ──────────────────────────────────────────────────────────────────────
#  shared in-kernel math (per single group g)
# ──────────────────────────────────────────────────────────────────────

def _eye_mask(N):
    ii = jax.lax.broadcasted_iota(jnp.int32, (N, N, 1), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (N, N, 1), 1)
    return ii == jj


def _fc_rows(attn_lhs_g, attn_mI_g, wa_g, dws_g, xa_g, delta_g, bias_row,
             *, N, H, h):
    """fc (N², h) for one group, built entirely in VMEM."""
    fc = jax.lax.dot_general(
        attn_lhs_g, wa_g, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(N, N, h)
    # rank-1 diagonal value correction, per head (VPU broadcasts);
    # leading-axis [hh] slices only — mid-axis int indexing is a Mosaic
    # >2D gather and fails to lower
    for hh in range(H):
        fc = fc + attn_mI_g[hh][:, :, None] * dws_g[hh][:, None, :]
    # residual rows: x_a[n] everywhere, + delta[I] at the diagonal n == I
    fc = fc + xa_g[None, :, :] + bias_row[None, :, :]
    fc = fc + jnp.where(_eye_mask(N), delta_g[:, None, :],
                        jnp.zeros_like(fc))
    return fc.reshape(N * N, h)


def _ln_stats(fc):
    mu = fc.mean(axis=-1, keepdims=True)
    xc = fc - mu
    var = (xc * xc).mean(axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    return xc, rstd


# ──────────────────────────────────────────────────────────────────────
#  forward
# ──────────────────────────────────────────────────────────────────────

def _fwd_kernel(attn_lhs, attn_mI, wa, dws, xa, delta, bias, out,
                *, G, N, H, h):
    bias_row = bias[:]                      # (1, h)
    for g in range(G):
        fc = _fc_rows(attn_lhs[g], attn_mI[g], wa[g], dws[g], xa[g],
                      delta[g], bias_row, N=N, H=H, h=h)
        xc, rstd = _ln_stats(fc)
        y = xc * rstd
        out[g] = y.reshape(N, N, h).mean(axis=1)


# ──────────────────────────────────────────────────────────────────────
#  backward
# ──────────────────────────────────────────────────────────────────────

def _bwd_kernel(attn_lhs, attn_mI, wa, dws, xa, delta, bias, dout,
                d_attn_lhs, d_attn_mI, d_wa, d_dws, d_xa, d_delta, d_bias,
                *, G, N, H, h):
    """Recompute fc; chain pool → LN → (matmul, rank-1, residual)."""
    bias_row = bias[:]                      # (1, h)
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        d_bias[:] = jnp.zeros_like(d_bias)

    eye = _eye_mask(N)
    acc_bias = jnp.zeros((1, h), dtype=jnp.float32)
    for g in range(G):
        fc = _fc_rows(attn_lhs[g], attn_mI[g], wa[g], dws[g], xa[g],
                      delta[g], bias_row, N=N, H=H, h=h)
        xc, rstd = _ln_stats(fc)
        y = xc * rstd

        # pool bwd: every n row of group-row I gets dout[I]/N
        d_y = jnp.broadcast_to((dout[g] / N)[:, None, :],
                               (N, N, h)).reshape(N * N, h)
        # non-affine LN bwd: d_fc = rstd·(d_y − mean(d_y) − y·mean(d_y·y))
        m1 = d_y.mean(axis=-1, keepdims=True)
        m2 = (d_y * y).mean(axis=-1, keepdims=True)
        d_fc = rstd * (d_y - m1 - y * m2)                 # (N², h)

        d_attn_lhs[g] = jax.lax.dot_general(
            d_fc, wa[g], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (N², HM)
        d_wa[g] = jax.lax.dot_general(
            attn_lhs[g], d_fc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (HM, h)

        d_fc3 = d_fc.reshape(N, N, h)
        # rank-1 chain: d_attn_mI[h,I,n] = Σ_o d_fc[I,n,o]·dws[h,I,o]
        #               d_dws[h,I,o]     = Σ_n attn_mI[h,I,n]·d_fc[I,n,o]
        a_mI = attn_mI[g]
        for hh in range(H):
            d_attn_mI[g, hh] = (d_fc3 * dws[g][hh][:, None, :]).sum(-1)
            d_dws[g, hh] = (a_mI[hh][:, :, None] * d_fc3).sum(axis=1)
        d_xa[g] = d_fc3.sum(axis=0)                       # Σ_I
        d_delta[g] = jnp.where(eye, d_fc3, jnp.zeros_like(d_fc3)).sum(axis=1)
        acc_bias = acc_bias + d_fc.sum(axis=0, keepdims=True)
    d_bias[:] = d_bias[:] + acc_bias


# ──────────────────────────────────────────────────────────────────────
#  custom_vjp wrapper
# ──────────────────────────────────────────────────────────────────────

@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_tail(attn_lhs, attn_mI, wa, dws, x_a, delta, bias, N,
               interpret=None):
    """pooled (B, N, h) from the small tail inputs (module docstring)."""
    out, _ = _fused_tail_fwd(attn_lhs, attn_mI, wa, dws, x_a, delta, bias,
                             N, interpret)
    return out


def _block(G, *shape):
    return pl.BlockSpec((G,) + shape, lambda i: (i,) + (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _bias_block(h):
    return pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _pick_G(B, N, h, bwd=False):
    # Scoped VMEM (16M) bounds the block. Live state per group is
    # dominated by (N, N, h)-shaped blocks (fc, attn_lhs), so the group
    # budget scales inversely with N²·h. Measured anchor at N=20, h=512:
    # G=8 fwd needs 18.3M (exceeds scope), G=4 fits. The bwd kernel
    # holds ~2x the live state (fc recompute + d_fc + cotangent output
    # blocks), so it gets half the group count.
    budget = max(1, (4 * 20 * 20 * 512) // (N * N * h))
    if bwd:
        budget = max(1, budget // 2)
    for g in range(min(budget, B), 0, -1):
        if B % g == 0:
            return g
    return 1


def _fused_tail_fwd(attn_lhs, attn_mI, wa, dws, x_a, delta, bias, N,
                    interpret):
    B, NSQ, HM = attn_lhs.shape
    h = wa.shape[-1]
    H = HM // N
    if interpret is None:
        interpret = not _on_tpu()
    G = _pick_G(B, N, h)
    bias2 = bias.reshape(1, h)
    kernel = functools.partial(_fwd_kernel, G=G, N=N, H=H, h=h)
    out = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[_block(G, NSQ, HM), _block(G, H, N, N), _block(G, HM, h),
                  _block(G, H, N, h), _block(G, N, h), _block(G, N, h),
                  _bias_block(h)],
        out_specs=_block(G, N, h),
        out_shape=jax.ShapeDtypeStruct((B, N, h), jnp.float32),
        interpret=interpret,
    )(attn_lhs, attn_mI, wa, dws, x_a, delta, bias2)
    return out, (attn_lhs, attn_mI, wa, dws, x_a, delta, bias2)


def _fused_tail_bwd(N, interpret, res, dout):
    attn_lhs, attn_mI, wa, dws, x_a, delta, bias2 = res
    B, NSQ, HM = attn_lhs.shape
    h = wa.shape[-1]
    H = HM // N
    if interpret is None:
        interpret = not _on_tpu()
    G = _pick_G(B, N, h, bwd=True)
    kernel = functools.partial(_bwd_kernel, G=G, N=N, H=H, h=h)
    outs = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[_block(G, NSQ, HM), _block(G, H, N, N), _block(G, HM, h),
                  _block(G, H, N, h), _block(G, N, h), _block(G, N, h),
                  _bias_block(h), _block(G, N, h)],
        out_specs=(_block(G, NSQ, HM), _block(G, H, N, N), _block(G, HM, h),
                   _block(G, H, N, h), _block(G, N, h), _block(G, N, h),
                   # d_bias: every grid step maps to the SAME block and
                   # accumulates (the TPU grid is sequential)
                   _bias_block(h)),
        out_shape=(jax.ShapeDtypeStruct((B, NSQ, HM), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, N, N), jnp.float32),
                   jax.ShapeDtypeStruct((B, HM, h), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, N, h), jnp.float32),
                   jax.ShapeDtypeStruct((B, N, h), jnp.float32),
                   jax.ShapeDtypeStruct((B, N, h), jnp.float32),
                   jax.ShapeDtypeStruct((1, h), jnp.float32)),
        interpret=interpret,
    )(attn_lhs, attn_mI, wa, dws, x_a, delta, bias2, dout)
    d_attn_lhs, d_attn_mI, d_wa, d_dws, d_xa, d_delta, d_bias = outs
    return (d_attn_lhs, d_attn_mI, d_wa, d_dws, d_xa, d_delta,
            d_bias.reshape(-1))


fused_tail.defvjp(_fused_tail_fwd, _fused_tail_bwd)


# ──────────────────────────────────────────────────────────────────────
#  pure-XLA reference composition (parity target for the tests — matches
#  the non-kernel branch of POCACritic.all_baselines)
# ──────────────────────────────────────────────────────────────────────

def tail_reference(attn_lhs, attn_mI, wa, dws, x_a, delta, bias, N):
    B = attn_lhs.shape[0]
    h = wa.shape[-1]
    fc = jnp.einsum("bxm,bmo->bxo", attn_lhs, wa,
                    preferred_element_type=jnp.float32).reshape(B, N, N, h)
    fc = fc + jnp.einsum("bhIn,bhIo->bIno", attn_mI, dws,
                         preferred_element_type=jnp.float32)
    fc = fc + bias + x_a[:, None, :, :]
    ii = jnp.arange(N)
    eye = (ii[:, None] == ii[None, :])[None, :, :, None]
    fc = fc + jnp.where(eye, delta[:, :, None, :], 0.0)
    fc = fc.reshape(B * N * N, h)
    mu = fc.mean(-1, keepdims=True)
    xc = fc - mu
    var = (xc * xc).mean(-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + LN_EPS)
    return y.reshape(B, N, N, h).mean(axis=2)
