#!/usr/bin/env python3
"""On-TPU validation + micro-benchmark of the fully-fused counterfactual
attention kernel (ops/cf_attention.py) against both the pure-XLA
composition and the round-2 fused-tail pipeline (XLA scores/softmax +
ops/baseline_tail.py).

Run on the real chip (no flags needed — TPU is the default backend):

    python scripts/tpu_validate_cf_attention.py [--B 1600] [--reps 20]

Checks, in order:
 1. tiny-matmul health check (tunnel workers need it after a crash);
 2. forward parity kernel vs cf_reference at training shapes;
 3. gradient parity (all 9 cotangents), CPU-f32-refereed — the kernel
    must be no worse than the XLA path;
 4. fwd and fwd+bwd wall-time micro-bench of all three paths.

Exit code 0 = parity within tolerance; nonzero otherwise.
"""

from __future__ import annotations

import argparse
import math
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


NAMES = ("S_aa", "S_as", "S_sa", "S_ss", "wa", "dws", "x_a", "delta",
         "bias")


def tail_pipeline(S_aa, S_as, S_sa, S_ss, wa, dws, x_a, delta, bias, d):
    """The round-2 production path: XLA score assembly + softmax +
    transposes feeding the fused baseline-tail kernel.

    Deliberately a frozen copy of what networks.py::all_baselines shipped
    in round 2 (fused_tail branch), NOT an import — the point of this
    comparison lane is a stable historical baseline, so it must not track
    later production changes."""
    from swarmacb_tpu.ops.baseline_tail import fused_tail

    B, H, N, _ = S_aa.shape
    ii = jnp.arange(N)
    I_idx = ii[None, :, None, None, None]
    n_idx = ii[None, None, None, :, None]
    m_idx = ii[None, None, None, None, :]
    base = S_aa[:, None]
    row_I = jnp.transpose(S_sa, (0, 2, 1, 3))[:, :, :, None, :]
    col_I = jnp.transpose(S_as, (0, 3, 1, 2))[:, :, :, :, None]
    diag_I = jnp.transpose(S_ss[..., 0], (0, 2, 1))[:, :, :, None, None]
    scores = jnp.where(n_idx == I_idx, row_I, base)
    scores = jnp.where(m_idx == I_idx,
                       jnp.where(n_idx == I_idx, diag_I, col_I), scores)
    attn = jax.nn.softmax(scores / math.sqrt(d), axis=-1)
    lhs = jnp.transpose(attn, (0, 1, 3, 2, 4)).reshape(B, N * N, H * N)
    attn_mI = jnp.take_along_axis(attn, I_idx[..., :1],
                                  axis=-1)[..., 0].transpose(0, 2, 1, 3)
    h = wa.shape[-1]
    return fused_tail(lhs, attn_mI, wa.reshape(B, H * N, h), dws, x_a,
                      delta, bias, N, None)


def main():
    ap = argparse.ArgumentParser()
    # B=1600 groups = the real minibatch group count at E=16
    # (T·E / (buffer_size/batch_size) = 1000·16/10); N/H/h = daisy/lily
    ap.add_argument("--B", type=int, default=1600)
    ap.add_argument("--N", type=int, default=20)
    ap.add_argument("--H", type=int, default=4)
    ap.add_argument("--h", type=int, default=512)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (cpu for off-TPU smoke runs)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    log(f"[val] backend={jax.default_backend()} devices={jax.devices()}")
    x = jnp.ones((128, 128))
    jax.block_until_ready(x @ x)
    log("[val] health check ok")

    from swarmacb_tpu.ops.cf_attention import cf_reference, fused_cf_attention

    B, N, H, h = args.B, args.N, args.H, args.h
    d = h // H
    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    shapes = [(B, H, N, N), (B, H, N, N), (B, H, N, N), (B, H, N, 1),
              (B, H, N, h), (B, H, N, h), (B, N, h), (B, N, h), (h,)]
    # scores at trained-like magnitude (≈√d-scale q·k products)
    scale = [3.0, 3.0, 3.0, 3.0, 0.3, 0.2, 1.0, 0.5, 0.1]
    ins = [s * jax.random.normal(k, shp, jnp.float32)
           for k, shp, s in zip(ks, shapes, scale)]
    cot = jax.random.normal(ks[9], (B, N, h), jnp.float32)

    fused_f = jax.jit(lambda *a: fused_cf_attention(*a, d, None))
    ref_f = jax.jit(lambda *a: cf_reference(*a, d))
    tail_f = jax.jit(lambda *a: tail_pipeline(*a, d))

    t0 = time.perf_counter()
    out_fused = jax.block_until_ready(fused_f(*ins))
    log(f"[val] fused fwd compile+run {time.perf_counter()-t0:.1f}s")
    out_ref = jax.block_until_ready(ref_f(*ins))
    err = float(jnp.abs(out_fused - out_ref).max())
    log(f"[val] fwd max |Δ| = {err:.3e}")
    ok = err < 5e-4

    def loss(fn):
        def inner(*a):
            return (fn(*a, d) * cot).sum()
        return inner

    g_fused_f = jax.jit(jax.grad(
        lambda *a: (fused_cf_attention(*a, d, None) * cot).sum(),
        argnums=tuple(range(9))))
    g_ref_f = jax.jit(jax.grad(loss(cf_reference), argnums=tuple(range(9))))
    g_tail_f = jax.jit(jax.grad(loss(tail_pipeline), argnums=tuple(range(9))))
    t0 = time.perf_counter()
    g_fused = jax.block_until_ready(g_fused_f(*ins))
    log(f"[val] fused bwd compile+run {time.perf_counter()-t0:.1f}s")
    g_ref = jax.block_until_ready(g_ref_f(*ins))

    # Referee both TPU paths against a CPU f32 ground truth (TPU XLA
    # computes some transposed einsums at reduced precision — the same
    # methodology as scripts/tpu_validate_fused_tail.py). Criterion:
    # the kernel must be no worse than the XLA path.
    cpu = jax.local_devices(backend="cpu")[0]
    ins_cpu = [jax.device_put(v, cpu) for v in ins]
    with jax.default_device(cpu):
        g_cpu = jax.jit(jax.grad(loss(cf_reference),
                                 argnums=tuple(range(9))))(*ins_cpu)
    for name, a, b, c in zip(NAMES, g_fused, g_ref, g_cpu):
        c = np.asarray(c)
        scale_c = float(np.abs(c).max()) or 1.0
        d_kernel = float(np.abs(np.asarray(a) - c).max()) / scale_c
        d_xla = float(np.abs(np.asarray(b) - c).max()) / scale_c
        log(f"[val] grad {name:6s} vs CPU: kernel {d_kernel:.3e}  "
            f"xla {d_xla:.3e}")
        ok = ok and d_kernel <= max(2 * d_xla, 1e-4)

    def timeit(f, *a):
        jax.block_until_ready(f(*a))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            r = f(*a)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / args.reps

    for tag, fwd, bwd in (("cf-kernel", fused_f, g_fused_f),
                          ("xla      ", ref_f, g_ref_f),
                          ("tail-pipe", tail_f, g_tail_f)):
        t_f = timeit(fwd, *ins)
        t_b = timeit(bwd, *ins)
        log(f"[val] {tag}: fwd {t_f*1e3:7.2f} ms   fwd+bwd {t_b*1e3:7.2f} ms")

    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
