#!/usr/bin/env python3
"""On-TPU validation + micro-benchmark of the fused baseline-tail kernel
(ops/baseline_tail.py) against the pure-XLA composition.

Run on the real chip (no flags needed — TPU is the default backend):

    python scripts/tpu_validate_fused_tail.py [--B 1600] [--reps 20]

Checks, in order:
 1. tiny-matmul health check (tunnel workers need it after a crash);
 2. forward parity fused vs tail_reference at training shapes;
 3. gradient parity (all 7 cotangents) fused vs XLA autodiff;
 4. fwd+bwd wall-time micro-bench of both paths.

Exit code 0 = parity within tolerance; nonzero otherwise.
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    # B=1600 groups = the real minibatch group count at E=16
    # (T·E / (buffer_size/batch_size) = 1000·16/10); N/H/h = daisy/lily
    ap.add_argument("--B", type=int, default=1600)
    ap.add_argument("--N", type=int, default=20)
    ap.add_argument("--H", type=int, default=4)
    ap.add_argument("--h", type=int, default=512)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    log(f"[val] backend={jax.default_backend()} devices={jax.devices()}")
    x = jnp.ones((128, 128))
    jax.block_until_ready(x @ x)
    log("[val] health check ok")

    from swarmacb_tpu.ops.baseline_tail import fused_tail, tail_reference

    B, N, H, h = args.B, args.N, args.H, args.h
    HM = H * N
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    shapes = [(B, N * N, HM), (B, H, N, N), (B, HM, h), (B, H, N, h),
              (B, N, h), (B, N, h), (h,)]
    scale = [1.0 / HM, 1.0 / N, 0.3, 0.2, 1.0, 0.5, 0.1]
    ins = [s * jax.random.normal(k, shp, jnp.float32)
           for k, shp, s in zip(ks, shapes, scale)]
    cot = jax.random.normal(ks[7], (B, N, h), jnp.float32)

    fused_f = jax.jit(lambda *a: fused_tail(*a, N, None))
    ref_f = jax.jit(lambda *a: tail_reference(*a, N))

    t0 = time.perf_counter()
    out_fused = jax.block_until_ready(fused_f(*ins))
    log(f"[val] fused fwd compile+run {time.perf_counter()-t0:.1f}s")
    out_ref = jax.block_until_ready(ref_f(*ins))
    err = float(jnp.abs(out_fused - out_ref).max())
    log(f"[val] fwd max |Δ| = {err:.3e}")
    ok = err < 5e-4

    def loss_fused(*a):
        return (fused_tail(*a, N, None) * cot).sum()

    def loss_ref(*a):
        return (tail_reference(*a, N) * cot).sum()

    g_fused_f = jax.jit(jax.grad(loss_fused, argnums=tuple(range(7))))
    g_ref_f = jax.jit(jax.grad(loss_ref, argnums=tuple(range(7))))
    t0 = time.perf_counter()
    g_fused = jax.block_until_ready(g_fused_f(*ins))
    log(f"[val] fused bwd compile+run {time.perf_counter()-t0:.1f}s")
    g_ref = jax.block_until_ready(g_ref_f(*ins))

    # Referee both TPU paths against a CPU f32 ground truth: TPU XLA
    # computes some einsum transposes at reduced precision, so comparing
    # kernel-vs-XLA alone mislabels the kernel (measured: the kernel's
    # attn_mI/dws cotangents are ~200x CLOSER to CPU than XLA's).
    # Criterion: the kernel must be no worse than the XLA path.
    cpu = jax.local_devices(backend="cpu")[0]
    ins_cpu = [jax.device_put(x, cpu) for x in ins]
    with jax.default_device(cpu):
        g_cpu = jax.jit(jax.grad(loss_ref, argnums=tuple(range(7))))(*ins_cpu)
    names = ("attn_lhs", "attn_mI", "wa", "dws", "x_a", "delta", "bias")
    for name, a, b, c in zip(names, g_fused, g_ref, g_cpu):
        c = np.asarray(c)
        scale_c = float(np.abs(c).max()) or 1.0
        d_kernel = float(np.abs(np.asarray(a) - c).max()) / scale_c
        d_xla = float(np.abs(np.asarray(b) - c).max()) / scale_c
        log(f"[val] grad {name:9s} vs CPU: kernel {d_kernel:.3e}  "
            f"xla {d_xla:.3e}")
        ok = ok and d_kernel <= max(2 * d_xla, 1e-4)

    def timeit(f, *a):
        jax.block_until_ready(f(*a))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            r = f(*a)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / args.reps

    t_fwd_fused = timeit(fused_f, *ins)
    t_fwd_ref = timeit(ref_f, *ins)
    t_bwd_fused = timeit(g_fused_f, *ins)
    t_bwd_ref = timeit(g_ref_f, *ins)
    log(f"[val] fwd: fused {t_fwd_fused*1e3:.2f} ms vs XLA {t_fwd_ref*1e3:.2f} ms"
        f" ({t_fwd_ref/t_fwd_fused:.2f}x)")
    log(f"[val] fwd+bwd grad: fused {t_bwd_fused*1e3:.2f} ms vs XLA "
        f"{t_bwd_ref*1e3:.2f} ms ({t_bwd_ref/t_bwd_fused:.2f}x)")

    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
