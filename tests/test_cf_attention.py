"""Parity tests for the fused counterfactual-attention kernel
(ops/cf_attention.py) against the pure-XLA assembled-scores composition,
in interpret mode (CPU). Hardware validation mirrors
scripts/tpu_validate_fused_tail.py."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode Pallas parity: minutes on a 1-core host

from swarmacb_tpu.ops.cf_attention import cf_reference, fused_cf_attention


def _inputs(key, B=4, H=2, N=6, h=64, d=16, score_scale=3.0):
    ks = jax.random.split(key, 9)
    # scores at trained-like magnitude (stress the incremental softmax)
    S_aa = jax.random.normal(ks[0], (B, H, N, N)) * score_scale
    S_as = jax.random.normal(ks[1], (B, H, N, N)) * score_scale
    S_sa = jax.random.normal(ks[2], (B, H, N, N)) * score_scale
    S_ss = jax.random.normal(ks[3], (B, H, N, 1)) * score_scale
    wa = jax.random.normal(ks[4], (B, H, N, h))
    dws = jax.random.normal(ks[5], (B, H, N, h))
    x_a = jax.random.normal(ks[6], (B, N, h))
    delta = jax.random.normal(ks[7], (B, N, h))
    bias = jax.random.normal(ks[8], (h,))
    return (S_aa, S_as, S_sa, S_ss, wa, dws, x_a, delta, bias), d


@pytest.mark.parametrize("shape", [dict(), dict(B=2, H=4, N=20, h=128, d=32),
                                   dict(B=3, N=5, score_scale=8.0)])
def test_forward_matches_reference(shape):
    args, d = _inputs(jax.random.PRNGKey(0), **shape)
    ref = cf_reference(*args, d)
    out = fused_cf_attention(*args, d, True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_reference():
    args, d = _inputs(jax.random.PRNGKey(1))
    probe = jax.random.normal(jax.random.PRNGKey(2), (4, 6, 64))

    def loss_ref(*a):
        return (cf_reference(*a, d) * probe).sum()

    def loss_ker(*a):
        return (fused_cf_attention(*a, d, True) * probe).sum()

    g_ref = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
    g_ker = jax.grad(loss_ker, argnums=tuple(range(9)))(*args)
    names = ["S_aa", "S_as", "S_sa", "S_ss", "wa", "dws", "x_a", "delta",
             "bias"]
    for name, a, b in zip(names, g_ref, g_ker):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5,
            err_msg=f"grad mismatch for {name}")


def test_gradients_match_large_scores():
    """Stress the shared-max / incremental-Z numerics with near-saturated
    softmax rows (one entry dominates — the cancellation-prone regime)."""
    args, d = _inputs(jax.random.PRNGKey(3), score_scale=12.0)
    probe = jax.random.normal(jax.random.PRNGKey(4), (4, 6, 64))
    g_ref = jax.grad(lambda *a: (cf_reference(*a, d) * probe).sum(),
                     argnums=(0, 1, 2, 3))(*args)
    g_ker = jax.grad(lambda *a: (fused_cf_attention(*a, d, True)
                                 * probe).sum(), argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(g_ref, g_ker):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


def test_odd_batch_blocking():
    """B with no divisor under the block budget still works (G falls to 1)."""
    args, d = _inputs(jax.random.PRNGKey(5), B=5)
    ref = cf_reference(*args, d)
    out = fused_cf_attention(*args, d, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_critic_fused_attention_matches_plain():
    """POCACritic.all_baselines with fused_attention=True (interpret mode
    off-TPU) must match the pure-XLA path: values and parameter grads."""
    from swarmacb_tpu.models.networks import POCACritic

    kw = dict(state_dim=5, act_dim=6, num_agents=8, hidden=32,
              num_heads=4, num_layers=2)
    plain = POCACritic(**kw)
    fused = POCACritic(**kw, fused_attention=True)
    states = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 5))
    actions = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 6))
    params = plain.init(jax.random.PRNGKey(3), states, actions)

    def run(m, p):
        return m.apply(p, states, actions, method=m.all_baselines)

    np.testing.assert_allclose(np.asarray(run(fused, params)),
                               np.asarray(run(plain, params)),
                               rtol=1e-5, atol=1e-5)

    g_plain = jax.grad(lambda p: run(plain, p).sum())(params)
    g_fused = jax.grad(lambda p: run(fused, p).sum())(params)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_plain)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_fused)
    for (path, a), (_, b) in zip(flat_p, flat_f):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_cotangent_quality_vs_f64_referee():
    """Pin the kernel's KNOWN numerics bound (VERDICT r2 weak #4): every
    f32 cotangent must land within 2× of the XLA composition's error
    against an f64 ground truth, except ``wa`` — whose flash-style
    recompute backward measured 4% OUTSIDE that band on hardware
    (BENCH_NOTES.md round-2 full-fusion section). This test asserts the
    band for the 8 in-band cotangents and a 2.5× ceiling for ``wa``, so
    a numerics regression in the kept-but-off-by-default lane fails the
    default suite instead of surfacing only in hardware validation."""
    args32, d = _inputs(jax.random.PRNGKey(7))
    probe = jax.random.normal(jax.random.PRNGKey(8), (4, 6, 64))

    with jax.enable_x64(True):
        # the f64 casts must happen INSIDE the x64 scope — outside it
        # astype(float64) silently stays f32 — and the referee must use
        # preferred=float64: cf_reference's production default
        # (preferred_element_type=f32) would truncate the contractions
        # back to f32 and the "truth" would just be the XLA path again
        args64 = tuple(jnp.asarray(np.asarray(a), jnp.float64)
                       for a in args32)
        g_truth = jax.grad(
            lambda *a: (cf_reference(*a, d, preferred=jnp.float64)
                        * jnp.asarray(np.asarray(probe), jnp.float64))
            .sum(), argnums=tuple(range(9)))(*args64)
        g_truth = jax.tree_util.tree_map(np.asarray, g_truth)
    g_xla = jax.grad(lambda *a: (cf_reference(*a, d) * probe).sum(),
                     argnums=tuple(range(9)))(*args32)
    g_ker = jax.grad(lambda *a: (fused_cf_attention(*a, d, True)
                                 * probe).sum(),
                     argnums=tuple(range(9)))(*args32)

    names = ["S_aa", "S_as", "S_sa", "S_ss", "wa", "dws", "x_a", "delta",
             "bias"]
    floor = 5e-7  # ≈4 ulps at O(1): below this both paths sit at f32
    # resolution and the ratio is noise; a real numerics regression is
    # orders of magnitude above it
    for name, t, x, k in zip(names, g_truth, g_xla, g_ker):
        t = np.asarray(t, dtype=np.float64)
        err_xla = np.abs(np.asarray(x, np.float64) - t).max()
        err_ker = np.abs(np.asarray(k, np.float64) - t).max()
        band = 2.5 if name == "wa" else 2.0
        assert err_ker <= max(band * err_xla, floor), (
            f"{name}: kernel cotangent error {err_ker:.3e} exceeds "
            f"{band}x the XLA composition's {err_xla:.3e}")


@pytest.mark.skipif(os.environ.get("SWARMACB_SLOW_TESTS") != "1",
                    reason="slow: shard_map + interpret-mode Pallas "
                           "(set SWARMACB_SLOW_TESTS=1; ad-hoc-verified "
                           "on a 2-device CPU mesh)")
def test_fused_attention_under_mesh():
    """The kernel must compile and run inside the shard_map update on a
    data-parallel mesh (the multi-chip layout)."""
    from helpers import run_iters, tiny_cfg, tiny_env
    from swarmacb_tpu.agents import POCATrainer
    from swarmacb_tpu.parallel import make_mesh

    trainer = POCATrainer(tiny_env(num_envs=4),
                          tiny_cfg(horizon=4, num_epochs=1,
                                   fused_attention=True),
                          mesh=make_mesh(2))
    m = run_iters(trainer, n=1)
    for k in ("policy_loss", "value_loss", "baseline_loss"):
        assert np.isfinite(m[k])
