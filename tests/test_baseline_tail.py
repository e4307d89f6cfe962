"""Parity of the fused counterfactual-tail Pallas kernel (fwd + custom
vjp) against the pure-XLA composition, in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swarmacb_tpu.ops import baseline_tail as bt


def _inputs(key, B=6, N=5, H=4, h=32):
    ks = jax.random.split(key, 7)
    HM = H * N
    return dict(
        attn_lhs=jax.random.uniform(ks[0], (B, N * N, HM)) / HM,
        attn_mI=jax.random.uniform(ks[1], (B, H, N, N)) / N,
        wa=jax.random.normal(ks[2], (B, HM, h)) * 0.3,
        dws=jax.random.normal(ks[3], (B, H, N, h)) * 0.2,
        x_a=jax.random.normal(ks[4], (B, N, h)),
        delta=jax.random.normal(ks[5], (B, N, h)) * 0.5,
        bias=jax.random.normal(ks[6], (h,)) * 0.1,
    )


NAMES = ("attn_lhs", "attn_mI", "wa", "dws", "x_a", "delta", "bias")


def _call_fused(inp, N, interpret=True):
    return bt.fused_tail(*(inp[n] for n in NAMES), N, interpret)


@pytest.mark.parametrize("B,N,h", [(6, 5, 32), (8, 5, 128), (3, 4, 64)])
def test_fused_tail_forward_parity(B, N, h):
    inp = _inputs(jax.random.PRNGKey(B + h), B=B, N=N, h=h)
    ref = bt.tail_reference(**inp, N=N)
    got = _call_fused(inp, N)
    assert got.shape == (B, N, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_tail_grad_parity():
    B, N, h = 6, 5, 32
    inp = _inputs(jax.random.PRNGKey(0), B=B, N=N, h=h)
    cot = jax.random.normal(jax.random.PRNGKey(9), (B, N, h))

    def loss_ref(*args):
        return (bt.tail_reference(**dict(zip(NAMES, args)), N=N) * cot).sum()

    def loss_fused(*args):
        return (bt.fused_tail(*args, N, True) * cot).sum()

    args = tuple(inp[n] for n in NAMES)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    for name, a, b in zip(NAMES, g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5,
            err_msg=f"cotangent mismatch for {name}")


@pytest.mark.slow
def test_critic_fused_tail_matches_plain():
    """POCACritic.all_baselines with fused_tail=True (interpret mode off-TPU)
    must match the pure-XLA path: values and parameter gradients."""
    from swarmacb_tpu.models.networks import POCACritic

    kw = dict(state_dim=5, act_dim=6, num_agents=8, hidden=32,
              num_heads=4, num_layers=2)
    plain = POCACritic(**kw)
    fused = POCACritic(**kw, fused_tail=True)
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


@pytest.mark.slow
def test_fused_tail_odd_batch_sizes():
    """_pick_G handles B with no small divisor (grid of 1-group blocks)."""
    inp = _inputs(jax.random.PRNGKey(3), B=7, N=4, h=32)
    ref = bt.tail_reference(**inp, N=4)
    got = _call_fused(inp, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
