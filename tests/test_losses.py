"""Loss + schedule tests vs hand math and the reference implementations."""

import importlib.util
import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from swarmacb_tpu.agents import losses

REF_AGENTS = pathlib.Path(
    "/root/reference/source/SwarmACB_isaac/SwarmACB_isaac/tasks/direct/agents"
)


@pytest.fixture(scope="module")
def ref_trainer_mod():
    if not REF_AGENTS.exists():
        pytest.skip("reference repo not mounted")
    import sys
    import types

    # poca_trainer imports tqdm/tensorboard/networks — satisfy minimal deps
    sys.path.insert(0, str(REF_AGENTS))
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_poca_trainer", REF_AGENTS / "poca_trainer.py")
        mod = importlib.util.module_from_spec(spec)
        # shim the relative imports
        import importlib as _il

        nets_spec = importlib.util.spec_from_file_location(
            "poca_networks", REF_AGENTS / "poca_networks.py")
        nets = importlib.util.module_from_spec(nets_spec)
        nets_spec.loader.exec_module(nets)
        buf_spec = importlib.util.spec_from_file_location(
            "poca_buffer", REF_AGENTS / "poca_buffer.py")
        bufm = importlib.util.module_from_spec(buf_spec)
        buf_spec.loader.exec_module(bufm)
        sys.modules["poca_networks"] = nets
        sys.modules["poca_buffer"] = bufm
        src = (REF_AGENTS / "poca_trainer.py").read_text()
        src = src.replace("from .poca_networks import", "from poca_networks import")
        src = src.replace("from .poca_buffer import", "from poca_buffer import")
        mod2 = types.ModuleType("ref_poca_trainer")
        sys.modules["ref_poca_trainer"] = mod2  # dataclass needs this entry
        exec(compile(src, "ref_poca_trainer", "exec"), mod2.__dict__)
        return mod2
    finally:
        sys.path.pop(0)


def test_value_loss_hand():
    v = jnp.array([1.0, 2.0])
    old = jnp.array([1.0, 1.0])
    ret = jnp.array([0.0, 0.0])
    # clipped: [1, 1.2]; losses: max((0-1)^2,(0-1)^2)=1; max(4, 1.44)=4
    out = losses.trust_region_value_loss(v, old, ret, 0.2)
    np.testing.assert_allclose(float(out), (1 + 4) / 2, atol=1e-6)


def test_policy_loss_hand():
    adv = jnp.array([[1.0], [1.0]])
    logp = jnp.array([[0.5], [-0.5]])
    old = jnp.array([[0.0], [0.0]])
    r = np.exp([0.5, -0.5])
    clipped = np.clip(r, 0.8, 1.2)
    expected = -np.minimum(r * 1.0, clipped * 1.0).mean()
    out = losses.trust_region_policy_loss(adv, logp, old, 0.2)
    np.testing.assert_allclose(float(out), expected, atol=1e-6)


def test_losses_parity(ref_trainer_mod):
    import torch

    rng = np.random.default_rng(3)
    v = rng.normal(size=(64,)).astype(np.float32)
    old = rng.normal(size=(64,)).astype(np.float32)
    ret = rng.normal(size=(64,)).astype(np.float32)
    ref_v = ref_trainer_mod.trust_region_value_loss(
        torch.from_numpy(v), torch.from_numpy(old), torch.from_numpy(ret), 0.2
    ).item()
    our_v = float(losses.trust_region_value_loss(
        jnp.asarray(v), jnp.asarray(old), jnp.asarray(ret), 0.2))
    np.testing.assert_allclose(our_v, ref_v, atol=1e-6)

    adv = rng.normal(size=(64, 1)).astype(np.float32)
    lp = rng.normal(size=(64, 2)).astype(np.float32) * 0.1
    olp = rng.normal(size=(64, 2)).astype(np.float32) * 0.1
    ref_p = ref_trainer_mod.trust_region_policy_loss(
        torch.from_numpy(adv), torch.from_numpy(lp), torch.from_numpy(olp), 0.2
    ).item()
    our_p = float(losses.trust_region_policy_loss(
        jnp.asarray(adv), jnp.asarray(lp), jnp.asarray(olp), 0.2))
    np.testing.assert_allclose(our_p, ref_p, atol=1e-6)


def test_polynomial_decay_parity(ref_trainer_mod):
    ref = ref_trainer_mod.PolynomialDecay(3e-4, 1e-10, 1000)
    ours = losses.PolynomialDecay(3e-4, 1e-10, 1000)
    for step in [0, 1, 500, 999, 1000, 5000]:
        np.testing.assert_allclose(ours(step), ref.get(step), rtol=1e-9)


def test_make_schedule_constant():
    s = losses.make_schedule("constant", 0.2, 0.1, 100)
    assert s(0) == 0.2 and s(1000) == 0.2
    lin = losses.make_schedule("linear", 0.2, 0.1, 100)
    np.testing.assert_allclose(lin(100), 0.1, atol=1e-9)
    np.testing.assert_allclose(lin(50), 0.15, atol=1e-9)
