"""Golden-trajectory regression tests (SURVEY.md §4 test strategy).

Fixed seed + fixed action sequences → positions/yaw/rewards must stay
bit-stable across refactors and optimizations (bf16 experiments, Pallas
paths, fusion changes must not silently alter the simulation). Fixtures
are committed as .npz; regenerate deliberately with:

    python tests/test_golden.py regen
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

# Must happen before any jnp constant is materialized (swarmacb imports
# below create arrays): fixtures are CPU-generated and CPU-compared.
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import pytest

from swarmacb_tpu.config.env_cfg import DirectionalGateEnvCfg
from swarmacb_tpu.env.directional_gate import DirectionalGateEnv

FIXTURE_DIR = pathlib.Path(__file__).parent / "fixtures"

CASES = {
    "dandelion": dict(variant="dandelion", num_envs=2, num_agents=8, steps=50),
    "daisy": dict(variant="daisy", num_envs=2, num_agents=8, steps=50),
    "lily": dict(variant="lily", num_envs=2, num_agents=8, steps=50),
    # tulip/cyclamen differ from lily only in the NETWORK (env_cfg.py:
    # OBS_DIM/ACT_DIM rows are identical), so these fixtures pin that
    # path-identity rather than exercise new env code
    "tulip": dict(variant="tulip", num_envs=2, num_agents=8, steps=50),
    "cyclamen": dict(variant="cyclamen", num_envs=2, num_agents=8, steps=50),
    # Long-horizon fixtures (VERDICT r2 #7): one full 1200-step episode at
    # the reference's N=20 per env PATH (continuous / discrete). The
    # measured TPU-vs-CPU divergence onset for discrete variants is step
    # ~571 (PARITY.md) — a 50-step fixture cannot catch a long-horizon
    # regression, and 1200 steps also crosses the truncation boundary, so
    # the folded auto-reset (fresh spawns, colour/exploration re-init) is
    # pinned too.
    "dandelion_long": dict(variant="dandelion", num_envs=1, num_agents=20,
                           steps=1200),
    "daisy_long": dict(variant="daisy", num_envs=1, num_agents=20,
                       steps=1200),
}


def _run_case(name):
    c = CASES[name]
    env = DirectionalGateEnv(DirectionalGateEnvCfg(
        variant=c["variant"], num_envs=c["num_envs"], num_agents=c["num_agents"]))
    E, N = c["num_envs"], c["num_agents"]
    state, obs0 = env.reset(jax.random.PRNGKey(1234))

    rng = np.random.default_rng(99)
    if env.cfg.discrete_actions:
        actions = jnp.asarray(
            rng.integers(0, 6, (c["steps"], E, N)).astype(np.int32))
    else:
        actions = jnp.asarray(
            rng.uniform(-1.5, 1.5, (c["steps"], E, N, 2)).astype(np.float32))

    @jax.jit
    def run(state, actions):
        def body(s, a):
            s, ts = env.step(s, a)
            return s, (s.pos, s.yaw, ts.reward)
        return jax.lax.scan(body, state, actions)

    state, (pos, yaw, reward) = run(state, actions)
    return {
        "obs0": np.asarray(obs0),
        "pos": np.asarray(pos),
        "yaw": np.asarray(yaw),
        "reward": np.asarray(reward),
    }


# Lanes-path goldens (VERDICT r4 #7): the fused-step scan driver
# (env/lanes.py + ops/fused_step.py, interpret mode on CPU) gets the
# same regression pinning as the jnp path. One discrete and one
# continuous case; trajectories legitimately differ from the jnp
# fixtures (kernel numerics mode + (N, Ep) draw shapes), so these pin
# the LANES path against itself across refactors.
LANES_CASES = {
    "lanes_daisy": dict(variant="daisy", num_envs=2, num_agents=8, steps=30),
    "lanes_dandelion": dict(variant="dandelion", num_envs=2, num_agents=8,
                            steps=30),
}


def _run_case_lanes(name):
    from swarmacb_tpu.env.lanes import (from_lanes, state_to_lanes,
                                        step_lanes, to_lanes)

    c = LANES_CASES[name]
    env = DirectionalGateEnv(DirectionalGateEnvCfg(
        variant=c["variant"], num_envs=c["num_envs"],
        num_agents=c["num_agents"]))
    E, N = c["num_envs"], c["num_agents"]
    state, _ = env.reset(jax.random.PRNGKey(1234))
    lanes0 = state_to_lanes(env, state)

    rng = np.random.default_rng(99)
    if env.cfg.discrete_actions:
        acts = rng.integers(0, 6, (c["steps"], E, N)).astype(np.int32)
        acts_l = jnp.stack([to_lanes(jnp.asarray(a), E) for a in acts])
        unpack = lambda a: a
    else:
        acts = rng.uniform(-1.0, 1.0, (c["steps"], E, N, 2)).astype(np.float32)
        l = jnp.stack([to_lanes(jnp.asarray(a[..., 0]), E) for a in acts])
        r = jnp.stack([to_lanes(jnp.asarray(a[..., 1]), E) for a in acts])
        acts_l = (l, r)
        unpack = lambda a: (a[0], a[1])

    @jax.jit
    def run(lanes, acts_l):
        def body(l, a):
            l, reward, done, _ = step_lanes(env, l, unpack(a), want_obs=False)
            return l, (from_lanes(l["px"], E), from_lanes(l["py"], E),
                       from_lanes(l["yaw"], E), reward)
        if isinstance(acts_l, tuple):
            acts_l = jnp.stack(acts_l, axis=1)
            return jax.lax.scan(
                lambda l, a: body(l, (a[0], a[1])), lanes, acts_l)
        return jax.lax.scan(body, lanes, acts_l)

    _, (px, py, yaw, reward) = run(lanes0, acts_l)
    return {
        "px": np.asarray(px), "py": np.asarray(py),
        "yaw": np.asarray(yaw), "reward": np.asarray(reward),
    }


@pytest.mark.parametrize("name", [
    pytest.param(n, marks=pytest.mark.slow)
    # _long: 1200-step episodes; tulip/cyclamen: env-path-identical to
    # lily (see CASES note) — their pins only need the thorough tier
    if n.endswith("_long") or n in ("tulip", "cyclamen")
    else n for n in sorted(CASES)])
def test_golden_trajectory(name):
    path = FIXTURE_DIR / f"golden_{name}.npz"
    if not path.exists():
        pytest.skip(f"fixture {path} missing — run `python {__file__} regen`")
    golden = np.load(path)
    out = _run_case(name)
    for k in golden.files:
        np.testing.assert_allclose(
            out[k], golden[k], atol=1e-6,
            err_msg=f"{name}/{k} drifted from the golden fixture")


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(LANES_CASES))
def test_golden_lanes_trajectory(name):
    path = FIXTURE_DIR / f"golden_{name}.npz"
    if not path.exists():
        pytest.skip(f"fixture {path} missing — run `python {__file__} regen`")
    golden = np.load(path)
    out = _run_case_lanes(name)
    for k in golden.files:
        np.testing.assert_allclose(
            out[k], golden[k], atol=1e-6,
            err_msg=f"{name}/{k} drifted from the lanes golden fixture")


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        FIXTURE_DIR.mkdir(exist_ok=True)
        names = sys.argv[2:] or sorted(CASES) + sorted(LANES_CASES)
        for name in names:
            runner = _run_case_lanes if name in LANES_CASES else _run_case
            np.savez_compressed(FIXTURE_DIR / f"golden_{name}.npz",
                                **runner(name))
            print("wrote", name)
