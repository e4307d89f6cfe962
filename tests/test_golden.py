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


@pytest.mark.parametrize("name", sorted(CASES))
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


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        FIXTURE_DIR.mkdir(exist_ok=True)
        names = sys.argv[2:] or sorted(CASES)
        for name in names:
            np.savez_compressed(FIXTURE_DIR / f"golden_{name}.npz",
                                **_run_case(name))
            print("wrote", name)
