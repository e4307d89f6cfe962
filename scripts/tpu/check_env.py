#!/usr/bin/env python3
"""Pre-flight environment check for TPU runs.

The TPU-native counterpart of the reference's scripts/hpc/check_env.py
(import smoke-check before cluster runs): verifies every dependency the
framework needs, reports the device topology, and runs one tiny jitted
env step + network forward so a broken install fails HERE, not 20 minutes
into a pod job.

Usage:
    python scripts/tpu/check_env.py            # local / single host
    # on a pod, via launch_pod.sh --check
Exit code 0 = ready.
"""

from __future__ import annotations

import pathlib
import sys
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

FAILED = []


def check(name, fn):
    try:
        msg = fn()
        print(f"  [ok] {name}" + (f" — {msg}" if msg else ""))
    except Exception as e:  # noqa: BLE001 — report every failure, keep going
        FAILED.append(name)
        print(f"  [FAIL] {name}: {e!r}")
        traceback.print_exc(limit=1)


def main():
    print("── SwarmACB-TPU environment check ──────────────────────")

    def _jax():
        import jax
        devs = jax.devices()
        kinds = {d.platform for d in devs}
        return (f"jax {jax.__version__}, {len(devs)} device(s) {sorted(kinds)}, "
                f"process {jax.process_index()}/{jax.process_count()}")
    check("jax + devices", _jax)

    for mod in ("flax", "optax", "orbax.checkpoint", "yaml", "numpy"):
        check(mod, lambda m=mod: __import__(m) and "")

    def _pkg():
        import swarmacb_tpu
        from swarmacb_tpu.env import available_tasks
        return f"v{swarmacb_tpu.__version__}, tasks: {available_tasks()}"
    check("swarmacb_tpu", _pkg)

    def _env_step():
        import jax
        from swarmacb_tpu.config.env_cfg import DirectionalGateEnvCfg
        from swarmacb_tpu.env.directional_gate import DirectionalGateEnv
        env = DirectionalGateEnv(
            DirectionalGateEnvCfg(variant="daisy", num_envs=2, num_agents=4))
        state, obs = env.reset(jax.random.PRNGKey(0))
        import jax.numpy as jnp
        state, ts = env.step_jit(state, jnp.zeros((2, 4), jnp.int32))
        assert ts.obs.shape == (2, 4, 24)
        return "jitted env step OK"
    check("env step (jit)", _env_step)

    def _net():
        import jax
        import jax.numpy as jnp
        from swarmacb_tpu.models import POCACritic
        critic = POCACritic(state_dim=5, act_dim=2, num_agents=4,
                            hidden=32, num_heads=4, num_layers=1)
        s = jnp.zeros((2, 4, 5))
        a = jnp.zeros((2, 4, 2))
        p = critic.init(jax.random.PRNGKey(0), s, a)["params"]
        v = jax.jit(lambda p, s: critic.apply({"params": p}, s,
                                              method=critic.critic_pass))(p, s)
        assert v.shape == (2, 1)
        return "critic forward OK"
    check("networks (jit)", _net)

    def _configs():
        from swarmacb_tpu.config.loader import load_config
        root = pathlib.Path(__file__).resolve().parents[2]
        names = []
        for f in sorted((root / "configs").glob("DirGate_*.yaml")):
            run_name, variant, _, _ = load_config(str(f))
            names.append(variant)
        assert len(names) == 5, names
        return ", ".join(names)
    check("all 5 YAML configs", _configs)

    print("─────────────────────────────────────────────────────────")
    if FAILED:
        print(f"NOT READY — failed: {FAILED}")
        return 1
    print("READY")
    return 0


if __name__ == "__main__":
    sys.exit(main())
