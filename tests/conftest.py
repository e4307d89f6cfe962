"""Test harness config: force CPU with 8 virtual devices for mesh tests.

Note: this machine pre-imports jax at interpreter startup (sitecustomize)
with platforms "axon,cpu", so the JAX_PLATFORMS env var is latched before
conftest runs — we must use ``jax.config.update`` instead. The XLA_FLAGS
env var is still consulted lazily at CPU-client creation, which happens
after collection, so setting it here works.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite's floor is jit compile
# time (~30 distinct trainer/env programs × 10-25 s each on a 1-core
# host). The CPU backend serializes executables, so warm runs skip
# nearly all of it (measured: core suite 686 s cold → see README).
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.expanduser("~"), ".cache", "swarmacb",
                     "jax_test_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass  # older jax without these config names

import pathlib
import sys

import pytest

REFERENCE_SRC = pathlib.Path("/root/reference/source/SwarmACB_isaac")


@pytest.fixture(scope="session")
def reference_modules():
    """Import the reference's Isaac-free torch modules for parity checks.

    ``epuck_sensors`` and ``behavior_modules`` only depend on torch
    (epuck_sensors.py:21-24), so they can be imported straight from the
    read-only reference mount when it is present; tests using this fixture
    skip gracefully otherwise.
    """
    if not REFERENCE_SRC.exists():
        pytest.skip("reference repo not mounted")
    pkg_dir = REFERENCE_SRC / "SwarmACB_isaac" / "tasks" / "direct" / "epuck"
    sys.path.insert(0, str(pkg_dir))
    try:
        import importlib.util

        def load(name):
            spec = importlib.util.spec_from_file_location(name, pkg_dir / f"{name}.py")
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            return mod

        sensors = load("epuck_sensors")
        behaviors = load("behavior_modules")
        return sensors, behaviors
    finally:
        sys.path.pop(0)
