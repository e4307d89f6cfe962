"""End-to-end CLI smoke tests: train a few steps, then play the checkpoint."""

import os
import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _run(args, cwd, timeout=600):
    # NB: the JAX_PLATFORMS env var is silently ignored on hosts whose
    # sitecustomize pre-imports jax (measured: default_backend() is still
    # "tpu" with JAX_PLATFORMS=cpu set) — the CLIs' --platform flag uses
    # jax.config.update, which does work, so pass it explicitly.
    env = dict(os.environ)
    # conftest exports XLA_FLAGS=--xla_force_host_platform_device_count=8 for
    # the in-process mesh tests; a CLI subprocess forced to CPU would then see
    # 8 virtual devices and auto-build an 8-way data mesh — drop it.
    env.pop("XLA_FLAGS", None)
    return subprocess.run(
        [sys.executable, *args, "--platform", "cpu"], cwd=cwd,
        env=env, capture_output=True, text=True, timeout=timeout,
    )


@pytest.fixture(scope="module")
def tmp_run(tmp_path_factory):
    return tmp_path_factory.mktemp("run")


@pytest.mark.slow
def test_train_and_play_cli(tmp_run):
    ckpt_dir = tmp_run / "ckpt"
    r = _run(
        [str(ROOT / "scripts" / "train.py"),
         "--config", str(ROOT / "configs" / "DirGate_tulip.yaml"),
         "--num_envs", "2",
         "--total_timesteps", "2000",   # a couple of tiny iterations
         "--hidden_dim", "16",
         "--checkpoint_dir", str(ckpt_dir),
         "--log_dir", str(tmp_run / "logs"),
         "--no-tensorboard"],
        cwd=ROOT,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "POCA" in r.stdout
    final = ckpt_dir / "poca_final"
    assert final.exists(), list(ckpt_dir.iterdir())

    # full episodes are 1199 steps — shrink to 10 s (99 steps) so the play
    # smoke test stays fast on the 1-core CPU CI host
    r2 = _run(
        [str(ROOT / "scripts" / "play.py"),
         "--checkpoint", str(final),
         "--num_envs", "2",
         "--num_episodes", "2",
         "--episode_length", "10",
         "--deterministic"],
        cwd=ROOT, timeout=900,
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "Evaluation results" in r2.stdout

    # --render viewer path (headless SDL driver), one short episode
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["SDL_VIDEODRIVER"] = "dummy"
    r3 = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "play.py"),
         "--checkpoint", str(final),
         "--num_envs", "1",
         "--num_episodes", "1",
         "--episode_length", "5",
         "--platform", "cpu",
         "--render", "--hz", "1000",
         "--deterministic"],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=900,
    )
    assert r3.returncode == 0, r3.stderr[-3000:]
    assert "Evaluation results" in r3.stdout


def test_manual_control_smoke(tmp_run):
    env = dict(os.environ)
    env["SDL_VIDEODRIVER"] = "dummy"
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "manual_control.py"),
         "--smoke-frames", "10", "--num_agents", "6"],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "smoke OK" in r.stdout


def test_manual_control_substep_smoke(tmp_run):
    """--sim-hz physics sub-stepping (C21 sim/control split,
    manual_control_isaac.py:49-52): 60 Hz sim under 10 Hz control."""
    env = dict(os.environ)
    env["SDL_VIDEODRIVER"] = "dummy"
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "manual_control.py"),
         "--smoke-frames", "10", "--num_agents", "6", "--sim-hz", "60"],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "smoke OK" in r.stdout
