"""ML-Agents-schema YAML loader → (run_name, variant, POCAConfig, env overrides).

Mirrors the reference loader exactly (config_loader.py:29-118): the same
``behaviors.<run>.{variant, hyperparameters, network_settings(+memory),
reward_signals.extrinsic, max_steps, time_horizon, summary_freq,
checkpoint_interval, keep_checkpoints, environment{num_envs,
decision_period, episode_length_s}}`` schema, so the reference's five
DirGate YAML files load unmodified. Precedence: YAML → CLI overrides win
(scripts/train.py).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import yaml

from .poca_cfg import POCAConfig


def load_config(path: str | Path) -> tuple[str, str, POCAConfig, dict[str, Any]]:
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"Config file not found: {path}")

    with open(path, "r", encoding="utf-8") as f:
        raw = yaml.safe_load(f)

    behaviors = raw.get("behaviors", raw)
    if not behaviors:
        raise ValueError("Config must have a top-level 'behaviors' key.")

    run_name = next(iter(behaviors))
    block = behaviors[run_name]

    variant = block.get("variant", "dandelion")
    hypers = block.get("hyperparameters", {})
    network = block.get("network_settings", {})
    reward = block.get("reward_signals", {})
    environment = block.get("environment", {})

    cfg = POCAConfig()

    # Hyperparameters (config_loader.py:67-78)
    cfg.mini_batch_size = hypers.get("batch_size", cfg.mini_batch_size)
    cfg.lr = hypers.get("learning_rate", cfg.lr)
    cfg.beta = hypers.get("beta", cfg.beta)
    cfg.clip_eps = hypers.get("epsilon", cfg.clip_eps)
    cfg.lam = hypers.get("lambd", cfg.lam)
    cfg.num_epochs = hypers.get("num_epoch", cfg.num_epochs)
    cfg.lr_schedule = hypers.get("learning_rate_schedule", "constant")
    cfg.eps_schedule = hypers.get("epsilon_schedule", "constant")
    cfg.beta_schedule = hypers.get("beta_schedule", "constant")

    # Network (config_loader.py:81-88)
    cfg.hidden_dim = network.get("hidden_units", cfg.hidden_dim)
    cfg.num_layers = network.get("num_layers", cfg.num_layers)
    memory = network.get("memory", {})
    cfg.recurrent = bool(memory) or variant == "cyclamen"
    if cfg.recurrent:
        cfg.memory_size = memory.get("memory_size", cfg.memory_size)
        cfg.sequence_length = memory.get("sequence_length", cfg.sequence_length)

    # Reward signals (config_loader.py:90-93)
    extrinsic = reward.get("extrinsic", {})
    cfg.gamma = extrinsic.get("gamma", cfg.gamma)
    cfg.reward_strength = extrinsic.get("strength", 1.0)

    # Training control (config_loader.py:95-103)
    cfg.total_timesteps = block.get("max_steps", cfg.total_timesteps)
    cfg.horizon = block.get("time_horizon", cfg.horizon)
    cfg.summary_freq = block.get("summary_freq", 120000)
    cfg.checkpoint_interval = block.get("checkpoint_interval", 120000)
    cfg.keep_checkpoints = block.get("keep_checkpoints", 5)
    cfg.buffer_size_hint = hypers.get("buffer_size", 0)

    # Environment (config_loader.py:105-117)
    cfg.decision_period = environment.get("decision_period", cfg.decision_period)
    cfg.log_dir = f"runs/{run_name}"
    cfg.checkpoint_dir = f"checkpoints/{run_name}"

    env_overrides: dict[str, Any] = {}
    if "num_envs" in environment:
        env_overrides["num_envs"] = environment["num_envs"]
    if "episode_length_s" in environment:
        env_overrides["episode_length_s"] = environment["episode_length_s"]

    return run_name, variant, cfg, env_overrides


def print_config(run_name: str, variant: str, cfg: POCAConfig, env_ov: dict):
    """Human-readable config banner (config_loader.py:125-161)."""
    sep = "─" * 60
    print(f"\n{sep}")
    print("  SwarmACB-TPU Training Config")
    print(sep)
    print(f"  Run name        : {run_name}")
    print(f"  CASA variant    : {variant}")
    print("  Trainer         : POCA (JAX / TPU)")
    print(sep)
    print("  Hyperparameters")
    print(f"    batch_size          : {cfg.mini_batch_size}")
    print(f"    learning_rate       : {cfg.lr}  (schedule: {cfg.lr_schedule})")
    print(f"    beta                : {cfg.beta}  (schedule: {cfg.beta_schedule})")
    print(f"    epsilon             : {cfg.clip_eps}  (schedule: {cfg.eps_schedule})")
    print(f"    lambd               : {cfg.lam}")
    print(f"    num_epoch           : {cfg.num_epochs}")
    print(f"    gamma               : {cfg.gamma}")
    print("  Network")
    print(f"    hidden_units        : {cfg.hidden_dim}")
    print(f"    num_layers          : {cfg.num_layers}")
    if cfg.recurrent:
        print(f"    memory_size         : {cfg.memory_size}")
        print(f"    sequence_length     : {cfg.sequence_length}")
    print("  Training")
    print(f"    max_steps           : {cfg.total_timesteps:,}")
    print(f"    time_horizon        : {cfg.horizon}")
    print(f"    decision_period     : {cfg.decision_period}")
    print(f"    checkpoint_interval : {cfg.checkpoint_interval:,}")
    print(f"    summary_freq        : {cfg.summary_freq:,}")
    if cfg.reward_strength != 1.0:
        print(f"    reward_strength     : {cfg.reward_strength}")
    if env_ov:
        print("  Environment overrides")
        for k, v in env_ov.items():
            print(f"    {k:22s}: {v}")
    print(f"{sep}\n")
