"""POCA learning stack: buffer, losses, trainer, checkpointing."""

from ..config.poca_cfg import POCAConfig
from .buffer import Rollout, compute_advantages, lambda_returns, normalize_advantages
from .checkpoint import Checkpointer
from .losses import (
    PolynomialDecay,
    make_schedule,
    poca_total_loss,
    trust_region_policy_loss,
    trust_region_value_loss,
)
from .seed_parallel import SeedParallelTrainer
from .trainer import POCATrainer, TrainState

__all__ = [
    "Checkpointer",
    "POCAConfig",
    "POCATrainer",
    "SeedParallelTrainer",
    "PolynomialDecay",
    "Rollout",
    "TrainState",
    "compute_advantages",
    "lambda_returns",
    "make_schedule",
    "normalize_advantages",
    "poca_total_loss",
    "trust_region_policy_loss",
    "trust_region_value_loss",
]
