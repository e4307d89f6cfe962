"""Flax networks: POCA actors and attention-based centralized critic."""

from .networks import (
    Actor,
    DiscreteActor,
    EntityEmbedding,
    LinearEncoder,
    LSTMCell,
    POCACritic,
    RecurrentDiscreteActor,
    ResidualSelfAttention,
)

__all__ = [
    "Actor",
    "DiscreteActor",
    "EntityEmbedding",
    "LinearEncoder",
    "LSTMCell",
    "POCACritic",
    "RecurrentDiscreteActor",
    "ResidualSelfAttention",
]
