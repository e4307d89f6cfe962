"""Pure-functional batched swarm environments."""

from .behaviors import BehaviorState, compute_wheels_from_vector, dispatch
from .directional_gate import DirectionalGateEnv
from .registry import available_tasks, make_env, register
from .state import EnvState, TimeStep

__all__ = [
    "BehaviorState",
    "DirectionalGateEnv",
    "EnvState",
    "TimeStep",
    "available_tasks",
    "compute_wheels_from_vector",
    "dispatch",
    "make_env",
    "register",
]
