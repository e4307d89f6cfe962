"""Pallas TPU kernels: the env's N² pairwise passes (pairwise.py) and the
critic's counterfactual attention (cf_attention.py — full fusion;
baseline_tail.py — the earlier fc/LN/pool tail fusion, kept as the
hardware-validated default and comparison baseline)."""

from .fused_step import fused_env_step
from .pairwise import pairwise_sensors, resolve_robot_collisions

__all__ = ["fused_env_step", "pairwise_sensors", "resolve_robot_collisions"]
