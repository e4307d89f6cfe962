"""Pallas TPU kernels: the env's N² pairwise passes (pairwise.py) and the
critic's counterfactual attention (cf_attention.py — full fusion;
baseline_tail.py — the earlier fc/LN/pool tail fusion, kept as the
hardware-validated default and comparison baseline)."""

from .pairwise import pairwise_sensors, resolve_robot_collisions

__all__ = ["pairwise_sensors", "resolve_robot_collisions"]
