"""Pallas TPU kernels for the hot N² pairwise passes."""

from .pairwise import pairwise_sensors, resolve_robot_collisions

__all__ = ["pairwise_sensors", "resolve_robot_collisions"]
