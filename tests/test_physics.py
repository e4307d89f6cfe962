"""Physics unit + parity tests (differential drive, collisions)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from swarmacb_tpu.config.env_cfg import DirectionalGateEnvCfg
from swarmacb_tpu.env import geometry, physics

CFG = DirectionalGateEnvCfg()


def test_differential_drive_straight():
    left = jnp.full((1, 3), 0.12)
    right = jnp.full((1, 3), 0.12)
    yaw = jnp.zeros((1, 3))
    dx, dy, dyaw = physics.differential_drive(left, right, yaw, CFG.wheelbase, 0.1)
    np.testing.assert_allclose(dx, 0.012, atol=1e-7)
    np.testing.assert_allclose(dy, 0.0, atol=1e-7)
    np.testing.assert_allclose(dyaw, 0.0, atol=1e-7)


def test_differential_drive_turn_in_place():
    left = jnp.full((1, 1), -0.12)
    right = jnp.full((1, 1), 0.12)
    yaw = jnp.zeros((1, 1))
    dx, dy, dyaw = physics.differential_drive(left, right, yaw, CFG.wheelbase, 0.1)
    np.testing.assert_allclose(dx, 0.0, atol=1e-7)
    np.testing.assert_allclose(dyaw, 0.24 / CFG.wheelbase * 0.1, rtol=1e-6)


def test_differential_drive_heading_rotation():
    yaw = jnp.full((1, 1), math.pi / 2)
    dx, dy, _ = physics.differential_drive(
        jnp.full((1, 1), 0.1), jnp.full((1, 1), 0.1), yaw, CFG.wheelbase, 0.1
    )
    np.testing.assert_allclose(dx, 0.0, atol=1e-8)
    np.testing.assert_allclose(dy, 0.01, rtol=1e-5)


def test_differential_drive_parity(reference_modules):
    import torch

    ref_sensors, _ = reference_modules
    rng = np.random.default_rng(0)
    l = rng.uniform(-0.12, 0.12, (4, 20)).astype(np.float32)
    r = rng.uniform(-0.12, 0.12, (4, 20)).astype(np.float32)
    yaw = rng.uniform(-np.pi, np.pi, (4, 20)).astype(np.float32)
    ref = ref_sensors.EpuckSensors.differential_drive(
        torch.from_numpy(l), torch.from_numpy(r), torch.from_numpy(yaw),
        CFG.wheelbase, 0.1,
    )
    ours = physics.differential_drive(jnp.asarray(l), jnp.asarray(r), jnp.asarray(yaw),
                                      CFG.wheelbase, 0.1)
    for a, b in zip(ref, ours):
        np.testing.assert_allclose(a.numpy(), np.asarray(b), atol=1e-7)


def test_wall_pushout_inside_untouched():
    normals, points = geometry.wall_faces(CFG.arena_circumradius, CFG.arena_num_sides)
    pos = jnp.zeros((1, 2, 2))  # center
    out = physics.resolve_wall_collisions(pos, normals, points, CFG.robot_radius)
    np.testing.assert_allclose(out, pos, atol=1e-8)


def test_wall_pushout_north():
    normals, points = geometry.wall_faces(CFG.arena_circumradius, CFG.arena_num_sides)
    inr = CFG.inradius
    # Robot 1 cm past the allowed band at the north face
    pos = jnp.array([[[0.0, inr - 0.02]]])
    out = physics.resolve_wall_collisions(pos, normals, points, CFG.robot_radius)
    # pushed back so signed_dist == r: y = inr − r
    np.testing.assert_allclose(out[0, 0, 1], inr - CFG.robot_radius, atol=1e-6)


def test_wall_pushout_replicates_reference_east_gap():
    """Default (parity) table: no push at the east face; double push west."""
    normals, points = geometry.wall_faces(CFG.arena_circumradius, CFG.arena_num_sides)
    inr = CFG.inradius
    east = jnp.array([[[inr - 0.02, 0.0]]])   # penetrating east wall
    out = physics.resolve_wall_collisions(east, normals, points, CFG.robot_radius)
    np.testing.assert_allclose(out, east, atol=1e-7)  # untouched (ref bug)

    west = jnp.array([[[-(inr - 0.02), 0.0]]])
    out_w = physics.resolve_wall_collisions(west, normals, points, CFG.robot_radius)
    pen = CFG.robot_radius - 0.02
    # two identical west faces → 2× penetration push
    np.testing.assert_allclose(out_w[0, 0, 0], -(inr - 0.02) + 2 * pen, atol=1e-6)

    fixed_n, fixed_p = geometry.wall_faces(
        CFG.arena_circumradius, CFG.arena_num_sides, fixed=True
    )
    out_fixed = physics.resolve_wall_collisions(east, fixed_n, fixed_p, CFG.robot_radius)
    np.testing.assert_allclose(out_fixed[0, 0, 0], inr - CFG.robot_radius, atol=1e-6)


def test_gate_wall_clamp():
    r = CFG.robot_radius
    hw = CFG.corridor_width / 2
    gs = CFG.gate_south_y
    y_mid = gs + 0.25
    # robot just inside-left of the left wall (x < 0, |x+hw| < r)
    pos = jnp.array([[[-hw - 0.01, y_mid], [-hw + 0.01, y_mid], [0.0, 0.0]]])
    out = physics.resolve_gate_wall_collisions(pos, r, hw, gs, CFG.side_wall_length)
    np.testing.assert_allclose(out[0, 0, 0], -hw - r, atol=1e-6)  # pushed outward
    np.testing.assert_allclose(out[0, 1, 0], -hw + r, atol=1e-6)  # pushed inward
    np.testing.assert_allclose(out[0, 2], [0.0, 0.0], atol=1e-8)  # outside band


def test_gate_wall_right_and_y_band():
    r = CFG.robot_radius
    hw = CFG.corridor_width / 2
    gs = CFG.gate_south_y
    pos = jnp.array([[[hw - 0.01, gs + 0.1], [hw - 0.01, gs - 0.1]]])
    out = physics.resolve_gate_wall_collisions(pos, r, hw, gs, CFG.side_wall_length)
    np.testing.assert_allclose(out[0, 0, 0], hw - r, atol=1e-6)
    np.testing.assert_allclose(out[0, 1, 0], hw - 0.01, atol=1e-8)  # below band


def test_robot_pushout_pair():
    r = CFG.robot_radius
    d = 0.05  # < 2r = 0.07 → overlap 0.02
    pos = jnp.array([[[0.0, 0.0], [d, 0.0]]])
    out = physics.resolve_robot_collisions(pos, r)
    overlap = 2 * r - np.sqrt(d**2 + 1e-8)
    np.testing.assert_allclose(out[0, 0, 0], -overlap / 2, atol=1e-6)
    np.testing.assert_allclose(out[0, 1, 0], d + overlap / 2, atol=1e-6)
    np.testing.assert_allclose(out[0, :, 1], 0.0, atol=1e-7)


def test_robot_pushout_no_overlap_noop():
    pos = jnp.array([[[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]])
    out = physics.resolve_robot_collisions(pos, CFG.robot_radius)
    np.testing.assert_allclose(out, pos, atol=1e-7)
