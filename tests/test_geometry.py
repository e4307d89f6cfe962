"""Arena geometry unit tests."""

import math

import numpy as np

from swarmacb_tpu.config.env_cfg import DirectionalGateEnvCfg
from swarmacb_tpu.env import geometry


def test_circumradius_matches_area():
    cfg = DirectionalGateEnvCfg()
    n, R = cfg.arena_num_sides, cfg.arena_circumradius
    area = 0.5 * n * R**2 * math.sin(2 * math.pi / n)
    assert abs(area - 4.91) < 1e-9
    assert abs(R - 1.2793) < 1e-3


def test_wall_segments_closed_polygon():
    cfg = DirectionalGateEnvCfg()
    segs = geometry.wall_segments(cfg.arena_circumradius, cfg.arena_num_sides)
    assert segs.shape == (12, 4)
    # consecutive segments share endpoints; last closes back to first vertex
    for i in range(12):
        np.testing.assert_allclose(segs[i, 2:], segs[(i + 1) % 12, :2], atol=1e-6)
    # south side is flat: two vertices share minimal y
    verts = geometry.arena_vertices(cfg.arena_circumradius, cfg.arena_num_sides)
    ys = np.sort(verts[:, 1])
    assert abs(ys[0] - ys[1]) < 1e-5


def test_gate_wall_segments():
    cfg = DirectionalGateEnvCfg()
    segs = geometry.gate_wall_segments(
        cfg.corridor_width, cfg.gate_south_y, cfg.side_wall_length
    )
    assert segs.shape == (2, 4)
    np.testing.assert_allclose(segs[0, [0, 2]], [-0.25, -0.25], atol=1e-6)
    np.testing.assert_allclose(segs[1, [0, 2]], [0.25, 0.25], atol=1e-6)
    np.testing.assert_allclose(segs[:, 3] - segs[:, 1], [0.5, 0.5], atol=1e-6)


def test_reference_face_table_quirk():
    """The default face table replicates the reference bug: faces 5 and 11
    both describe the WEST face; no face constrains the east wall
    (directional_gate_env.py:567-576)."""
    cfg = DirectionalGateEnvCfg()
    normals, points = geometry.wall_faces(cfg.arena_circumradius, cfg.arena_num_sides)
    np.testing.assert_allclose(normals[5], normals[11], atol=1e-6)
    np.testing.assert_allclose(normals[5], [1.0, 0.0], atol=1e-6)
    # no face has the east inward normal (-1, 0)
    assert not np.any(np.all(np.isclose(normals, [-1.0, 0.0], atol=1e-3), axis=1))


def test_fixed_face_table_is_correct():
    cfg = DirectionalGateEnvCfg()
    normals, points = geometry.wall_faces(
        cfg.arena_circumradius, cfg.arena_num_sides, fixed=True
    )
    # normals are unit, inward (dot(point, normal) = -inradius), all distinct
    inr = cfg.inradius
    np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0, atol=1e-6)
    np.testing.assert_allclose((points * normals).sum(1), -inr, atol=1e-5)
    # 12 distinct directions
    angles = np.sort(np.arctan2(normals[:, 1], normals[:, 0]))
    assert np.all(np.diff(angles) > 0.1)
