"""Occupancy-grid mapping (support_files/grid_mapping + the pose-graph
node's prior-map path): ray-walk update on a synthetic room, ROS int8
conversion, PGM save/load round trip."""

import numpy as np

from ground_fusion2_tpu.mapping.occupancy import GridConfig, OccupancyGrid


def _square_room_scan(half=3.0, n=720):
    """Beams from the origin hitting a square room's walls at ±half."""
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    d = np.stack([np.cos(ang), np.sin(ang)], -1)
    # distance to the unit square wall in direction d
    t = half / np.maximum(np.abs(d[:, 0]), np.abs(d[:, 1]))
    return d * t[:, None]


def test_room_scan_builds_free_interior_occupied_walls():
    g = OccupancyGrid(GridConfig(size_x=200, size_y=200,
                                 init_x=100, init_y=100))
    pts = _square_room_scan(n=2880)        # dense enough to hit every row
    for _ in range(3):                     # repeated scans sharpen belief
        g.update(np.zeros(2), pts)
    p = g.prob()
    c = g.cfg.cell_size

    # interior clearly free
    interior = p[100 - 40:100 + 40, 100 - 40:100 + 40]
    assert (interior < 0.2).mean() > 0.95, interior.mean()
    # wall cells occupied: the +x wall at x = 3.0 straddles the boundary of
    # cells ix 159/160 — a hit belongs to one of the two
    i = int(3.0 / c) + 100
    wall = p[100 - 40:100 + 40, i - 1:i + 2].max(axis=1)
    assert (wall > 0.7).mean() > 0.95, wall
    # far outside untouched (prior 0.5)
    assert abs(p[5, 5] - 0.5) < 1e-3


def test_int8_convention():
    g = OccupancyGrid(GridConfig(size_x=64, size_y=64, init_x=32, init_y=32))
    pts = _square_room_scan(half=1.0, n=180)
    g.update(np.zeros(2), pts)
    d = g.to_int8()
    assert d.dtype == np.int8
    assert (d == -1).any()                 # unknown kept as -1
    assert d.max() > 60 and (d[d >= 0].min() < 30)


def test_pgm_roundtrip(tmp_path):
    g = OccupancyGrid(GridConfig(size_x=96, size_y=80, init_x=48, init_y=40))
    pts = _square_room_scan(half=1.5, n=360)
    for _ in range(2):
        g.update(np.zeros(2), pts)
    img, yml = str(tmp_path / "map.pgm"), str(tmp_path / "map.yaml")
    g.save(img, yml)
    g2 = OccupancyGrid.load(img)
    p1, p2 = g.prob(), g2.prob()
    assert p2.shape == p1.shape
    # probability map survives the 8-bit quantization (worst case ~0.x%)
    assert np.abs(p1 - p2).max() < 0.02
    assert "resolution: 0.05" in open(yml).read()
