"""2D occupancy-grid mapping (dense_map's grid-map subsystem).

Rebuild of the reference's ``support_files/grid_mapping`` (``grid_map.cpp``,
``grid_mapper.cpp``: per-beam cell-size-stepped ray walk with the inverse
laser model P_occ/P_free/P_prior = 0.6/0.4/0.5, log-odds Bayes update) and
the pose-graph node's prior-map load/publish path
(``pose_graph_node.cpp:861-900``: image → occupancy with unknown where
|p − 0.5| ≤ 0.005).

TPU-first: the reference walks one beam at a time in a double loop; here ONE
jitted program updates the whole scan — [N, S] ray samples at cell-size
steps, the inverse model evaluated dense, and a scatter-add of log-odds
increments (`grid.at[iy, ix].add`). Fixed shapes: S = max_range/cell_size
samples per beam, masked past the hit. Duplicate samples landing in one cell
simply accumulate — equivalent to a (slightly) sharper update; thresholds in
the tests use the probability map, not raw log-odds.

File format: binary PGM (P5) + a tiny YAML sidecar — what `map_server`
ships and what the reference's ``saveMap``/``loadMap`` mimic — with the same
row flip the node applies (`cv::flip(grid_img, grid_img, 0)`).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class GridConfig:
    size_x: int = 400           # cells (reference demo: 1500 x 500)
    size_y: int = 400
    init_x: int = 200           # origin cell (world (0,0) maps here)
    init_y: int = 200
    cell_size: float = 0.05     # m (reference 0.05)
    p_occ: float = 0.6          # inverse model (grid_mapper.cpp defaults)
    p_free: float = 0.4
    p_prior: float = 0.5
    max_range: float = 10.0     # ray-walk budget (m)


def _logit(p):
    return float(np.log(p / (1.0 - p)))


@partial(jax.jit, static_argnames=("cfg",))
def _update(logodds: jax.Array, origin_xy: jax.Array, pts_xy: jax.Array,
            valid: jax.Array, cfg: GridConfig):
    """Scatter one scan into the log-odds grid. pts_xy [N, 2] world."""
    c = cfg.cell_size
    S = int(cfg.max_range / c)
    d = pts_xy - origin_xy[None, :]
    z = jnp.linalg.norm(d, axis=-1)                     # [N]
    u = d / jnp.maximum(z, 1e-9)[:, None]

    r = jnp.arange(S, dtype=logodds.dtype) * c          # [S]
    p = origin_xy[None, None, :] + u[:, None, :] * r[None, :, None]
    live = valid[:, None] & (r[None, :] < z[:, None] + c)     # walk to hit

    # inverse laser model (laserInvModel): free short of the hit, occupied
    # at it, prior past it (prior ⇒ zero log-odds increment)
    occ = jnp.abs(r[None, :] - z[:, None]) <= 0.5 * c
    free = r[None, :] < z[:, None] - 0.5 * c
    inc = jnp.where(occ, _logit(cfg.p_occ),
                    jnp.where(free, _logit(cfg.p_free), 0.0))
    inc = jnp.where(live, inc, 0.0)

    ix = jnp.floor(p[..., 0] / c).astype(jnp.int32) + cfg.init_x
    iy = jnp.floor(p[..., 1] / c).astype(jnp.int32) + cfg.init_y
    inb = ((ix >= 0) & (ix < cfg.size_x) & (iy >= 0) & (iy < cfg.size_y))
    ix = jnp.clip(ix, 0, cfg.size_x - 1)
    iy = jnp.clip(iy, 0, cfg.size_y - 1)
    inc = jnp.where(inb, inc, 0.0)
    return logodds.at[iy.ravel(), ix.ravel()].add(inc.ravel())


class OccupancyGrid:
    """Log-odds occupancy map fed by world-frame scan endpoints."""

    def __init__(self, cfg: GridConfig = GridConfig()):
        self.cfg = cfg
        self.logodds = jnp.zeros((cfg.size_y, cfg.size_x), jnp.float32)

    def update(self, sensor_xy, pts_world, valid=None):
        """One scan: ``sensor_xy`` [2] world sensor position, ``pts_world``
        [N, 2|3] hit points (z dropped — planar grid)."""
        pts = jnp.asarray(pts_world, jnp.float32)[:, :2]
        if valid is None:
            valid = jnp.ones((pts.shape[0],), bool)
        self.logodds = _update(self.logodds,
                               jnp.asarray(sensor_xy, jnp.float32)[:2],
                               pts, jnp.asarray(valid, bool), self.cfg)

    def prob(self) -> np.ndarray:
        """[H, W] occupancy probability (0.5 = unknown)."""
        return np.asarray(jax.nn.sigmoid(self.logodds))

    def to_int8(self) -> np.ndarray:
        """ROS OccupancyGrid data convention (pose_graph_node.cpp:890-898):
        -1 unknown, else round(p·100)."""
        p = self.prob()
        out = np.full(p.shape, -1, np.int8)
        known = np.abs(p - 0.5) > 0.005
        out[known] = np.round(p[known] * 100).astype(np.int8)
        return out

    # -- persistence (PGM + YAML sidecar, map_server style) ---------------
    def save(self, img_path: str, cfg_path: str):
        """White = free (the node inverts on load: value = 1 − pixel)."""
        img = np.clip((1.0 - self.prob()) * 255.0, 0, 255).astype(np.uint8)
        img = img[::-1]                      # the node's cv::flip(·, 0)
        with open(img_path, "wb") as f:
            f.write(b"P5\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
            f.write(img.tobytes())
        c = self.cfg
        with open(cfg_path, "w") as f:
            f.write(f"image: {img_path}\nresolution: {c.cell_size}\n"
                    f"origin: [{-c.init_x * c.cell_size}, "
                    f"{-c.init_y * c.cell_size}, 0.0]\n"
                    f"negate: 0\noccupied_thresh: 0.65\nfree_thresh: 0.2\n")

    @staticmethod
    def load(img_path: str, cfg: GridConfig | None = None) -> "OccupancyGrid":
        """Prior-map load (LOAD_GRID_MAP path): PGM → occupancy 1 − v."""
        with open(img_path, "rb") as f:
            assert f.readline().strip() == b"P5"
            line = f.readline()
            while line.startswith(b"#"):
                line = f.readline()
            w, h = map(int, line.split())
            f.readline()                     # maxval
            img = np.frombuffer(f.read(w * h), np.uint8).reshape(h, w)
        img = img[::-1].astype(np.float32) / 255.0
        occ = 1.0 - img
        g = OccupancyGrid(cfg or GridConfig(
            size_x=w, size_y=h, init_x=w // 2, init_y=h // 2))
        p = np.clip(occ, 1e-3, 1 - 1e-3)
        g.logodds = jnp.asarray(np.log(p / (1 - p)), jnp.float32)
        return g
