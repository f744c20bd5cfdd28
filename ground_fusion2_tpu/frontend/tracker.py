"""Slot-based feature tracker: KLT + detection + depth association.

The device-side equivalent of the reference's ``FeatureTracker``
(``feature_tracker.cpp``): maintains F persistent feature slots; each frame

  1. KLT-tracks live slots (coarse→fine, forward/backward check);
  2. refills dead slots from grid-NMS Shi-Tomasi corners (min-dist mask);
  3. lifts pixels to normalized-plane coordinates through the camera model,
     computes normalized-plane velocities (for td calibration);
  4. looks up RGB-D depth at the tracked pixel (``:360-367``).

Emits exactly the estimator's :class:`FrameObs` arrays. An optional
dynamic-object mask image zeroes corners/tracks inside masked regions (the
YOLO ``trackImagebox`` path — mask input replaces the darknet dependency).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.cameras import Pinhole
from ..vio.feature_window import FrameObs
from . import klt
from .clahe import clahe
from .ransac import ransac_f_reject


@dataclass
class TrackerConfig:
    num_slots: int = 96
    levels: int = 4
    half_patch: int = 10
    iters: int = 10
    fb_thresh: float = 0.8
    cell: int = 30          # reference min_dist 30 px
    min_response: float = 1e-4
    depth_range: tuple = (0.1, 7.0)
    equalize: bool = False       # CLAHE (reference rosNodeTest.cpp:271-276)
    use_ransac: bool = False     # F-matrix rejection (feature_tracker.cpp:711)
    f_thresh_px: float = 1.0     # reference F_threshold (pixels)
    focal: float = 460.0         # pixel->normalized conversion for f_thresh


class FeatureTracker:
    def __init__(self, cfg: TrackerConfig, cam: Pinhole):
        self.cfg = cfg
        self.cam = cam
        F = cfg.num_slots
        self.uv = jnp.zeros((F, 2), jnp.float32)
        self.alive = jnp.zeros((F,), jnp.float32)
        self.prev_pyr = None
        self.prev_norm = jnp.zeros((F, 2), jnp.float32)
        self.prev_t = None
        self._frame_idx = 0

    def track(self, t: float, img: jax.Array, depth_img: jax.Array | None = None,
              dyn_mask: jax.Array | None = None) -> FrameObs:
        """img: [H, W] grayscale float; depth_img: [H, W] metres (0 invalid);
        dyn_mask: [H, W] {0,1}, 1 = dynamic region to avoid."""
        cfg = self.cfg
        F = cfg.num_slots
        if cfg.equalize:
            img = clahe(img)
        pyr = tuple(klt.build_pyramid(img, cfg.levels))

        if self.prev_pyr is not None:
            pts1, tracked = klt.klt_track(
                self.prev_pyr, pyr, self.uv, self.alive,
                cfg.half_patch, cfg.iters, cfg.fb_thresh)
            alive = self.alive * tracked
            if cfg.use_ransac:
                # geometric rejection on continuing tracks (all alive slots
                # here predate this frame; refill happens below)
                ray1 = self.cam.lift(pts1)
                norm1 = ray1[:, :2] / jnp.maximum(ray1[:, 2:3], 1e-6)
                key = jax.random.PRNGKey(self._frame_idx)
                alive = ransac_f_reject(
                    self.prev_norm, norm1, alive, key,
                    thresh=cfg.f_thresh_px / cfg.focal)
        else:
            pts1, alive = self.uv, jnp.zeros((F,), jnp.float32)
        self._frame_idx += 1

        if dyn_mask is not None:
            inside = klt._bilinear(dyn_mask.astype(jnp.float32), pts1) > 0.5
            alive = alive * (1.0 - inside.astype(jnp.float32))

        # refill dead slots with fresh corners
        resp = klt.shi_tomasi(pyr[0])
        if dyn_mask is not None:
            resp = jnp.where(dyn_mask > 0.5, -1.0, resp)
        n_free = F  # upper bound; detection returns scored candidates
        cand_uv, cand_score, cand_ok = klt.detect_grid(
            resp, pts1, cfg.cell, F, occupied_mask=alive,
            min_response=cfg.min_response)

        free_order = jnp.argsort(alive, stable=True)        # dead slots first
        n_free_arr = jnp.sum(alive <= 0).astype(jnp.int32)
        take = (jnp.arange(F) < n_free_arr) & (cand_ok > 0)
        uv_new = jnp.where(take[:, None], cand_uv, 0.0)
        # scatter candidates into dead slots in order
        uv = pts1.at[free_order].set(
            jnp.where(take[:, None], cand_uv, pts1[free_order]))
        fresh = jnp.zeros((F,), jnp.float32).at[free_order].set(
            take.astype(jnp.float32))
        alive = jnp.maximum(alive, fresh)

        # normalized-plane coordinates + velocity
        ray = self.cam.lift(uv)
        norm = ray[:, :2] / jnp.maximum(ray[:, 2:3], 1e-6)
        if self.prev_t is not None and t > self.prev_t:
            vel = (norm - self.prev_norm) / (t - self.prev_t)
            vel = vel * (alive * (1.0 - fresh))[:, None]
        else:
            vel = jnp.zeros((F, 2), jnp.float32)

        if depth_img is not None:
            d = klt._bilinear(depth_img, uv)
            d_ok = (d > cfg.depth_range[0]) & (d < cfg.depth_range[1])
            depth = jnp.where(d_ok, d, 0.0) * alive
        else:
            depth = jnp.zeros((F,), jnp.float32)

        self.uv = uv
        self.alive = alive
        self.prev_pyr = pyr
        self.prev_norm = norm
        self.prev_t = t
        return FrameObs(ray=norm, vel=vel, depth=depth, alive=alive,
                        fresh=fresh)
