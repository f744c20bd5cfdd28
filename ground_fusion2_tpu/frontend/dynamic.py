"""Dynamic-object mask producer: rigid-warp motion-inconsistency check.

The reference masks dynamic objects with YOLO person boxes
(``feature_tracker.cpp:trackImagebox``, darknet wrapper node); every shipped
config runs ``use_yolo: 0`` and the tracker here already accepts an arbitrary
``dyn_mask`` image. This module is the TPU-native *producer* for that mask:
instead of a class detector it flags regions that violate the rigid-scene
hypothesis — warp the previous frame into the current view using the known
camera motion (IMU/odometry-predicted) and the current depth image, and mark
pixels whose photometric + geometric residuals are large. Moving objects of
*any* class break the warp; static scene does not.

One fused jitted program per frame: a dense pixel-grid lift (current depth)
→ rigid transform → pinhole projection → bilinear gather from the previous
gray/depth images → residual fusion → separable box blur → threshold →
max-pool dilation. Everything is elementwise/gather math over [H, W] arrays
— XLA fuses it into a handful of kernels; no data-dependent shapes.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


@dataclass(frozen=True)
class DynMaskConfig:
    stride: int = 4            # compute grid (cost ∝ 1/stride²)
    photo_thresh: float = 0.07  # intensity units (package images are [0,1])
    geo_thresh: float = 0.25   # m: |warped prev depth − predicted depth|
    blur: int = 2              # box-blur half-width on the residual grid
    dilate: int = 3            # mask dilation half-width (grid cells)
    min_depth: float = 0.1
    max_depth: float = 20.0


def _bilinear(img, uv):
    """Sample img [H, W] at uv [..., 2] (x, y) with border clamp."""
    H, W = img.shape
    x = jnp.clip(uv[..., 0], 0.0, W - 1.001)
    y = jnp.clip(uv[..., 1], 0.0, H - 1.001)
    x0, y0 = jnp.floor(x), jnp.floor(y)
    fx, fy = x - x0, y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


def _box_filter(x, r):
    """Separable box blur, half-width r (reduce_window keeps it fused)."""
    if r <= 0:
        return x
    k = 2 * r + 1
    s = lax.reduce_window(x, 0.0, lax.add, (k, 1), (1, 1), "SAME")
    s = lax.reduce_window(s, 0.0, lax.add, (1, k), (1, 1), "SAME")
    n = lax.reduce_window(jnp.ones_like(x), 0.0, lax.add, (k, 1), (1, 1),
                          "SAME")
    n = lax.reduce_window(n, 0.0, lax.add, (1, k), (1, 1), "SAME")
    return s / n


def _dilate(x, r):
    if r <= 0:
        return x
    k = 2 * r + 1
    return lax.reduce_window(x, -jnp.inf, lax.max, (k, k), (1, 1), "SAME")


@partial(jax.jit, static_argnames=("cfg",))
def dynamic_mask(prev_gray: jax.Array, prev_depth: jax.Array,
                 cur_gray: jax.Array, cur_depth: jax.Array,
                 R_pc: jax.Array, t_pc: jax.Array,
                 K: jax.Array, cfg: DynMaskConfig = DynMaskConfig()):
    """[H, W] {0,1} dynamic mask for the *current* frame.

    R_pc, t_pc: rigid transform taking current-camera points into the
    previous camera frame (from gyro propagation / wheel odometry — the
    same short-horizon prediction the estimator already maintains).
    K: [fx, fy, cx, cy].
    """
    H, W = cur_gray.shape
    s = cfg.stride
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]

    ys = jnp.arange(0, H, s, dtype=jnp.float32)
    xs = jnp.arange(0, W, s, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")           # [h, w]
    d = cur_depth[::s, ::s]
    valid = (d > cfg.min_depth) & (d < cfg.max_depth)
    d_safe = jnp.where(valid, d, 1.0)

    # lift → transform into previous camera frame → project
    pc = jnp.stack([(gx - cx) / fx * d_safe,
                    (gy - cy) / fy * d_safe, d_safe], -1)   # [h, w, 3]
    pp = pc @ R_pc.T + t_pc
    z = pp[..., 2]
    in_front = z > cfg.min_depth
    z_safe = jnp.where(in_front, z, 1.0)
    u = pp[..., 0] / z_safe * fx + cx
    v = pp[..., 1] / z_safe * fy + cy
    in_img = (u >= 1) & (u < W - 2) & (v >= 1) & (v < H - 2)
    ok = valid & in_front & in_img

    uv = jnp.stack([u, v], -1)
    photo = jnp.abs(cur_gray[::s, ::s] - _bilinear(prev_gray, uv))
    geo = jnp.abs(_bilinear(prev_depth, uv) - z_safe)

    # fuse: either channel over threshold votes "dynamic"; blur first so a
    # single-pixel depth edge does not fire (reference uses whole boxes)
    photo = _box_filter(jnp.where(ok, photo, 0.0), cfg.blur)
    geo = _box_filter(jnp.where(ok, geo, 0.0), cfg.blur)
    dyn = ((photo > cfg.photo_thresh) | (geo > cfg.geo_thresh)) & ok
    dyn = _dilate(dyn.astype(jnp.float32), cfg.dilate)

    # upsample the grid decision back to [H, W] (nearest)
    mask = jnp.repeat(jnp.repeat(dyn, s, axis=0), s, axis=1)
    return mask[:H, :W]
