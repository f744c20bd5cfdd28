"""Line-segment detection + tracking (the reference's USE_LINE path).

The reference's optional line pipeline (``linefeature_tracker.cpp``: LSD
detection + LBD descriptor matching; every shipped Ground-Fusion++ config
runs ``use_line: 0``) is re-designed TPU-first:

* **Detection**: no region-growing LSD — instead a dense, fixed-shape
  structure-tensor fit per grid cell. Sobel gradients → per-cell
  magnitude-weighted PCA of edge-pixel positions; a cell whose edge pixels
  are collinear (large eigen-anisotropy) and whose gradient orientations
  agree emits one segment through the cell centroid along the minor-gradient
  axis. One ``[cells, px]`` batched program — no data-dependent loops.
* **Tracking**: sample P points along each segment, KLT-track them with the
  existing pyramidal tracker (`klt.klt_track`), re-fit the segment by PCA
  over surviving points (replaces LBD descriptor matching — the geometric
  track IS the match).

Segments are endpoint-parameterized `[L, 4] (x1, y1, x2, y2)` with a
validity mask — the fixed-slot idiom the rest of the frontend uses. The
window-BA line *factors* (Plücker/orthonormal) live in
``factors/line_factors.py``; per the reference's shipped configs the live
pipeline keeps them off.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from . import klt


@dataclass(frozen=True)
class LineConfig:
    cell: int = 24              # detection grid pitch (px)
    mag_thresh: float = 0.06    # min mean top-edge gradient magnitude
    aniso_thresh: float = 5.0   # λ1/λ2 of the position covariance
    min_len: float = 12.0       # segment length floor (px)
    track_points: int = 8       # KLT samples per segment
    min_inliers: int = 5        # surviving samples to keep a track


def _cell_view(img, cell):
    """[H, W] → [ncy, ncx, cell*cell] block view (crop to multiples)."""
    H, W = img.shape
    ncy, ncx = H // cell, W // cell
    v = img[: ncy * cell, : ncx * cell]
    v = v.reshape(ncy, cell, ncx, cell).transpose(0, 2, 1, 3)
    return v.reshape(ncy, ncx, cell * cell), ncy, ncx


@partial(jax.jit, static_argnames=("cfg",))
def detect_lines(img: jax.Array, cfg: LineConfig = LineConfig()):
    """Detect up to ncy*ncx line segments (one per grid cell).

    Returns (segs [L, 4] (x1,y1,x2,y2), valid [L]) with L = ncy*ncx.
    """
    gx, gy = klt._gradients(img)
    mag = jnp.sqrt(gx * gx + gy * gy)
    c = cfg.cell

    m, ncy, ncx = _cell_view(mag, c)                  # [ny, nx, c²]
    gxv, _, _ = _cell_view(gx, c)
    gyv, _, _ = _cell_view(gy, c)

    # per-cell pixel coordinates (cell-local)
    yy, xx = jnp.meshgrid(jnp.arange(c, dtype=img.dtype),
                          jnp.arange(c, dtype=img.dtype), indexing="ij")
    xx = xx.reshape(-1)
    yy = yy.reshape(-1)

    # weight = squared magnitude of the top-decile edge pixels: concentrates
    # the PCA on the actual edge, not ambient texture gradients
    thresh = jnp.quantile(m, 0.9, axis=-1, keepdims=True)
    sel = m >= thresh
    w = jnp.where(sel, m * m, 0.0)                    # [ny, nx, c²]
    wsum = w.sum(-1) + 1e-9
    mean_mag = ((jnp.where(sel, m, 0.0)).sum(-1)
                / jnp.maximum(sel.sum(-1), 1))

    # magnitude-weighted PCA of edge-pixel positions
    mx = (w * xx).sum(-1) / wsum
    my = (w * yy).sum(-1) / wsum
    dxx = (w * xx * xx).sum(-1) / wsum - mx * mx
    dyy = (w * yy * yy).sum(-1) / wsum - my * my
    dxy = (w * xx * yy).sum(-1) / wsum - mx * my
    # eigen-decomposition of [[dxx, dxy], [dxy, dyy]] (closed form)
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4 - det, 0.0))
    l1 = tr / 2 + disc
    l2 = tr / 2 - disc
    # principal axis (direction of the line)
    vx = jnp.where(jnp.abs(dxy) > 1e-9, l1 - dyy, 1.0)
    vy = jnp.where(jnp.abs(dxy) > 1e-9, dxy, jnp.where(dxx >= dyy, 0.0, 1.0))
    nrm = jnp.sqrt(vx * vx + vy * vy) + 1e-9
    vx, vy = vx / nrm, vy / nrm

    # gradient-orientation consistency: gradients ⊥ line direction
    gdot = (w * (gxv * vx[..., None] + gyv * vy[..., None])).sum(-1) / wsum
    gmag = (w * jnp.sqrt(gxv * gxv + gyv * gyv)).sum(-1) / wsum + 1e-9
    ortho = jnp.abs(gdot) / gmag < 0.5

    half_len = 2.0 * jnp.sqrt(jnp.maximum(l1, 0.0))
    ok = ((mean_mag > cfg.mag_thresh)
          & (l1 > cfg.aniso_thresh * jnp.maximum(l2, 1e-6))
          & (2 * half_len >= cfg.min_len) & ortho)

    # cell-local → image coords
    cx0 = jnp.arange(ncx, dtype=img.dtype) * c
    cy0 = jnp.arange(ncy, dtype=img.dtype) * c
    ox, oy = jnp.meshgrid(cy0, cx0, indexing="ij")[1], \
        jnp.meshgrid(cy0, cx0, indexing="ij")[0]
    x_c, y_c = mx + ox, my + oy
    segs = jnp.stack([x_c - vx * half_len, y_c - vy * half_len,
                      x_c + vx * half_len, y_c + vy * half_len], -1)
    return segs.reshape(-1, 4), ok.reshape(-1).astype(jnp.float32)


@partial(jax.jit, static_argnames=("cfg", "levels", "half_patch", "iters"))
def track_lines(pyr0: tuple, pyr1: tuple, segs: jax.Array, valid: jax.Array,
                cfg: LineConfig = LineConfig(), levels: int = 3,
                half_patch: int = 6, iters: int = 8):
    """Track segments frame0→frame1: KLT on P samples per line + PCA re-fit.

    Returns (segs1 [L, 4], valid1 [L]).
    """
    L = segs.shape[0]
    P = cfg.track_points
    a = jnp.linspace(0.05, 0.95, P)
    p0 = segs[:, None, :2] * (1 - a)[None, :, None] \
        + segs[:, None, 2:] * a[None, :, None]          # [L, P, 2]
    pts0 = p0.reshape(L * P, 2)
    v0 = jnp.repeat(valid, P)
    pts1, v1 = klt.klt_track(pyr0, pyr1, pts0, v0, levels, half_patch, iters)
    pts1 = pts1.reshape(L, P, 2)
    v1 = v1.reshape(L, P)

    n = v1.sum(-1)
    wsum = n[:, None] + 1e-9
    mean = (pts1 * v1[..., None]).sum(1) / wsum          # [L, 2]
    d = (pts1 - mean[:, None]) * v1[..., None]
    dxx = (d[..., 0] ** 2).sum(1) / wsum[:, 0]
    dyy = (d[..., 1] ** 2).sum(1) / wsum[:, 0]
    dxy = (d[..., 0] * d[..., 1]).sum(1) / wsum[:, 0]
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4 - det, 0.0))
    l1 = tr / 2 + disc
    l2 = tr / 2 - disc
    vx = jnp.where(jnp.abs(dxy) > 1e-9, l1 - dyy, 1.0)
    vy = jnp.where(jnp.abs(dxy) > 1e-9, dxy, jnp.where(dxx >= dyy, 0.0, 1.0))
    nrm = jnp.sqrt(vx * vx + vy * vy) + 1e-9
    vx, vy = vx / nrm, vy / nrm

    # project surviving samples onto the fitted axis for the new extent
    t = (pts1[..., 0] - mean[:, None, 0]) * vx[:, None] \
        + (pts1[..., 1] - mean[:, None, 1]) * vy[:, None]
    big = 1e6
    tmin = jnp.min(jnp.where(v1 > 0, t, big), axis=1)
    tmax = jnp.max(jnp.where(v1 > 0, t, -big), axis=1)
    segs1 = jnp.stack([mean[:, 0] + vx * tmin, mean[:, 1] + vy * tmin,
                       mean[:, 0] + vx * tmax, mean[:, 1] + vy * tmax], -1)

    # straightness of the tracked points (residual ⊥ axis)
    straight = l2 < 2.0
    ok = (valid > 0) & (n >= cfg.min_inliers) & straight \
        & ((tmax - tmin) >= cfg.min_len * 0.5)
    return segs1, ok.astype(jnp.float32)
