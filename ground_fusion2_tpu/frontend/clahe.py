"""CLAHE — contrast-limited adaptive histogram equalization, jittable.

The reference equalizes every incoming image with ``cv::createCLAHE(3.0,
cv::Size(8, 8))`` before tracking (``vins_estimator/src/rosNodeTest.cpp:
271-276``). This is the XLA version: per-tile clipped histograms via one
scatter-add, per-tile LUTs from the clipped CDF, and bilinear interpolation
between the four neighbouring tile LUTs at every pixel — one fused program,
no host loops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BINS = 256


@partial(jax.jit, static_argnums=(1, 2))
def clahe(img: jax.Array, tiles: tuple[int, int] = (8, 8),
          clip: float = 3.0) -> jax.Array:
    """img: [H, W] float in [0, 1]. Returns equalized [H, W] float in [0, 1].

    ``tiles`` = (rows, cols) of the tile grid; ``clip`` = clip limit as a
    multiple of the uniform bin height (OpenCV semantics).
    """
    H, W = img.shape
    TH, TW = tiles
    th = -(-H // TH)   # ceil tile heights (edge tiles may be smaller)
    tw = -(-W // TW)

    b = jnp.clip((img * (BINS - 1) + 0.5).astype(jnp.int32), 0, BINS - 1)
    rows = jnp.arange(H)[:, None] // th
    cols = jnp.arange(W)[None, :] // tw
    tid = (rows * TW + cols).astype(jnp.int32)              # [H, W]
    flat = (tid * BINS + b).reshape(-1)
    hist = jnp.zeros((TH * TW * BINS,), jnp.float32).at[flat].add(1.0)
    hist = hist.reshape(TH * TW, BINS)
    npix = jnp.sum(hist, axis=1, keepdims=True)             # per-tile count

    limit = jnp.maximum(clip * npix / BINS, 1.0)
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / BINS

    cdf = jnp.cumsum(hist, axis=1)
    cdf0 = cdf[:, :1]
    lut = (cdf - cdf0) / jnp.maximum(npix - cdf0, 1.0)      # [T, BINS] in [0,1]

    # bilinear interpolation between tile LUTs (tile centers)
    fy = (jnp.arange(H, dtype=jnp.float32) - 0.5 * th) / th
    fx = (jnp.arange(W, dtype=jnp.float32) - 0.5 * tw) / tw
    fy = jnp.clip(fy, 0.0, TH - 1.0)
    fx = jnp.clip(fx, 0.0, TW - 1.0)
    i0 = jnp.floor(fy).astype(jnp.int32)
    j0 = jnp.floor(fx).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, TH - 1)
    j1 = jnp.minimum(j0 + 1, TW - 1)
    wy = (fy - i0)[:, None]
    wx = (fx - j0)[None, :]

    def sample(ti, tj):
        t = ti[:, None] * TW + tj[None, :]                  # [H, W]
        return lut[t.reshape(-1), b.reshape(-1)].reshape(H, W)

    v00 = sample(i0, j0)
    v01 = sample(i0, j1)
    v10 = sample(i1, j0)
    v11 = sample(i1, j1)
    out = (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
           + v10 * wy * (1 - wx) + v11 * wy * wx)
    return out.astype(img.dtype)
