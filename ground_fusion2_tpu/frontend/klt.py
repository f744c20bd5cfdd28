"""Batched image-pyramid KLT tracking + Shi-Tomasi detection in pure XLA.

Replaces the reference's OpenCV front-end (``feature_tracker.cpp:103-372``:
``goodFeaturesToTrack`` + ``calcOpticalFlowPyrLK`` with reverse-flow check,
min-distance masking) with fixed-shape batched device code:

  * pyramid: separable 5-tap binomial blur + 2× decimation (conv on VPU);
  * Shi-Tomasi: Scharr gradients, 2×2 structure tensor box-filtered, min
    eigenvalue response;
  * detection: grid non-max suppression — one corner per ``cell`` px cell,
    occupied cells masked (the reference's min-dist mask, made parallel);
  * KLT: per-feature 21×21 bilinear patches, inverse-compositional iterations
    coarse→fine, forward/backward consistency check.

Everything operates on [F]-slot arrays with validity masks; one compiled
program per (image size, pyramid levels) pair.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


# ----------------------------------------------------------------- pyramid
def _blur(img: jax.Array) -> jax.Array:
    """Separable 5-tap binomial blur, reflect padding. img: [H, W]."""
    k = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0], img.dtype) / 16.0
    pad = jnp.pad(img, ((2, 2), (0, 0)), mode="edge")
    img = sum(k[i] * pad[i:i + img.shape[0]] for i in range(5))
    pad = jnp.pad(img, ((0, 0), (2, 2)), mode="edge")
    img = sum(k[i] * pad[:, i:i + img.shape[1]] for i in range(5))
    return img


def build_pyramid(img: jax.Array, levels: int = 4) -> list[jax.Array]:
    """[H, W] -> list of levels, level 0 = full resolution."""
    pyr = [img]
    for _ in range(levels - 1):
        img = _blur(img)[::2, ::2]
        pyr.append(img)
    return pyr


# ------------------------------------------------------------- shi-tomasi
def _gradients(img: jax.Array):
    """Scharr-like central-difference gradients (gx, gy)."""
    gx = jnp.zeros_like(img)
    gx = gx.at[:, 1:-1].set(0.5 * (img[:, 2:] - img[:, :-2]))
    gy = jnp.zeros_like(img)
    gy = gy.at[1:-1, :].set(0.5 * (img[2:, :] - img[:-2, :]))
    return gx, gy


def _box3(x: jax.Array) -> jax.Array:
    p = jnp.pad(x, 1, mode="edge")
    return (p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
            + p[1:-1, :-2] + p[1:-1, 1:-1] + p[1:-1, 2:]
            + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:])


def shi_tomasi(img: jax.Array) -> jax.Array:
    """Min-eigenvalue corner response, [H, W]."""
    gx, gy = _gradients(img)
    a = _box3(gx * gx)
    b = _box3(gx * gy)
    c = _box3(gy * gy)
    tr = a + c
    det = a * c - b * b
    disc = jnp.sqrt(jnp.maximum(0.25 * tr * tr - det, 0.0))
    return 0.5 * tr - disc


@partial(jax.jit, static_argnums=(2, 3), static_argnames=("border",))
def detect_grid(response: jax.Array, occupied_uv: jax.Array,
                cell: int = 30, max_new: int = 64,
                occupied_mask: jax.Array | None = None,
                border: int = 8, min_response: float = 1e-4):
    """Grid-NMS detection: best corner per cell, skipping occupied cells.

    occupied_uv: [F, 2] existing feature pixels (masked by occupied_mask).
    Returns (uv [max_new, 2], score [max_new], valid [max_new]).
    """
    H, W = response.shape
    gh, gw = H // cell, W // cell
    # border + low response suppression
    r = response
    r = r.at[:border].set(-1.0).at[-border:].set(-1.0)
    r = r.at[:, :border].set(-1.0).at[:, -border:].set(-1.0)
    r = jnp.where(r > min_response, r, -1.0)

    rc = r[: gh * cell, : gw * cell].reshape(gh, cell, gw, cell)
    rc = rc.transpose(0, 2, 1, 3).reshape(gh, gw, cell * cell)
    best = jnp.argmax(rc, axis=-1)
    best_val = jnp.max(rc, axis=-1)
    by, bx = best // cell, best % cell
    uy = (jnp.arange(gh)[:, None] * cell + by).astype(jnp.float32)
    ux = (jnp.arange(gw)[None, :] * cell + bx).astype(jnp.float32)

    # mask cells containing an existing feature (min-dist suppression)
    if occupied_mask is None:
        occupied_mask = jnp.ones(occupied_uv.shape[0], response.dtype)
    cy = jnp.clip((occupied_uv[:, 1] // cell).astype(jnp.int32), 0, gh - 1)
    cx = jnp.clip((occupied_uv[:, 0] // cell).astype(jnp.int32), 0, gw - 1)
    occ = jnp.zeros((gh, gw), response.dtype)
    occ = occ.at[cy, cx].add(occupied_mask)
    best_val = jnp.where(occ > 0, -1.0, best_val)

    flat_val = best_val.reshape(-1)
    flat_uv = jnp.stack([ux.reshape(-1), uy.reshape(-1)], axis=-1)
    top_val, top_idx = jax.lax.top_k(flat_val, max_new)
    uv = flat_uv[top_idx]
    return uv, top_val, (top_val > 0).astype(response.dtype)


# ------------------------------------------------------------------- klt
def _bilinear(img: jax.Array, xy: jax.Array) -> jax.Array:
    """Sample img at xy ([..., 2], (x, y) order) with bilinear interp."""
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


def _patch_coords(half: int, dtype=jnp.float32):
    r = jnp.arange(-half, half + 1, dtype=dtype)
    gy, gx = jnp.meshgrid(r, r, indexing="ij")
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)  # [P, 2]


MAX_DISP = 6      # per-level LK search radius beyond the incoming guess


def _extract_windows(img, centers, win_half):
    """Per-feature square windows as ONE-HOT MATMULS (MXU), not gathers.

    TPU gathers are the anti-pattern: the original per-iteration bilinear
    gathers made KLT ~170 ms/frame on a v5e. Selecting rows/columns with
    one-hot selection matrices turns window extraction into two dense
    matmuls the MXU eats for free.

    centers: [F, 2] int (x, y). Returns (win [F, Wl, Wl], xs [F], ys [F])
    with (xs, ys) the window origins (clipped inside the image)."""
    H, W = img.shape
    Wl = 2 * win_half + 1
    ys = jnp.clip(centers[:, 1] - win_half, 0, H - Wl)
    xs = jnp.clip(centers[:, 0] - win_half, 0, W - Wl)
    rr = ys[:, None] + jnp.arange(Wl)[None, :]              # [F, Wl]
    R = (rr[:, :, None] == jnp.arange(H)[None, None, :]).astype(img.dtype)
    cc = xs[:, None] + jnp.arange(Wl)[None, :]
    C = (cc[:, :, None] == jnp.arange(W)[None, None, :]).astype(img.dtype)
    t = jnp.einsum("fyh,hw->fyw", R, img)                   # row select
    win = jnp.einsum("fyw,fxw->fyx", t, C)                  # col select
    return win, xs, ys


def _sample_patch(win, off_x, off_y, half):
    """Bilinear (2*half+1)^2 patch from each window at fractional offsets,
    as two small dense matmuls (separable linear-interp matrices).

    win: [F, Wl, Wl]; off_*: [F] patch-center position in window coords.
    Positions outside the window clamp to its edge — the same semantics as
    the image-border clip of the original ``_bilinear`` (for features whose
    clipped window sits at the image border, the window edge IS the image
    edge, so border tracks behave identically)."""
    Wl = win.shape[-1]
    r = jnp.arange(-half, half + 1, dtype=off_x.dtype)
    py = jnp.clip(off_y[:, None] + r[None, :], 0.0, Wl - 1.001)  # [F, P]
    Ay = jnp.maximum(0.0, 1.0 - jnp.abs(
        py[:, :, None] - jnp.arange(Wl, dtype=off_x.dtype)[None, None, :]))
    px = jnp.clip(off_x[:, None] + r[None, :], 0.0, Wl - 1.001)
    Ax = jnp.maximum(0.0, 1.0 - jnp.abs(
        px[:, :, None] - jnp.arange(Wl, dtype=off_x.dtype)[None, None, :]))
    t = jnp.einsum("fpw,fwx->fpx", Ay, win)                 # interp rows
    return jnp.einsum("fpx,fqx->fpq", t, Ax)                # interp cols


def _track_level(img0, img1, pts0, guess, valid, half, iters, dtype):
    """One pyramid level of inverse-compositional LK for all features.

    Windows are centered at the rounded template position (img0) and at the
    incoming guess (img1) so the iterations only need ±MAX_DISP of slack;
    everything inside the loop is dense math on [F, P, P] tensors."""
    win_half = half + MAX_DISP + 1
    c0 = jnp.round(pts0).astype(jnp.int32)
    w0, xs0, ys0 = _extract_windows(img0, c0, win_half)
    c1 = jnp.round(pts0 + guess).astype(jnp.int32)
    w1, xs1, ys1 = _extract_windows(img1, c1, win_half)

    off0x = pts0[:, 0] - xs0.astype(dtype)
    off0y = pts0[:, 1] - ys0.astype(dtype)
    t = _sample_patch(w0, off0x, off0y, half)               # template
    gx = 0.5 * (_sample_patch(w0, off0x + 1, off0y, half)
                - _sample_patch(w0, off0x - 1, off0y, half))
    gy = 0.5 * (_sample_patch(w0, off0x, off0y + 1, half)
                - _sample_patch(w0, off0x, off0y - 1, half))
    a = jnp.sum(gx * gx, axis=(-2, -1))
    b = jnp.sum(gx * gy, axis=(-2, -1))
    c = jnp.sum(gy * gy, axis=(-2, -1))
    det = a * c - b * b
    ok = det > 1e-6
    inv = jnp.where(ok, 1.0 / jnp.maximum(det, 1e-6), 0.0)

    x1f = xs1.astype(dtype)
    y1f = ys1.astype(dtype)

    def body(_, d):
        cur = _sample_patch(w1, pts0[:, 0] + d[:, 0] - x1f,
                            pts0[:, 1] + d[:, 1] - y1f, half)
        e = cur - t
        jx = jnp.sum(e * gx, axis=(-2, -1))
        jy = jnp.sum(e * gy, axis=(-2, -1))
        dx = inv * (c * jx - b * jy)
        dy = inv * (-b * jx + a * jy)
        return d - jnp.stack([dx, dy], axis=-1)

    d = jax.lax.fori_loop(0, iters, body, guess)
    return d, valid & ok


@partial(jax.jit, static_argnums=(4, 5, 6))
def klt_track(pyr0: tuple, pyr1: tuple, pts0: jax.Array, valid0: jax.Array,
              half: int = 10, iters: int = 10, fb_thresh: float = 0.5):
    """Track pts0 (level-0 pixels, [F, 2]) from pyr0 to pyr1.

    Coarse-to-fine with forward/backward consistency (reference
    ``trackImage``'s reverse check, ``feature_tracker.cpp:122-143``).
    Returns (pts1 [F, 2], tracked [F]).
    """
    dtype = pts0.dtype
    L = len(pyr0)
    F = pts0.shape[0]
    valid = valid0 > 0

    def pyramid_flow(pa, pb, pts):
        scale = 2.0 ** (L - 1)
        d = jnp.zeros((F, 2), dtype)
        ok = valid
        for lev in range(L - 1, -1, -1):
            s = 2.0 ** lev
            d = d * (scale / s)
            dl, ok = _track_level(pa[lev], pb[lev], pts / s, d, ok,
                                  half, iters, dtype)
            d = dl
            scale = s
        return d, ok

    d_fwd, ok = pyramid_flow(pyr0, pyr1, pts0)
    pts1 = pts0 + d_fwd
    # backward check
    d_bwd, ok_b = pyramid_flow(pyr1, pyr0, pts1)
    back = pts1 + d_bwd
    fb_err = jnp.linalg.norm(back - pts0, axis=-1)
    H0, W0 = pyr0[0].shape
    inb = ((pts1[:, 0] > 2) & (pts1[:, 0] < W0 - 3)
           & (pts1[:, 1] > 2) & (pts1[:, 1] < H0 - 3))
    tracked = ok & ok_b & inb & (fb_err < fb_thresh)
    return pts1, tracked.astype(dtype)
