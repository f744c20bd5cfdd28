"""Fixed-shape feature-window bookkeeping (the reference's FeatureManager).

The reference keeps ``list<FeaturePerId>`` with per-feature obs lists
(``feature_manager.h:30-60``); here the window's observations live in dense
[F, W] arrays aligned with the tracker's feature slots, and every operation
(add frame, slide, re-anchor, triangulate) is a masked vectorized transform —
jit-compatible, no data-dependent shapes.

Key ops mirrored from the reference:
  * addFeatureCheckParallax (``feature_manager.cpp:57``) → :func:`parallax_keyframe_test`
  * triangulateWithDepth / triangulate (``:726/:669``) → :func:`triangulate`
  * removeBackShiftDepth (``:818``) → re-anchoring inside :func:`slide_oldest`
  * slideWindowNew → :func:`slide_second_newest`
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from .state import NUM_FRAMES, WindowState


class FeatureWindow(NamedTuple):
    ray: jax.Array        # [F, W, 2] normalized-plane obs
    vel: jax.Array        # [F, W, 2]
    depth: jax.Array      # [F, W] RGB-D depth (0 = none)
    obs_valid: jax.Array  # [F, W]
    anchor: jax.Array     # [F] int32
    track_valid: jax.Array  # [F]
    depth_fixed: jax.Array  # [F] rho pinned by RGB-D depth

    @staticmethod
    def empty(num_feats: int, dtype=jnp.float32) -> "FeatureWindow":
        F, W = num_feats, NUM_FRAMES
        return FeatureWindow(
            ray=jnp.zeros((F, W, 2), dtype),
            vel=jnp.zeros((F, W, 2), dtype),
            depth=jnp.zeros((F, W), dtype),
            obs_valid=jnp.zeros((F, W), dtype),
            anchor=jnp.zeros((F,), jnp.int32),
            track_valid=jnp.zeros((F,), dtype),
            depth_fixed=jnp.zeros((F,), dtype),
        )


class FrameObs(NamedTuple):
    """One frame's tracker output, aligned with feature slots."""

    ray: jax.Array    # [F, 2]
    vel: jax.Array    # [F, 2]
    depth: jax.Array  # [F] (0 = no depth)
    alive: jax.Array  # [F] tracked in this frame
    fresh: jax.Array  # [F] newly spawned this frame (no history)


def add_frame(fw: FeatureWindow, obs: FrameObs, col: jax.Array | int,
              rho: jax.Array, depth_range=(0.1, 7.0)):
    """Insert a frame's observations at window column ``col``.

    Fresh slots reset their history and anchor at ``col``; continuing slots
    append. Features first observed with valid RGB-D depth become depth-fixed
    (reference ``estimate_flag==1`` path, depth gate
    ``feature_manager.cpp:753``) and their rho is seeded to 1/depth.
    """
    F, W, _ = fw.ray.shape
    dtype = fw.ray.dtype
    col = jnp.asarray(col, jnp.int32)
    onehot = (jnp.arange(W) == col).astype(dtype)           # [W]

    alive = obs.alive.astype(dtype)
    fresh = (obs.fresh * obs.alive).astype(dtype)

    # fresh slots wipe history
    keep_hist = (1.0 - fresh)[:, None]
    obs_valid = fw.obs_valid * keep_hist
    ray = fw.ray * keep_hist[..., None]
    vel = fw.vel * keep_hist[..., None]
    depth = fw.depth * keep_hist

    # write the new column for alive slots
    wmask = alive[:, None] * onehot[None, :]                # [F, W]
    obs_valid = obs_valid * (1 - wmask) + wmask
    ray = ray * (1 - wmask[..., None]) + wmask[..., None] * obs.ray[:, None, :]
    vel = vel * (1 - wmask[..., None]) + wmask[..., None] * obs.vel[:, None, :]
    depth = depth * (1 - wmask) + wmask * obs.depth[:, None]

    anchor = jnp.where(fresh > 0, col, fw.anchor)
    track_valid = jnp.maximum(fw.track_valid * alive, fresh)

    d_ok = (obs.depth > depth_range[0]) & (obs.depth < depth_range[1])
    depth_fixed = jnp.where(fresh > 0, (d_ok).astype(dtype), fw.depth_fixed)
    rho = jnp.where((fresh > 0) & d_ok, 1.0 / jnp.maximum(obs.depth, 1e-3), rho)
    rho = jnp.where((fresh > 0) & ~d_ok, 0.2, rho)

    return fw._replace(ray=ray, vel=vel, depth=depth, obs_valid=obs_valid,
                       anchor=anchor, track_valid=track_valid,
                       depth_fixed=depth_fixed), rho


def _cam_pose(x: WindowState):
    """Camera pose per frame: (q_wc [W,4], t_wc [W,3])."""
    q_wc = lie.quat_mul(x.q, x.qic[None])
    t_wc = lie.quat_rotate(x.q, x.tic[None]) + x.p
    return q_wc, t_wc


def landmark_world(fw: FeatureWindow, x: WindowState, rho: jax.Array):
    """World position of each feature from its anchor + inverse depth."""
    F = fw.ray.shape[0]
    q_wc, t_wc = _cam_pose(x)
    a = fw.anchor
    ray_a = jnp.take_along_axis(fw.ray, a[:, None, None], axis=1)[:, 0]  # [F,2]
    pt = jnp.concatenate([ray_a, jnp.ones((F, 1), fw.ray.dtype)], -1)
    p_c = pt / jnp.maximum(rho, 1e-3)[:, None]
    return lie.quat_rotate(q_wc[a], p_c) + t_wc[a]


def reanchor(fw: FeatureWindow, x: WindowState, rho: jax.Array,
             need: jax.Array, new_anchor: jax.Array):
    """Move features' anchor to ``new_anchor`` recomputing rho through world
    space (reference removeBackShiftDepth math)."""
    p_w = landmark_world(fw, x, rho)
    q_wc, t_wc = _cam_pose(x)
    p_c_new = lie.quat_rotate(
        lie.quat_conj(q_wc[new_anchor]), p_w - t_wc[new_anchor])
    z = p_c_new[:, 2]
    rho_new = 1.0 / jnp.maximum(z, 1e-2)
    ok = z > 1e-2
    rho_out = jnp.where(need & ok, rho_new, rho)
    anchor_out = jnp.where(need & ok, new_anchor, fw.anchor)
    track = jnp.where(need & ~ok, 0.0, fw.track_valid)
    return fw._replace(anchor=anchor_out, track_valid=track), rho_out


def first_valid_after(obs_valid: jax.Array, k: int = 0) -> jax.Array:
    """Per-feature index of the first valid column ≥ k. [F, W] -> [F]."""
    W = obs_valid.shape[1]
    cols = jnp.arange(W)
    masked = jnp.where((obs_valid > 0) & (cols[None, :] >= k), cols[None, :], W)
    return jnp.min(masked, axis=1).astype(jnp.int32)


def slide_oldest(fw: FeatureWindow, x: WindowState, rho: jax.Array):
    """MARGIN_OLD slide: drop frame 0, shift columns left.

    Features anchored at frame 0 re-anchor to their next observation (rho
    transformed through world space); features left with < 2 observations
    are invalidated. Returns the slid table + rho (anchor indices already in
    new coordinates).
    """
    # 1. re-anchor features anchored at 0 to their first obs >= 1 (old coords)
    need = (fw.anchor == 0) & (fw.track_valid > 0)
    next_anchor = first_valid_after(fw.obs_valid, 1)
    has_next = next_anchor < fw.ray.shape[1]
    fw2, rho2 = reanchor(fw, x, rho, need & has_next,
                         jnp.minimum(next_anchor, fw.ray.shape[1] - 1))
    track = jnp.where(need & ~has_next, 0.0, fw2.track_valid)

    # 2. shift all columns left by one
    def shl(a):
        return jnp.concatenate([a[:, 1:], jnp.zeros_like(a[:, :1])], axis=1)

    fw3 = fw2._replace(
        ray=shl(fw2.ray), vel=shl(fw2.vel), depth=shl(fw2.depth),
        obs_valid=shl(fw2.obs_valid),
        anchor=jnp.maximum(fw2.anchor - 1, 0),
        track_valid=track,
    )
    # 3. drop tracks with < 2 remaining obs? (keep 1-obs tracks alive: they
    # may gain obs; they simply contribute nothing — landmark_mask excludes
    # them from optimization.)
    nobs = jnp.sum(fw3.obs_valid, axis=1)
    fw3 = fw3._replace(track_valid=jnp.where(nobs < 1, 0.0, fw3.track_valid))
    return fw3, rho2


def slide_second_newest(fw: FeatureWindow, x: WindowState, rho: jax.Array):
    """MARGIN_SECOND_NEW: discard frame W-2's observations, move frame W-1
    into its place. Features anchored at W-2 re-anchor (through world space)
    to the surviving newest frame."""
    F, W, _ = fw.ray.shape
    dtype = fw.ray.dtype
    last, second = W - 1, W - 2

    need = (fw.anchor == second) & (fw.track_valid > 0)
    # re-anchor to the newest frame if observed there, else invalidate
    obs_last = fw.obs_valid[:, last] > 0
    fw2, rho2 = reanchor(fw, x, rho, need & obs_last,
                         jnp.full((F,), last, jnp.int32))
    track = jnp.where(need & ~obs_last, 0.0, fw2.track_valid)

    # move column: W-2 <- W-1, clear W-1
    def mv(a):
        a = a.at[:, second].set(a[:, last])
        return a.at[:, last].set(jnp.zeros_like(a[:, last]))

    anchor = jnp.where(fw2.anchor == last, second, fw2.anchor)
    fw3 = fw2._replace(
        ray=mv(fw2.ray), vel=mv(fw2.vel), depth=mv(fw2.depth),
        obs_valid=mv(fw2.obs_valid), anchor=anchor, track_valid=track,
    )
    nobs = jnp.sum(fw3.obs_valid, axis=1)
    fw3 = fw3._replace(track_valid=jnp.where(nobs < 1, 0.0, fw3.track_valid))
    return fw3, rho2


def parallax_keyframe_test(fw: FeatureWindow, min_parallax: float,
                           min_tracked: int = 20):
    """Keyframe decision (reference addFeatureCheckParallax): mean parallax
    between frames W-3 and W-2 among co-observed features, or too few long
    tracks ⇒ keyframe (MARGIN_OLD)."""
    W = fw.ray.shape[1]
    i, j = W - 3, W - 2
    co = (fw.obs_valid[:, i] > 0) & (fw.obs_valid[:, j] > 0) & (fw.track_valid > 0)
    du = fw.ray[:, j] - fw.ray[:, i]
    par = jnp.linalg.norm(du, axis=-1)
    n_co = jnp.sum(co)
    mean_par = jnp.sum(jnp.where(co, par, 0.0)) / jnp.maximum(n_co, 1)
    is_kf = (n_co < min_tracked) | (mean_par >= min_parallax)
    return is_kf, mean_par, n_co


def triangulate(fw: FeatureWindow, x: WindowState, rho: jax.Array,
                uninit: jax.Array | None = None):
    """Multi-view DLT triangulation for features without a depth estimate.

    For every feature, accumulate the 4x4 DLT normal matrix over its
    observations (two rows per obs) and take the smallest-eigenvector
    solution — all features solved in parallel (reference
    ``FeatureManager::triangulate`` does this per-feature with SVD).
    Only updates rho for tracks with ≥ 2 obs, no depth fix, and rho
    uninitialized (≤ 0 or default)."""
    F, W, _ = fw.ray.shape
    dtype = fw.ray.dtype
    q_wc, t_wc = _cam_pose(x)
    R_cw = lie.quat_to_mat(lie.quat_conj(q_wc))              # [W, 3, 3]
    t_cw = -jnp.einsum("wij,wj->wi", R_cw, t_wc)             # [W, 3]
    # projection rows: for obs (u, v): r0 = u*P2 - P0, r1 = v*P2 - P1
    P = jnp.concatenate([R_cw, t_cw[:, :, None]], axis=-1)   # [W, 3, 4]
    u = fw.ray[..., 0][..., None]                             # [F, W, 1]
    v = fw.ray[..., 1][..., None]
    r0 = u * P[None, :, 2] - P[None, :, 0]                   # [F, W, 4]
    r1 = v * P[None, :, 2] - P[None, :, 1]
    m = fw.obs_valid[..., None]
    A = jnp.concatenate([r0 * m, r1 * m], axis=1)            # [F, 2W, 4]
    N = jnp.einsum("fki,fkj->fij", A, A)                     # [F, 4, 4]
    wvals, V = jnp.linalg.eigh(N)
    h = V[..., 0]                                             # smallest eig
    p_w = h[:, :3] / jnp.where(jnp.abs(h[:, 3:]) > 1e-8, h[:, 3:], 1e-8)

    # depth in anchor frame
    a = fw.anchor
    p_ca = jnp.einsum("fij,fj->fi", R_cw[a], p_w) + t_cw[a]
    z = p_ca[:, 2]
    nobs = jnp.sum(fw.obs_valid, axis=1)
    needs = (fw.track_valid > 0) & (fw.depth_fixed == 0) & (nobs >= 2)
    if uninit is not None:
        needs = needs & (uninit > 0)
    ok = (z > 0.1) & (z < 100.0)
    done = needs & ok
    rho_new = jnp.where(done, 1.0 / jnp.maximum(z, 1e-2), rho)
    return rho_new, done


def outlier_mask(fw: FeatureWindow, x: WindowState, px_thresh: float,
                 focal: float = 460.0):
    """Per-landmark outlier test after the solve (reference
    ``removeOutlier`` / ``movingConsistencyCheckW``,
    ``estimator.cpp:1159-1183, 4030``): mean reprojection error of each
    track at the solved state; tracks above ``px_thresh`` pixels are killed.

    Returns keep [F] {0,1} (1 also for tracks with no scoreable obs)."""
    from ..factors.vio_factors import projection_residuals

    r, w = projection_residuals(x, to_factor_table(fw), 1.0, huber_delta=1e9)
    # r: [F, W, 2] in normalized-plane units (sqrt_info = 1)
    err = jnp.linalg.norm(r, axis=-1) * focal            # px
    wobs = w[..., 0]
    cnt = jnp.sum(wobs, axis=1)
    mean_err = jnp.sum(err * wobs, axis=1) / jnp.maximum(cnt, 1.0)
    bad = (mean_err > px_thresh) & (cnt >= 1)
    return 1.0 - bad.astype(fw.track_valid.dtype)


def to_factor_table(fw: FeatureWindow):
    """View as the solver's FeatureTable (import-cycle-free adapter)."""
    from ..factors.vio_factors import FeatureTable
    return FeatureTable(
        ray=fw.ray, vel=fw.vel, obs_valid=fw.obs_valid, anchor=fw.anchor,
        track_valid=fw.track_valid, depth_fixed=fw.depth_fixed,
    )
