"""Continuous-time point-to-plane ICP against the voxel map — one jitted solve.

Rebuild of the reference CT-ICP (``lio/src/liw/lio/lidarodom.cpp:472-1086``):
the scan pose is a (begin, end) SE(3) pair; every point is expressed at its
``alpha`` ∈ [0,1] sweep time by slerp/lerp between them; residuals are
a2D-weighted point-to-plane distances to planes fit from the map's kNN, plus
the reference's regularizers (location consistency of the begin pose,
constant-velocity, orientation smoothness — ``lidarFactor.h:260-618``).

Each outer iteration re-associates (kNN + plane fit) and takes one damped
GN step on the 12-dim tangent via ``jacfwd`` — the reference's
10×(5 LM iters, 3 threads) Ceres loop becomes a fixed-trip-count scan of
dense 12-dim solves. Degeneracy is the SVD of the weighted normals
(``checkLocalizability``, thresholds ``lidarodom.cpp:845-848``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from . import voxel_map as vm


class CtIcpConfig(NamedTuple):
    outer_iters: int = 6
    max_corr_dist: float = 0.5      # reject correspondences beyond this
    min_planarity: float = 0.2      # a2D gate
    beta_location: float = 0.001    # reference beta_location_consistency
    beta_velocity: float = 0.001    # beta_constant_velocity
    beta_orientation: float = 0.0   # orientation consistency
    damping: float = 1e-3
    deg_sigma_min: float = 7.0      # reference MID360 thresholds
    deg_sigma_mean: float = 10.0
    min_normals: int = 10
    # convergence early-exit thresholds (reference thres_translation_norm /
    # thres_orientation_norm, lio/config/m3dgr.yaml:53-54): once a step
    # falls below both, later iterations of the fixed-trip-count scan are
    # frozen — the reference's <=10-with-early-exit semantics in a static
    # XLA shape
    conv_trans: float = 0.01        # metres
    conv_rot_deg: float = 0.1       # degrees


class CtPose(NamedTuple):
    q_begin: jax.Array
    t_begin: jax.Array
    q_end: jax.Array
    t_end: jax.Array


def transform_points(pose: CtPose, pts_body: jax.Array, alpha: jax.Array):
    """Per-point continuous-time transform (reference transformKeypoints)."""
    q = lie.quat_slerp(pose.q_begin[None], pose.q_end[None], alpha)
    t = (1.0 - alpha)[:, None] * pose.t_begin[None] + alpha[:, None] * pose.t_end[None]
    return lie.quat_rotate(q, pts_body) + t


def _retract(pose: CtPose, d: jax.Array) -> CtPose:
    return CtPose(
        q_begin=lie.quat_boxplus(pose.q_begin, d[0:3]),
        t_begin=pose.t_begin + d[3:6],
        q_end=lie.quat_boxplus(pose.q_end, d[6:9]),
        t_end=pose.t_end + d[9:12])


class IcpResult(NamedTuple):
    pose: CtPose
    n_corr: jax.Array          # effective correspondences (weighted count)
    sigma: jax.Array           # [3] singular values of the normal matrix
    degenerate: jax.Array      # bool
    cost: jax.Array


@partial(jax.jit, static_argnums=(4, 5))
def ct_icp(
    pose0: CtPose,
    pts_body: jax.Array,       # [K, 3] keypoints in sensor/body frame
    alpha: jax.Array,          # [K] sweep fraction per point
    kp_mask: jax.Array,        # [K]
    cfg: CtIcpConfig,
    map_cfg: vm.VoxelMapConfig,
    vmap: vm.VoxelMap,
    pred: CtPose | None = None,
) -> IcpResult:
    """Scan-to-map registration. ``pred`` anchors the regularizers (the
    ESKF-predicted begin/end poses; defaults to ``pose0``)."""
    if pred is None:
        pred = pose0
    dtype = pts_body.dtype
    K = pts_body.shape[0]

    # candidate gather at the predicted pose (searchsorted + the big
    # [K, 27*gk] gather are the expensive half of the neighbor search);
    # each iteration re-ranks the same candidates — per-iteration pose
    # deltas are cm-scale vs the 0.2 m of voxel padding already gathered.
    # If the pose moves beyond half a voxel mid-solve (hard/large-motion
    # scans — the reference re-searches every iteration,
    # ``searchNeighbors`` ``lidarodom.cpp:1087-1165``), a ``lax.cond``
    # re-gathers once at the halfway point; the branch costs nothing on
    # the normal ESKF-seeded tick.
    p_w0 = transform_points(pose0, pts_body, alpha)
    cand, cand_mask = vm.gather_candidates(vmap, p_w0, map_cfg)

    def assoc(pose, cand, cand_mask):
        p_w = transform_points(pose, pts_body, alpha)
        neigh, nmask = vm.knn_from_candidates(p_w, cand, cand_mask,
                                              map_cfg.knn)
        normal, centroid, a2d, valid = vm.fit_planes(neigh, nmask)
        dist = jnp.abs(jnp.sum((p_w - centroid) * normal, axis=-1))
        w = (kp_mask
             * valid.astype(dtype)
             * (a2d > cfg.min_planarity).astype(dtype)
             * (dist < cfg.max_corr_dist).astype(dtype)
             * a2d * a2d)
        return normal, centroid, w

    def gn_iter(carry, _):
        pose, _, _, cand, cand_mask = carry
        normal, centroid, w = assoc(pose, cand, cand_mask)

        def residuals(d):
            p = _retract(pose, d)
            p_w = transform_points(p, pts_body, alpha)
            r_plane = jnp.sum((p_w - centroid) * normal, axis=-1) * w
            r_loc = (p.t_begin - pred.t_begin) * cfg.beta_location * K
            r_vel = ((p.t_end - p.t_begin) - (pred.t_end - pred.t_begin)) \
                * cfg.beta_velocity * K
            r_ori = lie.quat_boxminus(p.q_end, p.q_begin) * cfg.beta_orientation * K
            return jnp.concatenate([r_plane, r_loc, r_vel, r_ori])

        zero = jnp.zeros((12,), dtype)
        r = residuals(zero)
        J = jax.jacfwd(residuals)(zero)
        H = J.T @ J
        g = J.T @ r
        damped = H + jnp.eye(12, dtype=dtype) * (
            cfg.damping * jnp.maximum(jnp.max(jnp.diagonal(H)), 1.0))
        d = -jnp.linalg.solve(damped, g)
        d = d * (1.0 - carry[2])           # frozen once converged
        dt_norm = jnp.maximum(jnp.linalg.norm(d[3:6]),
                              jnp.linalg.norm(d[9:12]))
        dth_norm = jnp.maximum(jnp.linalg.norm(d[0:3]),
                               jnp.linalg.norm(d[6:9]))
        done = jnp.maximum(
            carry[2],
            ((dt_norm < cfg.conv_trans)
             & (dth_norm < jnp.deg2rad(cfg.conv_rot_deg))).astype(dtype))
        return (_retract(pose, d), 0.5 * jnp.sum(r * r), done,
                cand, cand_mask), None

    n1 = min(max(cfg.outer_iters // 2, 1), cfg.outer_iters)
    carry0 = (pose0, jnp.zeros((), dtype), jnp.zeros((), dtype),
              cand, cand_mask)
    carry1, _ = jax.lax.scan(gn_iter, carry0, None, length=n1)
    pose_mid = carry1[0]
    moved = jnp.maximum(
        jnp.linalg.norm(pose_mid.t_begin - pose0.t_begin),
        jnp.linalg.norm(pose_mid.t_end - pose0.t_end))

    def regather(_):
        p_w = transform_points(pose_mid, pts_body, alpha)
        return vm.gather_candidates(vmap, p_w, map_cfg)

    regathered = moved > 0.5 * map_cfg.voxel_size
    cand2, cmask2 = jax.lax.cond(
        regathered, regather, lambda _: (cand, cand_mask), None)
    # a re-association invalidates the convergence latch: a pose that
    # stalled against stale candidates must keep iterating
    done_mid = jnp.where(regathered, 0.0, carry1[2])
    carry1 = (pose_mid, carry1[1], done_mid, cand2, cmask2)
    (pose, cost, _, cand, cand_mask), _ = jax.lax.scan(
        gn_iter, carry1, None, length=cfg.outer_iters - n1)

    # degeneracy: SVD of the accepted normals (reference checkLocalizability)
    normal, centroid, w = assoc(pose, cand, cand_mask)
    sel = (w > 0).astype(dtype)
    n_sel = jnp.sum(sel)
    A = jnp.einsum("k,ki,kj->ij", sel, normal, normal)
    evals = jnp.linalg.eigvalsh(A)                  # ascending
    sigma = jnp.sqrt(jnp.maximum(evals[::-1], 0.0))  # descending singulars
    degenerate = (
        (jnp.mean(sigma) < cfg.deg_sigma_mean)
        | (sigma[2] < cfg.deg_sigma_min)
        | (n_sel <= cfg.min_normals))
    return IcpResult(pose=pose, n_corr=n_sel, sigma=sigma,
                     degenerate=degenerate, cost=cost)
