"""Fixed-capacity sorted-code voxel map — the TPU-native voxel hash.

The reference keeps the LiDAR map in ``tsl::robin_map<voxel, vector<pt>>``
(``lio/src/liw/lio/lidarodom.cpp:1167-1284``: 0.2 m voxels, ≤ 20 pts/voxel,
0.05 m min spacing, FOV eviction). Pointer-chasing hash maps don't exist on
TPU; instead the map is a flat ``[N, 3]`` point array with packed int32
voxel codes kept **sorted by code**:

  * insertion  = concat + two stable argsorts (lexicographic by
    (voxel, subcell)) + masked dedup/cap + compaction — all O(N log N)
    sorts, XLA's bread and butter;
  * min-spacing = first-point-per-0.05 m-subcell (64 subcells per voxel);
  * query      = ``searchsorted`` of the 27 neighbor-voxel codes + a fixed
    per-voxel gather window — no data-dependent shapes anywhere;
  * eviction   = code overwrite to INVALID + re-sort.

Coordinates pack into 10 bits/axis ⇒ ±102.4 m local map at 0.2 m voxels
(re-centering handles longer trajectories; the reference's 500 m eviction
radius is effectively local too).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

INVALID = jnp.int32(2**31 - 1)
BITS = 10
HALF = 1 << (BITS - 1)          # 512 voxels each side of origin
SUB = 4                          # 4^3 = 64 subcells per voxel (min spacing)


class VoxelMapConfig(NamedTuple):
    capacity: int = 1 << 17      # max stored points
    voxel_size: float = 0.2
    max_per_voxel: int = 20      # raw cap per voxel at insert
    gather_k: int = 8            # gathered points per neighbor voxel at query
    knn: int = 20                # nearest neighbors for plane fit
    max_range: float = 80.0      # eviction radius


class VoxelMap(NamedTuple):
    pts: jax.Array      # [N, 3]
    code: jax.Array     # [N] int32, INVALID for empty slots, sorted
    origin: jax.Array   # [3] map recentering origin

    @staticmethod
    def empty(cfg: VoxelMapConfig, dtype=jnp.float32) -> "VoxelMap":
        n = cfg.capacity
        return VoxelMap(
            pts=jnp.zeros((n, 3), dtype),
            code=jnp.full((n,), INVALID, jnp.int32),
            origin=jnp.zeros((3,), dtype))


def _coords(pts, origin, voxel_size):
    return jnp.floor((pts - origin[None]) / voxel_size).astype(jnp.int32)


def _pack(ijk):
    """[..., 3] voxel coords -> int32 code; out-of-range -> INVALID."""
    shifted = ijk + HALF
    ok = jnp.all((shifted >= 0) & (shifted < (1 << BITS)), axis=-1)
    code = (shifted[..., 0] | (shifted[..., 1] << BITS)
            | (shifted[..., 2] << (2 * BITS)))
    return jnp.where(ok, code, INVALID)


def _subcell(pts, origin, voxel_size):
    rel = (pts - origin[None]) / voxel_size
    frac = rel - jnp.floor(rel)
    sub = jnp.clip((frac * SUB).astype(jnp.int32), 0, SUB - 1)
    return sub[..., 0] | (sub[..., 1] << 2) | (sub[..., 2] << 4)


@partial(jax.jit, static_argnums=(3,))
def insert(vmap: VoxelMap, new_pts: jax.Array, new_mask: jax.Array,
           cfg: VoxelMapConfig, center: jax.Array | None = None) -> VoxelMap:
    """Insert masked new points, dedup at subcell resolution, cap per voxel,
    keep the map sorted. Existing points win ties (stable sorts).

    ``center`` (the current pose): on capacity overflow the points farthest
    from it are dropped — the reference evicts by distance
    (``lidarodom.cpp:1268``), and the naive truncation of the final
    code-sorted array would instead drop the largest packed codes (the
    +x/+y/+z map corner), carving a directional hole on long dense runs.
    Without ``center`` overflow falls back to code-order truncation."""
    n, m = vmap.pts.shape[0], new_pts.shape[0]
    new_code = jnp.where(new_mask > 0,
                         _pack(_coords(new_pts, vmap.origin, cfg.voxel_size)),
                         INVALID)
    pts = jnp.concatenate([vmap.pts, new_pts])
    code = jnp.concatenate([vmap.code, new_code])
    sub = _subcell(pts, vmap.origin, cfg.voxel_size)

    # lexicographic stable sort: secondary key first, then primary
    order1 = jnp.argsort(sub, stable=True)
    pts, code, sub = pts[order1], code[order1], sub[order1]
    order2 = jnp.argsort(code, stable=True)
    pts, code, sub = pts[order2], code[order2], sub[order2]

    total = n + m
    idx = jnp.arange(total)
    new_voxel = jnp.concatenate(
        [jnp.ones((1,), bool), code[1:] != code[:-1]])
    new_subcell = new_voxel | jnp.concatenate(
        [jnp.ones((1,), bool), sub[1:] != sub[:-1]])
    seg_start = jax.lax.cummax(jnp.where(new_voxel, idx, 0))
    pos_in_voxel = idx - seg_start

    keep = (new_subcell
            & (pos_in_voxel < cfg.max_per_voxel)
            & (code != INVALID))
    code = jnp.where(keep, code, INVALID)

    if center is not None:
        # Overflow-by-distance (the reference's only eviction criterion,
        # ``lidarodom.cpp:1268``): rank surviving points by distance to
        # ``center``; the nearest ``n`` keep their codes.  NOTE the
        # reference's robin_map has NO global capacity — size
        # ``cfg.capacity`` for the scene (voxels within ``max_range`` x
        # per-voxel density); a saturated map sheds its farthest geometry,
        # which can blind the degeneracy check along that axis (coverage-
        # preserving thinning was tried and is worse: ~1 pt/voxel makes
        # every plane-fit neighborhood span multiple surfaces).
        d2 = jnp.sum((pts - center[None]) ** 2, axis=-1)
        key = jnp.where(code != INVALID, d2, jnp.inf)
        order_d = jnp.argsort(key)
        rank = jnp.zeros((total,), jnp.int32).at[order_d].set(
            jnp.arange(total, dtype=jnp.int32))
        code = jnp.where(rank < n, code, INVALID)

    # compact: valid entries to the front, sorted by code
    order3 = jnp.argsort(code, stable=True)
    pts, code = pts[order3], code[order3]
    return VoxelMap(pts=pts[:n], code=code[:n], origin=vmap.origin)


@partial(jax.jit, static_argnums=(2,))
def recenter(vmap: VoxelMap, center: jax.Array, cfg: VoxelMapConfig
             ) -> VoxelMap:
    """Move the packing origin to (voxel-aligned) ``center`` and re-key every
    stored point — one repack + sort. The 10-bit/axis packing covers
    ±102.4 m around ``origin`` at 0.2 m voxels; recentering when the pose
    approaches the boundary gives the map unlimited extent (the reference's
    map is similarly local via its 500 m eviction,
    ``lidarodom.cpp:1268`` lasermap_fov_segment)."""
    # snap to the voxel grid so subcell fractions are preserved exactly
    new_origin = jnp.floor(center / cfg.voxel_size) * cfg.voxel_size
    live = vmap.code != INVALID
    code = jnp.where(
        live, _pack(_coords(vmap.pts, new_origin, cfg.voxel_size)), INVALID)
    order = jnp.argsort(code, stable=True)
    return VoxelMap(pts=vmap.pts[order], code=code[order], origin=new_origin)


def needs_recenter(vmap: VoxelMap, center, cfg: VoxelMapConfig,
                   margin_frac: float = 0.5) -> bool:
    """Host-side trigger: pose farther than ``margin_frac`` of the packing
    half-extent from the map origin."""
    import numpy as np
    half_extent = HALF * cfg.voxel_size
    d = np.abs(np.asarray(center) - np.asarray(vmap.origin))
    return bool(d.max() > margin_frac * half_extent)


@partial(jax.jit, static_argnums=(2,))
def evict_far(vmap: VoxelMap, center: jax.Array, cfg: VoxelMapConfig
              ) -> VoxelMap:
    """Drop points beyond ``max_range`` of ``center`` (reference
    ``lasermap_fov_segment``)."""
    d = jnp.linalg.norm(vmap.pts - center[None], axis=-1)
    code = jnp.where((d < cfg.max_range) & (vmap.code != INVALID),
                     vmap.code, INVALID)
    order = jnp.argsort(code, stable=True)
    return VoxelMap(pts=vmap.pts[order], code=code[order], origin=vmap.origin)


import numpy as _np

# 3^3 neighborhood offsets as a host constant (a jnp array created inside a
# jit trace would leak a tracer through this module-level cache)
_NBR_NP = _np.stack(
    _np.meshgrid([-1, 0, 1], [-1, 0, 1], [-1, 0, 1], indexing="ij"),
    -1).reshape(-1, 3).astype(_np.int32)


def _neighbor_offsets():
    return jnp.asarray(_NBR_NP)


@partial(jax.jit, static_argnums=(2,))
def gather_candidates(vmap: VoxelMap, queries: jax.Array,
                      cfg: VoxelMapConfig):
    """All candidate map points from each query's 3³ voxel neighborhood:
    [Q, 3] -> (cand [Q, 27*gather_k, 3], cand_mask [Q, 27*gather_k]).

    The searchsorted + big gather is the expensive half of the neighbor
    search; CT-ICP calls this ONCE per scan (at the predicted pose) and
    re-ranks the same candidates each iteration as the pose refines — the
    per-iteration pose deltas are centimetres, far smaller than the 0.2 m
    voxel padding the 27-neighborhood already provides."""
    Q = queries.shape[0]
    gk = cfg.gather_k
    ijk = _coords(queries, vmap.origin, cfg.voxel_size)      # [Q, 3]
    nbr = ijk[:, None, :] + _neighbor_offsets()[None]        # [Q, 27, 3]
    codes = _pack(nbr)                                       # [Q, 27]

    start = jnp.searchsorted(vmap.code, codes, side="left")  # [Q, 27]
    end = jnp.searchsorted(vmap.code, codes, side="right")
    # out-of-range neighbor codes must not match the INVALID run of empties
    end = jnp.where(codes == INVALID, start, end)
    span = jnp.arange(gk)                                    # [gk]
    gather_idx = start[..., None] + span[None, None, :]      # [Q, 27, gk]
    valid = gather_idx < end[..., None]
    gather_idx = jnp.clip(gather_idx, 0, vmap.pts.shape[0] - 1)
    cand = vmap.pts[gather_idx.reshape(-1)].reshape(Q, 27 * gk, 3)
    return cand, valid.reshape(Q, 27 * gk)


@partial(jax.jit, static_argnums=(3,))
def knn_from_candidates(queries: jax.Array, cand: jax.Array,
                        cand_mask: jax.Array, k: int):
    """k nearest of the candidate set per query (fixed shapes)."""
    d2 = jnp.sum((cand - queries[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(cand_mask, d2, jnp.inf)
    neg, top_idx = jax.lax.top_k(-d2, k)                     # [Q, k]
    neigh = jnp.take_along_axis(cand, top_idx[..., None], axis=1)
    nmask = jnp.isfinite(-neg)
    return neigh, nmask


@partial(jax.jit, static_argnums=(2,))
def knn_gather(vmap: VoxelMap, queries: jax.Array, cfg: VoxelMapConfig):
    """k nearest map points for each query from its 3³ voxel neighborhood.

    queries: [Q, 3] -> (neigh_pts [Q, k, 3], neigh_mask [Q, k]) sorted by
    distance (reference ``searchNeighbors`` semantics, fixed shapes).
    """
    cand, vmask = gather_candidates(vmap, queries, cfg)
    return knn_from_candidates(queries, cand, vmask, cfg.knn)


def fit_planes(neigh: jax.Array, nmask: jax.Array, min_pts: int = 5):
    """Per-query plane fit from the kNN set (reference
    ``computeNeighborhoodDistribution``): centroid + covariance eigen.

    Closed-form 3x3 eigensolver (``core.eig3``) instead of the iterative
    ``jnp.linalg.eigh`` — ~10x faster on TPU for 2048-batches and called
    once per ICP iteration.

    Returns (normal [Q,3], centroid [Q,3], planarity a2D [Q], valid [Q]).
    """
    from ..core.eig3 import sym_eig3_smallest
    w = nmask.astype(neigh.dtype)
    cnt = jnp.sum(w, axis=1)
    cnt_safe = jnp.maximum(cnt, 1.0)
    mean = jnp.sum(neigh * w[..., None], axis=1) / cnt_safe[..., None]
    d = (neigh - mean[:, None, :]) * w[..., None]
    cov = jnp.einsum("qki,qkj->qij", d, d) / cnt_safe[..., None, None]
    evals, normal = sym_eig3_smallest(cov)                   # ascending
    s = jnp.sqrt(jnp.maximum(evals, 1e-12))
    a2d = (s[..., 1] - s[..., 0]) / jnp.maximum(s[..., 2], 1e-9)
    valid = cnt >= min_pts
    return normal, mean, a2d, valid
