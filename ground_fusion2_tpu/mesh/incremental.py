"""Online incremental mesh reconstruction — the TPU-native ImMesh analog.

The reference's mesh subsystem (``mesh/src/ImMesh_mesh_reconstruction.cpp:
102-560``) consumes world-frame LiDAR scans + images + fused poses and
maintains (a) a global colored point map with hash-grid dedup and per-point
Bayesian RGB updates (r3live lineage, ``mesh/src/meshing/r3live/
pointcloud_rgbd.cpp``), and (b) a per-voxel 2D-projected Delaunay
retriangulation with a triangle-manager diff (``openCV_subdiv2d_index.hpp``).
That design is pointer-chasing (ikd-tree, Subdiv2D, robin maps) and cannot
run on a TPU.

This module re-designs it fixed-shape:

  * **vertex store** — flat ``[N]`` arrays (position, rgb, weight, stable
    vertex id) keyed by packed voxel codes kept *sorted* (same sorted-code
    idiom as ``lio/voxel_map.py``); insertion with min-spacing dedup is
    concat + stable sorts + masked compaction, one jitted program;
  * **texturing** — one jitted pass projecting every vertex into the frame
    and bilinearly sampling it, with a capped running-weight color update
    (the ``RGB_pts::update_rgb`` rule without per-point locks);
  * **retriangulation** — for each dirty voxel, gather its points plus the
    6 face-neighbor voxels' points (seam coverage, the reason ImMesh pulls
    neighbor points too), PCA-project to the local plane, and compute the
    2D Delaunay triangulation by brute-force empty-circumcircle tests over
    a *fixed* set of C(M,3) candidate triples — a dense, vmappable batch of
    3x3 determinants instead of an incremental flip structure.  Triangle
    ownership (centroid inside the dirty voxel) replaces the triangle-
    manager diff: each triangle is emitted by exactly one voxel, so
    re-triangulating a voxel atomically replaces its triangle set.

Only the per-voxel triangle *registry* (a dict keyed by voxel code) lives
on the host — it is write-only output, never read back by any estimator.
All geometry math is jitted.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

BITS = 10
HALF = 1 << (BITS - 1)
SUB = 4                          # 4^3 subcells per voxel for min spacing
INVALID = jnp.int32(2**31 - 1)


class MeshConfig(NamedTuple):
    capacity: int = 1 << 16      # max stored vertices
    voxel_size: float = 0.5      # triangulation cell (>= map voxel)
    max_per_voxel: int = 12      # vertex cap per voxel at insert
    gather_k: int = 12           # per-voxel gather window at retriangulation
    cand: int = 32               # candidate vertices per triangulated voxel
    tri_cap: int = 48            # triangle slots per voxel
    dirty_batch: int = 32        # voxels retriangulated per device call
    insert_chunk: int = 4096     # fixed host->device insert batch
    rgb_max_weight: float = 16.0  # cap on the running color weight
    min_z: float = 0.1           # camera near plane for texturing


class MeshMap(NamedTuple):
    pts: jax.Array      # [N, 3] world-frame vertex positions
    rgb: jax.Array      # [N, 3] float color 0..255
    w: jax.Array        # [N] running color weight
    pw: jax.Array       # [N] position observation count (running mean)
    obs_dist: jax.Array  # [N] min observation distance (occlusion gate)
    vid: jax.Array      # [N] stable int32 vertex id (survives re-sorts)
    code: jax.Array     # [N] packed voxel code, INVALID empty, sorted
    origin: jax.Array   # [3] packing origin
    next_vid: jax.Array  # [] int32

    @staticmethod
    def empty(cfg: MeshConfig, origin=None, dtype=jnp.float32) -> "MeshMap":
        n = cfg.capacity
        o = jnp.zeros((3,), dtype) if origin is None else jnp.asarray(
            origin, dtype)
        return MeshMap(
            pts=jnp.zeros((n, 3), dtype),
            rgb=jnp.zeros((n, 3), dtype),
            w=jnp.zeros((n,), dtype),
            pw=jnp.zeros((n,), dtype),
            obs_dist=jnp.full((n,), 1e9, dtype),
            vid=jnp.full((n,), -1, jnp.int32),
            code=jnp.full((n,), INVALID, jnp.int32),
            origin=o,
            next_vid=jnp.int32(0))


def _coords(pts, origin, voxel_size):
    return jnp.floor((pts - origin[None]) / voxel_size).astype(jnp.int32)


def _pack(ijk):
    shifted = ijk + HALF
    ok = jnp.all((shifted >= 0) & (shifted < (1 << BITS)), axis=-1)
    code = (shifted[..., 0] | (shifted[..., 1] << BITS)
            | (shifted[..., 2] << (2 * BITS)))
    return jnp.where(ok, code, INVALID)


def _unpack(code):
    m = (1 << BITS) - 1
    return jnp.stack([(code & m) - HALF,
                      ((code >> BITS) & m) - HALF,
                      ((code >> (2 * BITS)) & m) - HALF], axis=-1)


def _subcell(pts, origin, voxel_size):
    rel = (pts - origin[None]) / voxel_size
    frac = rel - jnp.floor(rel)
    sub = jnp.clip((frac * SUB).astype(jnp.int32), 0, SUB - 1)
    return sub[..., 0] | (sub[..., 1] << 2) | (sub[..., 2] << 4)


# --------------------------------------------------------------------------
# vertex store
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(3,))
def insert(mesh: MeshMap, new_pts: jax.Array, new_mask: jax.Array,
           cfg: MeshConfig):
    """Append masked world-frame points: min-spacing dedup at subcell
    resolution, per-voxel cap, stable vertex ids for survivors.  Existing
    vertices always win ties (the hash-grid dedup of
    ``pointcloud_rgbd.cpp`` append semantics).

    Returns ``(mesh, evicted_codes)``: ``evicted_codes`` [m] holds the voxel
    codes of live vertices dropped by the capacity truncation (INVALID
    entries = no eviction) so the caller can prune/dirty those voxels.

    The surviving vertex of each subcell takes the *running mean* of all
    observations that fell into it (weighted by prior observation count
    ``pw``) — repeated scans of a surface denoise its vertices, the
    fixed-shape analog of r3live's per-point Bayesian position update."""
    n, m = mesh.pts.shape[0], new_pts.shape[0]
    new_code = jnp.where(new_mask > 0,
                         _pack(_coords(new_pts, mesh.origin, cfg.voxel_size)),
                         INVALID)
    new_vid = mesh.next_vid + jnp.arange(m, dtype=jnp.int32)
    pts = jnp.concatenate([mesh.pts, new_pts.astype(mesh.pts.dtype)])
    rgb = jnp.concatenate([mesh.rgb, jnp.zeros((m, 3), mesh.rgb.dtype)])
    w = jnp.concatenate([mesh.w, jnp.zeros((m,), mesh.w.dtype)])
    pw = jnp.concatenate([mesh.pw, (new_code != INVALID).astype(mesh.pw.dtype)])
    od = jnp.concatenate([mesh.obs_dist,
                          jnp.full((m,), 1e9, mesh.obs_dist.dtype)])
    vid = jnp.concatenate([mesh.vid, new_vid])
    code = jnp.concatenate([mesh.code, new_code])
    sub = _subcell(pts, mesh.origin, cfg.voxel_size)

    def permute(order):
        nonlocal pts, rgb, w, pw, od, vid, code, sub
        pts, rgb, w, pw, od = (pts[order], rgb[order], w[order], pw[order],
                               od[order])
        vid, code, sub = vid[order], code[order], sub[order]

    permute(jnp.argsort(sub, stable=True))
    permute(jnp.argsort(code, stable=True))

    idx = jnp.arange(n + m)
    new_voxel = jnp.concatenate(
        [jnp.ones((1,), bool), code[1:] != code[:-1]])
    new_subcell = new_voxel | jnp.concatenate(
        [jnp.ones((1,), bool), sub[1:] != sub[:-1]])
    # per-voxel cap over SURVIVING rows only: rank = number of kept
    # (subcell-distinct) rows before this one within the voxel segment.
    # Counting raw rows (idx - seg_start) would let dedup-dropped duplicates
    # evict live vertices on idempotent re-insert.
    seg_start = jax.lax.cummax(jnp.where(new_voxel, idx, 0))
    csum = jnp.cumsum(new_subcell.astype(jnp.int32))
    rank = csum - csum[seg_start]                 # 0 for the segment's first
    keep = (new_subcell & (rank < cfg.max_per_voxel)
            & (code != INVALID))

    # running-mean position over each subcell segment (valid rows only)
    seg_id = csum - 1                              # [n+m] subcell segment ids
    pwv = jnp.where(code != INVALID, pw, 0.0)
    seg_pw = jax.ops.segment_sum(pwv, seg_id, num_segments=n + m)
    seg_px = jax.ops.segment_sum(pts * pwv[:, None], seg_id,
                                 num_segments=n + m)
    mean_pts = seg_px[seg_id] / jnp.maximum(seg_pw[seg_id], 1.0)[:, None]
    pts = jnp.where(keep[:, None], mean_pts, pts)
    pw = jnp.where(keep, jnp.minimum(seg_pw[seg_id], 1e4), pw)

    code = jnp.where(keep, code, INVALID)
    permute(jnp.argsort(code, stable=True))
    # rows beyond capacity are evicted; report any that were still live
    evicted_codes = code[n:]
    return MeshMap(pts=pts[:n], rgb=rgb[:n], w=w[:n], pw=pw[:n],
                   obs_dist=od[:n], vid=vid[:n], code=code[:n],
                   origin=mesh.origin,
                   next_vid=mesh.next_vid + m), evicted_codes


@partial(jax.jit, static_argnums=(5,))
def update_rgb(mesh: MeshMap, image: jax.Array, intr: jax.Array,
               r_wc: jax.Array, t_wc: jax.Array, cfg: MeshConfig) -> MeshMap:
    """Texture every visible vertex from one frame.

    ``image`` [H, W, 3] float 0..255, ``intr`` = (fx, fy, cx, cy),
    (``r_wc``, ``t_wc``) the camera pose in world.  Bilinear sample +
    capped running mean — the lock-free reinterpretation of
    ``RGB_pts::update_rgb`` (``mesh/src/meshing/r3live/pointcloud_rgbd.cpp``)
    done as one dense pass over the whole store instead of a
    ``cv::parallel_for_`` over voxels.

    Occlusion: each vertex tracks its minimum observation distance; a view
    from much farther than the best one seen so far is likely looking at an
    occluder in front of this vertex, so the color update is skipped
    (reference ``RGB_pts::update_rgb`` obs-distance gate,
    ``pointcloud_rgbd.cpp:138``, margin 1.2x)."""
    H, W = image.shape[0], image.shape[1]
    p_cam = (mesh.pts - t_wc[None]) @ r_wc            # [N, 3], R_wc^T (p - t)
    z = p_cam[:, 2]
    zs = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)
    u = intr[0] * p_cam[:, 0] / zs + intr[2]
    v = intr[1] * p_cam[:, 1] / zs + intr[3]
    dist = jnp.linalg.norm(p_cam, axis=-1)
    vis = ((z > cfg.min_z) & (u >= 0) & (u <= W - 1.001)
           & (v >= 0) & (v <= H - 1.001) & (mesh.code != INVALID)
           & (dist <= mesh.obs_dist * 1.2))
    u = jnp.clip(u, 0.0, W - 1.001)
    v = jnp.clip(v, 0.0, H - 1.001)
    u0, v0 = jnp.floor(u).astype(jnp.int32), jnp.floor(v).astype(jnp.int32)
    fu, fv = u - u0, v - v0
    c00 = image[v0, u0]
    c01 = image[v0, u0 + 1]
    c10 = image[v0 + 1, u0]
    c11 = image[v0 + 1, u0 + 1]
    sample = (c00 * ((1 - fu) * (1 - fv))[:, None]
              + c01 * (fu * (1 - fv))[:, None]
              + c10 * ((1 - fu) * fv)[:, None]
              + c11 * (fu * fv)[:, None])
    add = vis.astype(mesh.w.dtype)
    new_w = mesh.w + add
    rgb = jnp.where(
        vis[:, None],
        (mesh.rgb * mesh.w[:, None] + sample * add[:, None])
        / jnp.maximum(new_w, 1.0)[:, None],
        mesh.rgb)
    obs_dist = jnp.where(vis, jnp.minimum(mesh.obs_dist, dist),
                         mesh.obs_dist)
    return mesh._replace(rgb=rgb,
                         w=jnp.minimum(new_w, cfg.rgb_max_weight),
                         obs_dist=obs_dist)


# --------------------------------------------------------------------------
# per-voxel Delaunay retriangulation
# --------------------------------------------------------------------------

_COMBO_CACHE: dict = {}


def _combos(m: int) -> np.ndarray:
    """All C(m,3) index triples, [C, 3] int32 (static, cached)."""
    if m not in _COMBO_CACHE:
        import itertools
        _COMBO_CACHE[m] = np.array(
            list(itertools.combinations(range(m), 3)), np.int32)
    return _COMBO_CACHE[m]


_NOT_IN_CACHE: dict = {}


def _not_in_triple(m: int) -> np.ndarray:
    """[C, m] bool: test point j is not a vertex of triple c (static)."""
    if m not in _NOT_IN_CACHE:
        combos = _combos(m)
        eq = (combos[:, :, None] == np.arange(m)[None, None, :])
        _NOT_IN_CACHE[m] = ~eq.any(axis=1)
    return _NOT_IN_CACHE[m]


def _delaunay_one(pts: jax.Array, vids: jax.Array, mask: jax.Array,
                  own_code: jax.Array, origin: jax.Array,
                  cfg: MeshConfig):
    """Delaunay-triangulate one voxel's candidate set.

    pts [M, 3], vids [M], mask [M]; returns (tri_vid [T, 3], tri_keep [T]).
    The 2D Delaunay condition is evaluated brute force: a triple survives
    iff no other valid candidate lies strictly inside its circumcircle —
    C(M,3) x M dense determinant tests, ideal for vector units, no
    incremental flip structure (reference uses OpenCV Subdiv2D,
    ``mesh/src/meshing/delaunay/openCV_subdiv2d_index.hpp``)."""
    M = pts.shape[0]
    f = pts.dtype
    wm = mask.astype(f)
    cnt = jnp.maximum(jnp.sum(wm), 1.0)
    mean = jnp.sum(pts * wm[:, None], axis=0) / cnt
    d = (pts - mean[None]) * wm[:, None]
    cov = d.T @ d / cnt
    _, evecs = jnp.linalg.eigh(cov)          # ascending eigenvalues
    e1, e2 = evecs[:, 2], evecs[:, 1]        # span of the local plane
    p2 = jnp.stack([(pts - mean[None]) @ e1, (pts - mean[None]) @ e2], -1)
    # deterministic sub-resolution jitter breaks exact cocircularity (grid
    # scans are pathologically cocircular for the strict-inside test)
    h = (vids.astype(jnp.uint32) * jnp.uint32(2654435761))
    j1 = ((h >> 8) & 1023).astype(f) / 1023.0 - 0.5
    j2 = ((h >> 18) & 1023).astype(f) / 1023.0 - 0.5
    p2 = p2 + jnp.stack([j1, j2], -1) * (1e-3 * cfg.voxel_size)

    combos = jnp.asarray(_combos(M))                     # [C, 3]
    a, b, c = p2[combos[:, 0]], p2[combos[:, 1]], p2[combos[:, 2]]
    o = ((b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
         - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0]))    # [C] 2x area
    # sliver filter: |o| / lmax^2 ≈ min-height / max-edge ratio; near-
    # collinear triples have noise-dominated normals (jitter is 1e-3*voxel,
    # sensor noise larger still), so demand a minimum shape quality rather
    # than a tiny absolute area.
    lmax2 = jnp.maximum(jnp.maximum(
        jnp.sum((b - a) ** 2, -1), jnp.sum((c - b) ** 2, -1)),
        jnp.sum((a - c) ** 2, -1))
    # triangles smaller than the dedup subcell (voxel/SUB) are below the
    # vertex-position noise floor — their normals are meaningless
    min_edge = cfg.voxel_size / SUB * 0.8
    tri_valid = (mask[combos[:, 0]] & mask[combos[:, 1]] & mask[combos[:, 2]]
                 & (jnp.abs(o) > 0.3 * lmax2)
                 & (lmax2 > min_edge ** 2))

    A = a[:, None, :] - p2[None, :, :]                   # [C, M, 2]
    B = b[:, None, :] - p2[None, :, :]
    Cc = c[:, None, :] - p2[None, :, :]
    a2 = jnp.sum(A * A, -1)
    b2 = jnp.sum(B * B, -1)
    c2 = jnp.sum(Cc * Cc, -1)
    det = (A[..., 0] * (B[..., 1] * c2 - b2 * Cc[..., 1])
           - A[..., 1] * (B[..., 0] * c2 - b2 * Cc[..., 0])
           + a2 * (B[..., 0] * Cc[..., 1] - B[..., 1] * Cc[..., 0]))
    inside = (jnp.sign(o)[:, None] * det > (1e-9 * cfg.voxel_size ** 4))
    inside = inside & mask[None, :] & jnp.asarray(_not_in_triple(M))
    keep = tri_valid & ~jnp.any(inside, axis=1)

    # ownership: centroid inside this voxel -> exactly one owner per triangle
    cen = (pts[combos[:, 0]] + pts[combos[:, 1]] + pts[combos[:, 2]]) / 3.0
    keep = keep & (_pack(_coords(cen, origin, cfg.voxel_size)) == own_code)

    order = jnp.argsort(~keep, stable=True)[:cfg.tri_cap]
    tri_local = combos[order]                            # [T, 3]
    tri_keep = keep[order]
    return vids[tri_local], tri_keep


@partial(jax.jit, static_argnums=(2,))
def retriangulate(mesh: MeshMap, codes: jax.Array, cfg: MeshConfig):
    """Retriangulate a batch of dirty voxels.

    codes [B] (INVALID entries padded).  For each voxel: gather its own and
    the 6 face-neighbor voxels' vertices from the sorted store, keep the
    ``cfg.cand`` nearest to the voxel center, Delaunay-triangulate on the
    local PCA plane, emit triangles whose centroid this voxel owns.
    Returns (tri_vid [B, T, 3] stable vertex ids, tri_mask [B, T])."""
    B = codes.shape[0]
    gk = cfg.gather_k
    ijk = _unpack(codes)                                  # [B, 3]
    offs = jnp.asarray(np.array(
        [[0, 0, 0], [1, 0, 0], [-1, 0, 0], [0, 1, 0],
         [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.int32))
    ncodes = _pack(ijk[:, None, :] + offs[None])          # [B, 7]
    ncodes = jnp.where(codes[:, None] == INVALID, INVALID, ncodes)
    start = jnp.searchsorted(mesh.code, ncodes, side="left")
    end = jnp.searchsorted(mesh.code, ncodes, side="right")
    end = jnp.where(ncodes == INVALID, start, end)
    span = jnp.arange(gk)
    gidx = start[..., None] + span[None, None, :]         # [B, 7, gk]
    gvalid = gidx < end[..., None]
    gidx = jnp.clip(gidx, 0, mesh.pts.shape[0] - 1).reshape(B, 7 * gk)
    cand_pts = mesh.pts[gidx]                             # [B, 7gk, 3]
    cand_vid = mesh.vid[gidx]
    cand_mask = gvalid.reshape(B, 7 * gk)

    center = (mesh.origin[None] + (ijk.astype(mesh.pts.dtype) + 0.5)
              * cfg.voxel_size)
    d2 = jnp.sum((cand_pts - center[:, None, :]) ** 2, -1)
    d2 = jnp.where(cand_mask, d2, jnp.inf)
    neg, top = jax.lax.top_k(-d2, cfg.cand)               # [B, cand]
    sel_pts = jnp.take_along_axis(cand_pts, top[..., None], axis=1)
    sel_vid = jnp.take_along_axis(cand_vid, top, axis=1)
    sel_mask = jnp.isfinite(-neg)

    tri_vid, tri_mask = jax.vmap(
        lambda p, vi, ma, co: _delaunay_one(p, vi, ma, co, mesh.origin, cfg)
    )(sel_pts, sel_vid, sel_mask, codes)
    return tri_vid, tri_mask


# --------------------------------------------------------------------------
# host-side driver (the sendData / service_reconstruct_mesh analog)
# --------------------------------------------------------------------------

class OnlineMesher:
    """Streaming mesh reconstruction from (world cloud, pose, image) frames.

    The single-process analog of ImMesh's intake + worker pool
    (``ImMesh_mesh_reconstruction.cpp:734-800`` sendData and ``:102-560``
    incremental_mesh_reconstruction): feed frames as they leave the LIO;
    dirty voxels are retriangulated in fixed-size device batches; each
    voxel's triangle set is atomically replaced in the host registry."""

    def __init__(self, cfg: MeshConfig | None = None, origin=None,
                 intrinsics=None, drain_every: int = 1):
        self.cfg = cfg or MeshConfig()
        # retriangulation cadence: successive scans re-dirty mostly the
        # same voxels, so draining every N frames coalesces work (the
        # pending set dedups); outputs always drain first
        self.drain_every = max(1, drain_every)
        # retriangulation's per-voxel gather window must cover everything
        # insert can store per voxel, or stored vertices silently drop out
        # of the triangulation
        assert self.cfg.gather_k >= self.cfg.max_per_voxel, (
            f"gather_k ({self.cfg.gather_k}) must be >= max_per_voxel "
            f"({self.cfg.max_per_voxel})")
        self.mesh = MeshMap.empty(self.cfg, origin=origin)
        self.intr = None if intrinsics is None else np.asarray(
            intrinsics, np.float32)
        self.tris: dict[int, np.ndarray] = {}   # voxel code -> [t, 3] vids
        self._pending: set[int] = set()
        self.frames = 0
        self.evicted_vertices = 0       # capacity-overflow counter

    # -- intake ----------------------------------------------------------
    def add_frame(self, pts_world, mask=None, image=None, r_wc=None,
                  t_wc=None):
        """One LIO output frame: world-frame points (+ optional camera
        frame for texturing)."""
        pts = np.asarray(pts_world, np.float32).reshape(-1, 3)
        if mask is None:
            mask = np.ones((pts.shape[0],), np.float32)
        mask = np.asarray(mask, np.float32).reshape(-1)
        chunk = self.cfg.insert_chunk
        for s in range(0, pts.shape[0], chunk):
            p = pts[s:s + chunk]
            m = mask[s:s + chunk]
            if p.shape[0] < chunk:               # fixed-shape pad
                pad = chunk - p.shape[0]
                p = np.concatenate([p, np.zeros((pad, 3), np.float32)])
                m = np.concatenate([m, np.zeros((pad,), np.float32)])
            self.mesh, evicted = insert(self.mesh, jnp.asarray(p),
                                        jnp.asarray(m), self.cfg)
            ev = np.asarray(evicted)
            ev = ev[ev != int(INVALID)]
            if ev.size:
                # capacity overflow: vertices were dropped — their voxels'
                # triangle sets are stale, re-mesh (or prune) them
                self.evicted_vertices += int(ev.size)
                for c in np.unique(ev):
                    self._pending.add(int(c))
            self._mark_dirty(p[m > 0])
        if image is not None and self.intr is not None:
            self.mesh = update_rgb(
                self.mesh, jnp.asarray(image, jnp.float32),
                jnp.asarray(self.intr), jnp.asarray(r_wc, jnp.float32),
                jnp.asarray(t_wc, jnp.float32), self.cfg)
        self.frames += 1
        if self.frames % self.drain_every == 0:
            self._drain()

    def _mark_dirty(self, pts: np.ndarray):
        if pts.size == 0:
            return
        org = np.asarray(self.mesh.origin)
        ijk = np.floor((pts - org[None]) / self.cfg.voxel_size).astype(
            np.int64)
        # a new point can change its own voxel's and face neighbors' meshes
        offs = np.array([[0, 0, 0], [1, 0, 0], [-1, 0, 0], [0, 1, 0],
                         [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.int64)
        allv = (ijk[:, None, :] + offs[None]).reshape(-1, 3) + HALF
        ok = np.all((allv >= 0) & (allv < (1 << BITS)), axis=1)
        codes = (allv[:, 0] | (allv[:, 1] << BITS) | (allv[:, 2] << (2 * BITS)))
        self._pending.update(int(c) for c in codes[ok])

    def _drain(self):
        cfg = self.cfg
        while self._pending:
            batch = [self._pending.pop()
                     for _ in range(min(cfg.dirty_batch, len(self._pending)))]
            pad = cfg.dirty_batch - len(batch)
            codes = np.asarray(batch + [int(INVALID)] * pad, np.int32)
            tv, tm = retriangulate(self.mesh, jnp.asarray(codes), cfg)
            tv, tm = np.asarray(tv), np.asarray(tm)
            for i, c in enumerate(batch):
                tris = tv[i][tm[i]]
                if tris.size:
                    self.tris[c] = tris
                else:
                    self.tris.pop(c, None)

    # -- outputs -----------------------------------------------------------
    def vertices(self):
        self._drain()
        """(vids [V], pts [V, 3], rgb [V, 3]) of live vertices."""
        code = np.asarray(self.mesh.code)
        live = code != int(INVALID)
        return (np.asarray(self.mesh.vid)[live],
                np.asarray(self.mesh.pts)[live],
                np.asarray(self.mesh.rgb)[live])

    def triangles(self) -> np.ndarray:
        """All triangles as stable vertex ids, [T, 3]."""
        self._drain()
        if not self.tris:
            return np.zeros((0, 3), np.int32)
        return np.concatenate(list(self.tris.values()), axis=0)

    def export_ply(self, path: str):
        vids, pts, rgb = self.vertices()
        row = {int(v): i for i, v in enumerate(vids)}
        tris = self.triangles()
        faces = []
        for t in tris:
            if all(int(v) in row for v in t):
                faces.append([row[int(v)] for v in t])
        faces_np = np.asarray(faces, np.int64).reshape(-1, 3)
        with open(path, "w") as f:
            f.write("ply\nformat ascii 1.0\n")
            f.write(f"element vertex {pts.shape[0]}\n")
            f.write("property float x\nproperty float y\nproperty float z\n")
            f.write("property uchar red\nproperty uchar green\n"
                    "property uchar blue\n")
            f.write(f"element face {faces_np.shape[0]}\n")
            f.write("property list uchar int vertex_indices\nend_header\n")
            c = np.clip(rgb, 0, 255).astype(int)
            for i in range(pts.shape[0]):
                f.write(f"{pts[i, 0]:.4f} {pts[i, 1]:.4f} {pts[i, 2]:.4f} "
                        f"{c[i, 0]} {c[i, 1]} {c[i, 2]}\n")
            for fc in faces_np:
                f.write(f"3 {fc[0]} {fc[1]} {fc[2]}\n")
        return pts.shape[0], faces_np.shape[0]

    def stats(self):
        code = np.asarray(self.mesh.code)
        return {"vertices": int((code != int(INVALID)).sum()),
                "voxels_meshed": len(self.tris),
                "triangles": int(self.triangles().shape[0]),
                "frames": self.frames,
                "evicted_vertices": self.evicted_vertices}
