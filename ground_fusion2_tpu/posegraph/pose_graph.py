"""Loop-closure pose graph: keyframe DB, detection, 4-DoF/6-DoF optimization.

Rebuild of the reference's dense_map node (``dense_map/src/pose_graph.cpp``):

  * keyframe database: fixed-capacity arrays of poses, BRIEF descriptor
    sets, simhash global descriptors, normalized-plane points + depths;
  * loop detection (``detectLoop:432-513``): global-descriptor retrieval
    (one matmul over the DB, skipping the most recent frames) → mutual
    Hamming feature matching → depth-seeded PnP-RANSAC 6-DoF geometric
    check (``keyframe.cpp`` findConnection) → relative-pose loop edge
    through the camera-IMU extrinsic;
  * optimization: 4-DoF yaw+xyz (``optimize4DoF:529-706``; pitch/roll fixed
    from odometry — gravity makes them observable) or full SE(3) 6-DoF
    (``optimize6DoF:707-874``), sequential + loop edges, one jitted LM;
  * save/load to ``.npz`` (reference savePoseGraph/loadPoseGraph).
"""

from __future__ import annotations

from dataclasses import dataclass, field
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
    ransac_iters: int = 128        # 6-DoF hypothesis count (batched)
    rel_weight_t: float = 10.0
    rel_weight_yaw: float = 50.0
    loop_weight_t: float = 20.0
    loop_weight_yaw: float = 100.0
    max_loops: int = 64
    six_dof: bool = False          # optimize6DoF instead of optimize4DoF
    # camera-IMU extrinsic (keyframe poses are body; features are camera)
    ric: np.ndarray = field(default_factory=lambda: np.eye(3))
    tic: np.ndarray = field(default_factory=lambda: np.zeros(3))


class PoseGraph:
    def __init__(self, cfg: PoseGraphConfig):
        self.cfg = cfg
        N, F = cfg.capacity, cfg.num_feats
        self.n = 0
        self.p = np.zeros((N, 3), np.float32)       # optimized pose
        self.q = np.zeros((N, 4), np.float32)
        self.q[:, 0] = 1.0    # identity: a zero quat NaNs under quat_log
        self.p_odom = np.zeros((N, 3), np.float32)  # raw odometry pose
        self.q_odom = np.zeros((N, 4), np.float32)
        self.q_odom[:, 0] = 1.0
        self.desc = np.zeros((N, F, brief.N_WORDS), np.uint32)
        self.desc_valid = np.zeros((N, F), np.float32)
        self.gdesc = np.zeros((N, brief.GDIM), np.float32)
        self.pts_norm = np.zeros((N, F, 2), np.float32)   # normalized plane
        self.pts_depth = np.zeros((N, F), np.float32)     # camera depth
        # loop edges: (i, j, dp [3] in body-i frame, dyaw, dq [4] body i->j)
        self.loops = []
        self.drift_p = np.zeros(3, np.float32)
        self.drift_yaw = 0.0
        # session boundaries: a loaded graph is a separate odometry sequence
        # (reference sequence_cnt in pose_graph.cpp) — sequential edges must
        # not cross it, only loop edges link sessions
        self.session_starts = [0]

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

        # mutual Hamming matching (vectorized)
        d = np.asarray(brief.hamming(jnp.asarray(self.desc[i]),
                                     jnp.asarray(self.desc[j])))
        d = d + 1e6 * (1 - self.desc_valid[i][:, None]) \
            + 1e6 * (1 - self.desc_valid[j][None, :])
        fwd = d.argmin(axis=1)
        bwd = d.argmin(axis=0)
        F = d.shape[0]
        ar = np.arange(F)
        mutual = (bwd[fwd] == ar) & (d[ar, fwd] < cfg.hamming_max)
        idx_i = np.where(mutual)[0]
        if idx_i.shape[0] < cfg.min_inliers:
            return None
        idx_j = fwd[idx_i]

        rel = self._loop_geometry(i, j, idx_i, idx_j)
        if rel is None:
            return None
        dp_ij, dq_ij = rel      # pose of (old) j expressed in (new) body i
        # store the edge old->new: pose of i in j's body frame
        R_ij = np.asarray(lie.quat_to_mat(jnp.asarray(dq_ij)))
        dp = (-R_ij.T @ dp_ij).astype(np.float32)
        dq = np.asarray(lie.quat_conj(jnp.asarray(dq_ij)), np.float32)
        dyaw = _yaw_of(dq)
        self.loops.append((j, i, dp, dyaw, dq))
        if len(self.loops) > cfg.max_loops:
            self.loops.pop(0)
        return j, dp, dyaw

    def _loop_geometry(self, i, j, idx_i, idx_j):
        """Full 6-DoF relative pose between keyframes j and i from matched
        features — the reference's PnP-RANSAC (``keyframe.cpp``
        findConnection / solvePnPRansac), depth-seeded: keyframe j's RGB-D
        depths give 3D points in camera j; RANSAC over minimal 3-point
        Kabsch hypotheses (using i's depth) scored by normalized-plane
        reprojection into camera i; GN refinement on the inlier set. No
        odometry initialization — a drifted prior must not bias the edge.

        Returns (dp, dq): body-frame pose of j expressed in body i
        (p_j = p_i + R_i dp; q_j = q_i ⊗ dq), or None."""
        cfg = self.cfg
        zj = self.pts_depth[j, idx_j]
        okj = zj > 0.1
        if okj.sum() < cfg.min_inliers:
            return None
        idx_i, idx_j, zj = idx_i[okj], idx_j[okj], zj[okj]
        M = idx_i.shape[0]
        pj = np.concatenate([self.pts_norm[j, idx_j] * zj[:, None],
                             zj[:, None]], axis=1)         # 3D in cam j
        ni = self.pts_norm[i, idx_i]                        # bearings in cam i
        zi = self.pts_depth[i, idx_i]
        oki = zi > 0.1                                      # 3D also in cam i
        if oki.sum() < 4:
            return None
        pi3 = np.concatenate([ni * zi[:, None], zi[:, None]], axis=1)

        # --- RANSAC: 3-point Kabsch hypotheses (cam j -> cam i) ----------
        rng = np.random.default_rng(int(i) * 7919 + int(j))
        cand = np.where(oki)[0]
        best_inl = None
        best_cnt = cfg.min_inliers - 1
        for _ in range(cfg.ransac_iters):
            s = rng.choice(cand, size=3, replace=False)
            # degenerate sample guard
            if np.linalg.matrix_rank(pj[s] - pj[s].mean(0)) < 2:
                continue
            R, t = _kabsch_rt(pj[s], pi3[s])
            pred = pj @ R.T + t
            z = np.maximum(pred[:, 2], 0.05)
            err = np.linalg.norm(pred[:, :2] / z[:, None] - ni, axis=1)
            inl = (err < cfg.inlier_thresh) & (pred[:, 2] > 0.05)
            if inl.sum() > best_cnt:
                best_cnt = int(inl.sum())
                best_inl = inl
        if best_inl is None:
            return None

        # --- GN refinement (6-DoF) on inliers, reprojection objective ----
        R, t = _kabsch_rt(pj[best_inl & oki], pi3[best_inl & oki]) \
            if (best_inl & oki).sum() >= 3 else _kabsch_rt(pj[best_inl],
                                                           pi3[best_inl])
        for _ in range(8):
            pred = pj[best_inl] @ R.T + t
            z = np.maximum(pred[:, 2], 0.05)
            uv = pred[:, :2] / z[:, None]
            r = (uv - ni[best_inl]).reshape(-1)
            J = np.zeros((r.shape[0], 6))
            for m, P in enumerate(pred):
                x, y, zz = P
                iz = 1.0 / max(zz, 0.05)
                # d(uv)/d(P) [2,3]
                duv = np.array([[iz, 0, -x * iz * iz],
                                [0, iz, -y * iz * iz]])
                # dP/d(t) = I ; dP/d(theta) = -[R pj]x  (right perturbation:
                # P = R exp(th^) pj + t  =>  dP = R (th x pj) = -R [pj]x th)
                dth = -R @ _hat(pj[best_inl][m])
                J[2 * m:2 * m + 2, :3] = duv
                J[2 * m:2 * m + 2, 3:] = duv @ dth
            try:
                dx = np.linalg.lstsq(J, -r, rcond=None)[0]
            except np.linalg.LinAlgError:
                return None
            t = t + dx[:3]
            R = R @ _exp_so3(dx[3:])
            if np.linalg.norm(dx) < 1e-9:
                break

        # final inlier gate over ALL matches
        pred = pj @ R.T + t
        z = np.maximum(pred[:, 2], 0.05)
        err = np.linalg.norm(pred[:, :2] / z[:, None] - ni, axis=1)
        n_in = int(((err < cfg.inlier_thresh) & (pred[:, 2] > 0.05)).sum())
        if n_in < cfg.min_inliers:
            return None

        # camera relative -> body relative: found T_ci<-cj; want T_bi<-bj =
        # T_bc T_ci<-cj T_bc^{-1}
        ric, tic = self.cfg.ric, self.cfg.tic
        R_b = ric @ R @ ric.T
        dp = (ric @ t + tic - R_b @ tic).astype(np.float32)
        dq = np.asarray(lie.mat_to_quat(jnp.asarray(R_b, jnp.float32)),
                        np.float32)
        return dp, dq

    # ------------------------------------------------------------------
    def optimize(self, iters: int = 8):
        """Graph optimization over all keyframes (4-DoF or 6-DoF per
        config; reference optimize4DoF/optimize6DoF)."""
        if self.n < 2:
            return
        if self.cfg.six_dof:
            self._optimize_6dof(iters)
        else:
            self._optimize_4dof(iters)

    def _optimize_4dof(self, iters: int = 8):
        n = self.n
        cfg = self.cfg
        cap = cfg.capacity

        # build edge arrays (host) then solve on device
        yaw_odom = np.array([_yaw_of(self.q_odom[k]) for k in range(n)])
        seq_dp = np.zeros((cap - 1, 3), np.float32)
        seq_dyaw = np.zeros((cap - 1,), np.float32)
        seq_valid = np.zeros((cap - 1,), np.float32)
        for k in range(n - 1):
            if (k + 1) in self.session_starts:
                continue   # don't link across sessions (different odom frames)
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
        for k, (i, j, dp, dyaw, _dq) in enumerate(self.loops[:ml]):
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

    def _optimize_6dof(self, iters: int = 8):
        """Full SE(3) pose-graph optimization (reference
        ``optimize6DoF``, pose_graph.cpp:707-874): sequential relative-pose
        edges from odometry + 6-DoF loop edges, frame 0 pinned."""
        n = self.n
        cfg = self.cfg
        cap = cfg.capacity

        seq_dp = np.zeros((cap - 1, 3), np.float32)
        seq_dq = np.zeros((cap - 1, 4), np.float32)
        seq_dq[:, 0] = 1.0
        seq_valid = np.zeros((cap - 1,), np.float32)
        for k in range(n - 1):
            if (k + 1) in self.session_starts:
                continue   # don't link across sessions
            Rk = np.asarray(lie.quat_to_mat(jnp.asarray(self.q_odom[k])))
            seq_dp[k] = Rk.T @ (self.p_odom[k + 1] - self.p_odom[k])
            seq_dq[k] = np.asarray(lie.quat_mul(
                lie.quat_conj(jnp.asarray(self.q_odom[k])),
                jnp.asarray(self.q_odom[k + 1])))
            seq_valid[k] = 1.0

        ml = cfg.max_loops
        loop_i = np.zeros((ml,), np.int32)
        loop_j = np.zeros((ml,), np.int32)
        loop_dp = np.zeros((ml, 3), np.float32)
        loop_dq = np.zeros((ml, 4), np.float32)
        loop_dq[:, 0] = 1.0
        loop_valid = np.zeros((ml,), np.float32)
        for k, (i, j, dp, _dyaw, dq) in enumerate(self.loops[:ml]):
            loop_i[k], loop_j[k] = i, j
            loop_dp[k], loop_dq[k] = dp, dq
            loop_valid[k] = 1.0

        node_valid = np.zeros((cap,), np.float32)
        node_valid[:n] = 1.0

        p_opt, q_opt = _solve_6dof(
            jnp.asarray(self.p), jnp.asarray(self.q), jnp.asarray(node_valid),
            jnp.asarray(seq_dp), jnp.asarray(seq_dq), jnp.asarray(seq_valid),
            jnp.asarray(loop_i), jnp.asarray(loop_j), jnp.asarray(loop_dp),
            jnp.asarray(loop_dq), jnp.asarray(loop_valid),
            cfg.rel_weight_t, cfg.rel_weight_yaw,
            cfg.loop_weight_t, cfg.loop_weight_yaw, iters)
        self.p[:n] = np.asarray(p_opt)[:n]
        self.q[:n] = np.asarray(q_opt)[:n]
        # drift for future keyframes (yaw + translation component, as the
        # reference's updatePath does for the republish correction)
        self.drift_yaw = _wrap(_yaw_of(self.q[n - 1])
                               - _yaw_of(self.q_odom[n - 1]))
        self.drift_p = self.p[n - 1] \
            - _yaw_rot(self.drift_yaw) @ self.p_odom[n - 1]

    # ------------------------------------------------------------------
    def save(self, path: str):
        np.savez_compressed(
            path, n=self.n, p=self.p, q=self.q, p_odom=self.p_odom,
            q_odom=self.q_odom, desc=self.desc, desc_valid=self.desc_valid,
            gdesc=self.gdesc, pts_norm=self.pts_norm,
            pts_depth=self.pts_depth,
            loops=np.array([(i, j, *dp, dyaw, *dq)
                            for i, j, dp, dyaw, dq in self.loops],
                           np.float32).reshape(-1, 10))

    @staticmethod
    def load(path: str, cfg: PoseGraphConfig) -> "PoseGraph":
        z = np.load(path)
        pg = PoseGraph(cfg)
        pg.n = int(z["n"])
        for name in ("p", "q", "p_odom", "q_odom", "desc", "desc_valid",
                     "gdesc", "pts_norm", "pts_depth"):
            getattr(pg, name)[:] = z[name]
        pg.loops = [(int(r[0]), int(r[1]), r[2:5].astype(np.float32),
                     float(r[5]), r[6:10].astype(np.float32))
                    for r in z["loops"]]
        pg.session_starts = [0, pg.n]
        return pg


def _yaw_rot(yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def _hat(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])


def _exp_so3(w):
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3) + _hat(w)
    K = _hat(w / th)
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K


def _kabsch_rt(src, dst):
    """R, t with dst ≈ R src + t."""
    cs, cd = src.mean(axis=0), dst.mean(axis=0)
    H = (dst - cd).T @ (src - cs)
    U, _, Vt = np.linalg.svd(H)
    S = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    return R, cd - R @ cs


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

    def wrap(a):
        # yaw residuals must be angle-wrapped: node yaws re-wrap to (-pi, pi]
        # between incremental optimizations, so an unwrapped difference sees
        # spurious +-2pi jumps on trajectories that cross the seam (the
        # reference's NormalizeAngle local parameterization does the same)
        return (a + jnp.pi) % (2 * jnp.pi) - jnp.pi

    def residuals(delta):
        d = delta.reshape(N, 4)
        p = p0 + d[:, :3]
        yaw = yaw0 + d[:, 3]
        # sequential edges
        RT = rzT(yaw[:-1])
        dp_est = jnp.einsum("nij,nj->ni", RT, p[1:] - p[:-1])
        r_seq_t = (dp_est - seq_dp) * w_t
        r_seq_y = wrap(yaw[1:] - yaw[:-1] - seq_dyaw) * w_yaw
        w_seq = seq_valid
        # loop edges: edge (i, j): dp in i frame
        pi, pj = p[loop_i], p[loop_j]
        RTl = rzT(yaw[loop_i])
        dp_l = jnp.einsum("nij,nj->ni", RTl, pj - pi)
        r_loop_t = (dp_l - loop_dp) * wl_t
        r_loop_y = wrap(yaw[loop_j] - yaw[loop_i] - loop_dyaw) * wl_yaw
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


@partial(jax.jit, static_argnums=(15,))
def _solve_6dof(p0, q0, node_valid, seq_dp, seq_dq, seq_valid,
                loop_i, loop_j, loop_dp, loop_dq, loop_valid,
                w_t, w_rot, wl_t, wl_rot, iters):
    """Jitted SE(3) pose-graph LM. Edge (i, j): p_j = p_i + R_i dp,
    q_j = q_i ⊗ dq. Residuals in the edge's local frame."""
    N = p0.shape[0]

    def residuals(delta):
        d = delta.reshape(N, 6)
        p = p0 + d[:, :3]
        q = lie.quat_boxplus(q0, d[:, 3:])

        def edge_res(pi, qi, pj, qj, dp, dq, wt, wr):
            R_iT = lie.quat_to_mat(lie.quat_conj(qi))
            r_t = (jnp.einsum("nij,nj->ni", R_iT, pj - pi) - dp) * wt
            q_rel = lie.quat_mul(lie.quat_conj(qi), qj)
            r_r = lie.quat_boxminus(q_rel, dq) * wr
            return r_t, r_r

        r_st, r_sr = edge_res(p[:-1], q[:-1], p[1:], q[1:],
                              seq_dp, seq_dq, w_t, w_rot)
        r_lt, r_lr = edge_res(p[loop_i], q[loop_i], p[loop_j], q[loop_j],
                              loop_dp, loop_dq, wl_t, wl_rot)
        r = jnp.concatenate([r_st.reshape(-1), r_sr.reshape(-1),
                             r_lt.reshape(-1), r_lr.reshape(-1)])
        w = jnp.concatenate([
            jnp.repeat(seq_valid, 3), jnp.repeat(seq_valid, 3),
            jnp.repeat(loop_valid, 3), jnp.repeat(loop_valid, 3)])
        return r, w

    free = jnp.repeat(node_valid, 6)
    free = free.at[:6].set(0.0)        # gauge: pin node 0
    out = lm_solve(residuals, N * 6, max_iters=iters, free_mask=free)
    d = out.delta.reshape(N, 6)
    return p0 + d[:, :3], lie.quat_boxplus(q0, d[:, 3:])
