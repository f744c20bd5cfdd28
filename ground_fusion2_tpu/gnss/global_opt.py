"""Global pose-graph fusion: local odometry + GPS/AprilTag anchors.

Rebuild of global_fusion (``global_fusion/src/globalOpt.cpp``): a sliding
global graph over keyframe poses with

  * sequential relative-pose edges from local (VIO) odometry
    (autodiff ``RelativeRTError``, ``Factors.h:52-108``);
  * absolute position anchors from GPS-LLA (converted through
    :class:`~ground_fusion2_tpu.gnss.frames.LocalCartesian`) or AprilTag;
  * the ENU↔local alignment ``WGPS_T_WVIO`` maintained from the solution.

TPU-native: fixed-capacity node/edge arrays with masks, solved by the same
dense tangent-space LM used everywhere else (graphs of a few hundred nodes
are tiny for one chip).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from ..solver.gauss_newton import lm_solve


class GlobalGraph(NamedTuple):
    """Fixed-capacity graph state."""

    p: jax.Array          # [N, 3] node positions (global frame)
    q: jax.Array          # [N, 4]
    node_valid: jax.Array  # [N]
    # sequential relative edges between consecutive nodes (from odometry)
    rel_dp: jax.Array     # [N-1, 3] in frame of node i
    rel_dq: jax.Array     # [N-1, 4]
    rel_valid: jax.Array  # [N-1]
    # absolute position anchors (GPS in local-cartesian)
    anchor_p: jax.Array   # [N, 3]
    anchor_std: jax.Array  # [N]
    anchor_valid: jax.Array  # [N]
    # absolute 6-DoF pose anchors (AprilTag odometry, reference
    # globalOptNode.cpp:133-135 inputAprilTag)
    tag_p: jax.Array      # [N, 3]
    tag_q: jax.Array      # [N, 4]
    tag_std: jax.Array    # [N]
    tag_valid: jax.Array  # [N]

    @staticmethod
    def empty(capacity: int, dtype=jnp.float32) -> "GlobalGraph":
        n = capacity
        return GlobalGraph(
            p=jnp.zeros((n, 3), dtype),
            q=lie.quat_identity((n,), dtype),
            node_valid=jnp.zeros((n,), dtype),
            rel_dp=jnp.zeros((n - 1, 3), dtype),
            rel_dq=lie.quat_identity((n - 1,), dtype),
            rel_valid=jnp.zeros((n - 1,), dtype),
            anchor_p=jnp.zeros((n, 3), dtype),
            anchor_std=jnp.ones((n,), dtype),
            anchor_valid=jnp.zeros((n,), dtype),
            tag_p=jnp.zeros((n, 3), dtype),
            tag_q=lie.quat_identity((n,), dtype),
            tag_std=jnp.ones((n,), dtype),
            tag_valid=jnp.zeros((n,), dtype))


def _graph_residuals(g: GlobalGraph, delta, rel_weight_t=10.0,
                     rel_weight_r=100.0):
    N = g.p.shape[0]
    dp6 = delta.reshape(N, 6)
    p = g.p + dp6[:, :3]
    q = lie.quat_boxplus(g.q, dp6[:, 3:])

    # sequential relative edges
    qi, pi = q[:-1], p[:-1]
    qj, pj = q[1:], p[1:]
    dp_est = lie.quat_rotate(lie.quat_conj(qi), pj - pi)
    dq_est = lie.quat_mul(lie.quat_conj(qi), qj)
    r_t = (dp_est - g.rel_dp) * rel_weight_t
    r_r = lie.quat_boxminus(dq_est, g.rel_dq) * rel_weight_r
    w_rel = jnp.repeat(g.rel_valid[:, None], 3, axis=1)

    # anchors
    r_a = (p - g.anchor_p) / jnp.maximum(g.anchor_std, 1e-3)[:, None]
    w_a = jnp.repeat(g.anchor_valid[:, None], 3, axis=1)

    # 6-DoF tag anchors
    inv_std = 1.0 / jnp.maximum(g.tag_std, 1e-3)[:, None]
    r_tp = (p - g.tag_p) * inv_std
    r_tq = lie.quat_boxminus(q, g.tag_q) * inv_std * 10.0
    w_tag = jnp.repeat(g.tag_valid[:, None], 3, axis=1)

    r = jnp.concatenate([r_t.reshape(-1), r_r.reshape(-1), r_a.reshape(-1),
                         r_tp.reshape(-1), r_tq.reshape(-1)])
    w = jnp.concatenate([w_rel.reshape(-1), w_rel.reshape(-1), w_a.reshape(-1),
                         w_tag.reshape(-1), w_tag.reshape(-1)])
    return r, w


@partial(jax.jit, static_argnums=(1,))
def optimize_graph(g: GlobalGraph, iters: int = 6) -> GlobalGraph:
    """LM over all node poses (the reference's 2 s background solve)."""
    N = g.p.shape[0]
    free = jnp.repeat(g.node_valid, 6)
    out = lm_solve(lambda d: _graph_residuals(g, d), N * 6,
                   max_iters=iters, free_mask=free)
    dp6 = out.delta.reshape(N, 6)
    return g._replace(p=g.p + dp6[:, :3],
                      q=lie.quat_boxplus(g.q, dp6[:, 3:]))


class GlobalFusion:
    """Streaming wrapper (the global_fusion node): feed local odometry and
    GPS fixes; maintains the fused global trajectory and the local→global
    transform (reference ``WGPS_T_WVIO``)."""

    def __init__(self, capacity: int = 256):
        self.capacity = capacity
        self.graph = GlobalGraph.empty(capacity)
        self.n = 0
        self.last_local = None     # (p, q) of last inserted local pose
        self.q_align = np.array([1.0, 0, 0, 0])  # local -> global
        self.t_align = np.zeros(3)

    def input_odom(self, p_local, q_local):
        i = self.n
        if i >= self.capacity:
            return  # graph full (a production system would slide)
        p_local = np.asarray(p_local, np.float32)
        q_local = np.asarray(q_local, np.float32)
        # initialize node at aligned position
        q_g = np.asarray(lie.quat_mul(jnp.asarray(self.q_align, jnp.float32),
                                      jnp.asarray(q_local)))
        p_g = np.asarray(lie.quat_rotate(
            jnp.asarray(self.q_align, jnp.float32),
            jnp.asarray(p_local))) + self.t_align
        g = self.graph
        g = g._replace(
            p=g.p.at[i].set(jnp.asarray(p_g)),
            q=g.q.at[i].set(jnp.asarray(q_g)),
            node_valid=g.node_valid.at[i].set(1.0))
        if i > 0:
            pl, ql = self.last_local
            dq = np.asarray(lie.quat_mul(
                lie.quat_conj(jnp.asarray(ql, jnp.float32)),
                jnp.asarray(q_local)))
            dp = np.asarray(lie.quat_rotate(
                lie.quat_conj(jnp.asarray(ql, jnp.float32)),
                jnp.asarray(p_local - pl)))
            g = g._replace(
                rel_dp=g.rel_dp.at[i - 1].set(jnp.asarray(dp)),
                rel_dq=g.rel_dq.at[i - 1].set(jnp.asarray(dq)),
                rel_valid=g.rel_valid.at[i - 1].set(1.0))
        self.graph = g
        self.last_local = (p_local.copy(), q_local.copy())
        self.n += 1

    def input_gps(self, idx: int, enu_pos, std: float = 1.0):
        """Attach a GPS anchor (already in the local-cartesian global frame)
        to node idx."""
        g = self.graph
        self.graph = g._replace(
            anchor_p=g.anchor_p.at[idx].set(jnp.asarray(enu_pos, jnp.float32)),
            anchor_std=g.anchor_std.at[idx].set(std),
            anchor_valid=g.anchor_valid.at[idx].set(1.0))

    def input_tag_pose(self, idx: int, p_global, q_global, std: float = 0.1):
        """Attach an AprilTag absolute 6-DoF pose anchor to node idx
        (reference ``inputAprilTag``, ``globalOpt.cpp:43-105``)."""
        g = self.graph
        self.graph = g._replace(
            tag_p=g.tag_p.at[idx].set(jnp.asarray(p_global, jnp.float32)),
            tag_q=g.tag_q.at[idx].set(jnp.asarray(q_global, jnp.float32)),
            tag_std=g.tag_std.at[idx].set(std),
            tag_valid=g.tag_valid.at[idx].set(1.0))

    def optimize(self, iters: int = 6):
        self.graph = optimize_graph(self.graph, iters)
        self._update_alignment()
        return self.graph

    def _update_alignment(self):
        """Refresh local→global from the newest node (reference updates
        WGPS_T_WVIO from the solved pose)."""
        if self.n == 0 or self.last_local is None:
            return
        i = self.n - 1
        p_g = np.asarray(self.graph.p[i])
        q_g = np.asarray(self.graph.q[i])
        pl, ql = self.last_local
        q_align = lie.quat_mul(jnp.asarray(q_g, jnp.float32),
                               lie.quat_conj(jnp.asarray(ql, jnp.float32)))
        self.q_align = np.asarray(q_align)
        self.t_align = p_g - np.asarray(
            lie.quat_rotate(q_align, jnp.asarray(pl, jnp.float32)))
