"""LiDAR-inertial odometry orchestration + degradation-aware pose switch.

The TPU counterpart of the reference's ``zjloc::lidarodom``
(``lio/src/liw/lio/lidarodom.cpp``): per-sweep tick =

  ESKF predict through the sweep's IMU samples → CT-ICP against the voxel
  map (begin/end continuous-time pose) → ESKF SE(3) update → degeneracy
  check → LIO↔VIO switch → map insert + eviction.

The switch state machine mirrors ``lidarodom.cpp:313-437`` exactly,
including its decoupled rotation/translation offset composition (chosen
there for C0-continuity of the published trajectory):

  * entering degeneracy: latch an offset between the external (VIO) pose and
    the current fused pose; publish ``external ⊕ offset`` while degenerate;
  * exiting: latch the offset between the raw LIO pose and the fused pose;
    publish ``lio ⊕ offset`` thereafter.

Two execution paths share the same math:

  * **fused** (default): the whole tick is ONE compiled device step
    (:mod:`.fused`), switch logic traced — one host→device buffer and one
    record readback per sweep (optionally pipelined, lagging one scan);
  * **legacy**: host-orchestrated multi-dispatch path, kept as the
    equivalence oracle for tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from . import ct_icp as ci
from . import eskf as ekf
from . import fused as fu
from . import voxel_map as vm


def _compose_offset(q_base, t_base, q_off, t_off):
    """Reference's decoupled composition: R = R_base R_off, t = t_base + t_off."""
    return lie.quat_mul(jnp.asarray(q_base), jnp.asarray(q_off)), \
        jnp.asarray(t_base) + jnp.asarray(t_off)


def _latch_offset(q_from, t_from, q_to, t_to):
    """Offset such that from ⊕ off == to (decoupled form)."""
    q_off = lie.quat_mul(lie.quat_conj(jnp.asarray(q_from)), jnp.asarray(q_to))
    t_off = np.asarray(t_to) - np.asarray(t_from)
    return np.asarray(q_off), t_off


@dataclass
class LioConfig:
    map_cfg: vm.VoxelMapConfig = field(default_factory=vm.VoxelMapConfig)
    icp_cfg: ci.CtIcpConfig = field(default_factory=ci.CtIcpConfig)
    eskf_opt: ekf.EskfOptions = field(default_factory=ekf.EskfOptions)
    max_keypoints: int = 2048        # reference caps residuals at 2000
    keypoint_cell: float = 0.05      # spatial subsample grid (reference
                                     # subSampleFrame, main_eskf.cpp:89)
    static_init_samples: int = 100   # ~0.5 s at 200 Hz (reference uses 1 s)
    insert_subsample: int = 1
    g_norm: float = 9.81
    scan_buffer: int = 4096          # fixed device scan size (fused path)
    evict_every: int = 20


class LioOutput(NamedTuple):
    t: float
    p_fused: np.ndarray
    q_fused: np.ndarray
    p_lio: np.ndarray
    q_lio: np.ndarray
    degenerate: bool
    switched: str        # "", "to_vio", "to_lio"
    n_corr: int
    sigma: np.ndarray


class LidarOdometry:
    def __init__(self, cfg: LioConfig, fused: bool = True,
                 pipelined: bool = False):
        """``fused``: single-dispatch device tick (default). ``pipelined``:
        overlap the record readback with the next tick's device work —
        outputs lag one scan; call :meth:`flush` at sequence end."""
        self.cfg = cfg
        self.fused = fused
        self.pipelined = pipelined and fused
        self._eskf = ekf.EskfState.initial(cfg.g_norm)
        self._vmap = vm.VoxelMap.empty(cfg.map_cfg)
        self.initialized = False
        self.frame_idx = 0
        self.last_cloud = None   # (p_world [N,3], mask [N]) of the last scan
        self.dispatch_count = 0  # fused device dispatches (for tests)
        self._init_acc: list[np.ndarray] = []
        self._init_gyr: list[np.ndarray] = []
        self._carry: fu.LioCarry | None = None
        self._inflight = None    # (t, rec_dev) awaiting readback (pipelined)
        self._last_buf = None    # device-time instrumentation
        self._statics = fu.LioStatics(
            map_cfg=cfg.map_cfg, icp_cfg=cfg.icp_cfg, eskf_opt=cfg.eskf_opt,
            max_keypoints=cfg.max_keypoints, evict_every=cfg.evict_every,
            keypoint_cell=cfg.keypoint_cell)
        # switch state (mirrors reference flags; legacy/host path)
        self.has_entered_degenerate = False
        self.first_is_degenerate = False   # first-ever frames were degenerate
        self.was_degenerate = False
        self.q_off = np.array([1.0, 0, 0, 0])
        self.t_off = np.zeros(3)
        self.use_external = False
        self.last_q_lo = np.array([1.0, 0, 0, 0])
        self.last_t_lo = np.zeros(3)
        self.last_q_ext = np.array([1.0, 0, 0, 0])
        self.last_t_ext = np.zeros(3)
        self.q_fused = np.array([1.0, 0, 0, 0])
        self.t_fused = np.zeros(3)


    # carry-aware views: once the fused carry exists it owns the live
    # filter/map state; these keep the legacy attribute API working
    # (tests, save paths) without forcing device syncs per tick.
    @property
    def eskf(self):
        return self._carry.eskf if self._carry is not None else self._eskf

    @eskf.setter
    def eskf(self, v):
        self._eskf = v

    @property
    def vmap(self):
        return self._carry.vmap if self._carry is not None else self._vmap

    @vmap.setter
    def vmap(self, v):
        self._vmap = v

    # ------------------------------------------------------------------
    def process_scan(self, t: float, pts_body: np.ndarray, alpha: np.ndarray,
                     mask: np.ndarray, imu: tuple, external_pose=None
                     ) -> LioOutput | None:
        """One sweep. ``imu`` = (acc [n,3], gyr [n,3], dt [n]) covering the
        sweep; ``external_pose`` = (p, q) from the VIO IMU-rate stream
        (gravity-aligned), used when LiDAR degenerates."""
        cfg = self.cfg
        acc, gyr, dts = imu

        if not self.initialized:
            self._init_acc.extend(list(acc))
            self._init_gyr.extend(list(gyr))
            if len(self._init_acc) >= cfg.static_init_samples:
                self._static_init(external_pose)
                self._insert_scan(pts_body, alpha, mask,
                                  self._eskf.q, self._eskf.p,
                                  self._eskf.q, self._eskf.p)
                self.initialized = True
                self.frame_idx = 1
                return self._output(t, False, "")
            return None

        if self.fused:
            return self._process_scan_fused(t, pts_body, alpha, mask, imu,
                                            external_pose)
        return self._process_scan_legacy(t, pts_body, alpha, mask, imu,
                                         external_pose)

    # -- fused single-dispatch path --------------------------------------
    def _build_carry(self) -> fu.LioCarry:
        return fu.LioCarry(
            eskf=self._eskf, vmap=self._vmap,
            sw=fu.SwitchCarry.initial(self.q_fused, self.t_fused,
                                      self.last_q_ext, self.last_t_ext),
            frame_idx=jnp.asarray(self.frame_idx, jnp.int32))

    def _process_scan_fused(self, t, pts_body, alpha, mask, imu,
                            external_pose):
        if self._carry is None:
            self._carry = self._build_carry()
        acc, gyr, dts = imu
        if external_pose is not None:
            ext_p = np.asarray(external_pose[0], np.float32)
            ext_q = np.asarray(external_pose[1], np.float32)
            ext_valid = 1.0
        else:
            ext_p = np.zeros(3, np.float32)
            ext_q = np.array([1, 0, 0, 0], np.float32)
            ext_valid = 0.0
        buf = fu.pack_scan(pts_body, alpha, mask, acc, gyr, dts,
                           ext_p, ext_q, ext_valid, self.cfg.scan_buffer)
        self._last_buf = buf
        self._carry, rec, p_w, m_w = fu.lidar_tick(
            self._statics, self.cfg.scan_buffer, self._carry, buf)
        self.dispatch_count += 1
        self.frame_idx += 1
        self.last_cloud = (p_w, m_w)
        if self.pipelined:
            try:
                rec.copy_to_host_async()   # overlap the tunnel readback
            except AttributeError:
                pass
            prev, self._inflight = self._inflight, (t, rec)
            if prev is None:
                return None
            return self._emit_fused(*prev)
        return self._emit_fused(t, rec)

    def _emit_fused(self, t, rec_dev) -> LioOutput:
        r = fu.LioRecord.unpack(np.asarray(rec_dev))   # ONE readback
        # mirror the host switch state so save/restart see current values
        self.t_fused, self.q_fused = r.p_fused.copy(), r.q_fused.copy()
        self.last_t_lo, self.last_q_lo = r.p_lio.copy(), r.q_lio.copy()
        self.was_degenerate = r.degenerate
        if r.switched == "to_vio":
            self.has_entered_degenerate = True
        return LioOutput(
            t=t, p_fused=r.p_fused, q_fused=r.q_fused,
            p_lio=r.p_lio, q_lio=r.q_lio, degenerate=r.degenerate,
            switched=r.switched, n_corr=r.n_corr, sigma=r.sigma)

    def flush(self) -> LioOutput | None:
        """Drain the pipelined in-flight record (call at sequence end)."""
        if self._inflight is None:
            return None
        t, rec = self._inflight
        self._inflight = None
        return self._emit_fused(t, rec)

    # -- device-time instrumentation (bench.py breakdown) ----------------
    def device_replay(self, n: int = 10) -> float:
        """Seconds per DEVICE sweep step: back-to-back re-dispatch of the
        compiled tick on the last packed scan buffer, one final block —
        isolates device time from host pack + tunnel readback."""
        import time as _time
        assert self._carry is not None and self._last_buf is not None
        cc = self._carry
        cc, rec, _, _ = fu.lidar_tick(self._statics, self.cfg.scan_buffer,
                                      cc, self._last_buf)
        jax.block_until_ready(rec)
        t0 = _time.perf_counter()
        for _ in range(n):
            cc, rec, _, _ = fu.lidar_tick(self._statics,
                                          self.cfg.scan_buffer, cc,
                                          self._last_buf)
        jax.block_until_ready(rec)
        return (_time.perf_counter() - t0) / n

    def device_cost(self) -> dict:
        """XLA cost analysis (flops/bytes estimates) of the compiled tick."""
        assert self._carry is not None and self._last_buf is not None
        lowered = fu.lidar_tick.lower(
            self._statics, self.cfg.scan_buffer, self._carry,
            jnp.asarray(self._last_buf))
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return dict(ca) if ca else {}

    # -- legacy host-orchestrated path (equivalence oracle) --------------
    def _process_scan_legacy(self, t, pts_body, alpha, mask, imu,
                             external_pose):
        cfg = self.cfg
        acc, gyr, dts = imu

        # --- ESKF predict through the sweep -----------------------------
        q_begin, t_begin = self._eskf.q, self._eskf.p
        n = len(dts)
        m = np.ones((n,), np.float32)
        self._eskf, _ = ekf.predict_batch(
            self._eskf, jnp.asarray(acc[:n], jnp.float32),
            jnp.asarray(gyr[:n], jnp.float32), jnp.asarray(dts, jnp.float32),
            jnp.asarray(m), cfg.eskf_opt)
        q_end_pred, t_end_pred = self._eskf.q, self._eskf.p

        # --- CT-ICP ------------------------------------------------------
        kp, ka, km = self._keypoints(pts_body, alpha, mask)
        pose0 = ci.CtPose(q_begin=q_begin, t_begin=t_begin,
                          q_end=q_end_pred, t_end=t_end_pred)
        res = ci.ct_icp(pose0, jnp.asarray(kp, jnp.float32),
                        jnp.asarray(ka, jnp.float32),
                        jnp.asarray(km, jnp.float32),
                        cfg.icp_cfg, cfg.map_cfg, self._vmap, pred=pose0)

        degenerate = bool(res.degenerate)
        q_lo = np.asarray(res.pose.q_end)
        t_lo = np.asarray(res.pose.t_end)

        # ESKF observes the LIO pose (reference ObserveSE3(pose_lo, 1e-2, 1e-2))
        if not degenerate:
            self._eskf = ekf.observe_se3(
                self._eskf, jnp.asarray(t_lo, jnp.float32),
                jnp.asarray(q_lo, jnp.float32), 1e-2, 1e-2)
        elif external_pose is not None:
            # when degenerate, anchor the filter with the external pose to
            # keep prediction bounded (reference keeps publishing external)
            p_ext, q_ext = external_pose
            self._eskf = ekf.observe_se3(
                self._eskf, jnp.asarray(p_ext, jnp.float32),
                jnp.asarray(q_ext, jnp.float32), 1e-1, 1e-1)

        switched = self._switch(degenerate, q_lo, t_lo, external_pose)

        # --- map update (at the raw LIO pose, like the reference) --------
        # recenter the packed voxel codes when the pose nears the 10-bit
        # packing boundary (unbounded extent; reference lasermap_fov_segment
        # keeps its map local via 500 m eviction, lidarodom.cpp:1268)
        if vm.needs_recenter(self._vmap, t_lo, cfg.map_cfg):
            self._vmap = vm.recenter(self._vmap, jnp.asarray(t_lo, jnp.float32),
                                    cfg.map_cfg)
        self._insert_scan(pts_body, alpha, mask,
                          np.asarray(res.pose.q_begin), np.asarray(res.pose.t_begin),
                          q_lo, t_lo)
        if self.frame_idx % self.cfg.evict_every == 0:
            self._vmap = vm.evict_far(self._vmap, jnp.asarray(t_lo, jnp.float32),
                                     cfg.map_cfg)
        self.frame_idx += 1
        out = self._output(t, degenerate, switched)
        return out._replace(n_corr=int(res.n_corr),
                            sigma=np.asarray(res.sigma))

    # ------------------------------------------------------------------
    def _switch(self, degenerate, q_lo, t_lo, external_pose):
        """The reference's four-branch switch block (lidarodom.cpp:313-437)."""
        switched = ""
        if external_pose is not None:
            p_ext, q_ext = np.asarray(external_pose[0]), np.asarray(external_pose[1])
        else:
            p_ext, q_ext = self.last_t_ext, self.last_q_ext

        if self.frame_idx <= 1:
            self.first_is_degenerate = degenerate

        if degenerate:
            if not self.was_degenerate:
                switched = "to_vio"
                self.has_entered_degenerate = True
                # latch: external ⊕ off == fused (continuity)
                self.q_off, self.t_off = _latch_offset(
                    self.last_q_ext, self.last_t_ext,
                    self.q_fused, self.t_fused)
            q_f, t_f = _compose_offset(q_ext, p_ext, self.q_off, self.t_off)
            self.q_fused, self.t_fused = np.asarray(q_f), np.asarray(t_f)
            self.use_external = True
        else:
            if self.was_degenerate:
                switched = "to_lio"
                # latch: lio ⊕ off == fused
                self.q_off, self.t_off = _latch_offset(
                    self.last_q_lo, self.last_t_lo,
                    self.q_fused, self.t_fused)
            if self.has_entered_degenerate:
                q_f, t_f = _compose_offset(q_lo, t_lo, self.q_off, self.t_off)
                self.q_fused, self.t_fused = np.asarray(q_f), np.asarray(t_f)
            else:
                self.q_fused, self.t_fused = q_lo.copy(), t_lo.copy()
            self.use_external = False

        self.was_degenerate = degenerate
        self.last_q_lo, self.last_t_lo = q_lo.copy(), t_lo.copy()
        self.last_q_ext, self.last_t_ext = q_ext.copy(), p_ext.copy()
        return switched

    # ------------------------------------------------------------------
    def _keypoints(self, pts, alpha, mask):
        """Spatial grid subsample, host mirror of the fused device
        selection (one point per keypoint_cell voxel; reference
        subSampleFrame, main_eskf.cpp:58,89) — bit-exact with
        ``fused._subsample_codes`` + stable argsort."""
        K = self.cfg.max_keypoints
        n = pts.shape[0]
        pts = np.asarray(pts, np.float32)
        alpha = np.asarray(alpha, np.float32)
        mask = np.asarray(mask, np.float32)
        if n < K:
            pad = K - n
            pts = np.concatenate([pts, np.zeros((pad, 3), pts.dtype)])
            alpha = np.concatenate([alpha, np.zeros(pad, alpha.dtype)])
            mask = np.concatenate([mask, np.zeros(pad, mask.dtype)])
            n = K
        valid = mask > 0
        code = fu._subsample_codes(pts, self.cfg.keypoint_cell, valid)
        order = np.argsort(code, kind="stable")
        sc = code[order]
        firsts = np.concatenate(
            [[True], sc[1:] != sc[:-1]]) & (sc < fu._CODE_SENTINEL)
        sel = np.argsort(~firsts, kind="stable")[:K]
        take = order[sel]
        return pts[take], alpha[take], mask[take] * firsts[sel]

    def _insert_scan(self, pts, alpha, mask, q_b, t_b, q_e, t_e):
        pose = ci.CtPose(q_begin=jnp.asarray(q_b, jnp.float32),
                         t_begin=jnp.asarray(t_b, jnp.float32),
                         q_end=jnp.asarray(q_e, jnp.float32),
                         t_end=jnp.asarray(t_e, jnp.float32))
        p_w = ci.transform_points(pose, jnp.asarray(pts, jnp.float32),
                                  jnp.asarray(alpha, jnp.float32))
        # world-frame cloud published downstream (the reference's /scan
        # topic consumed by ImMesh, main_eskf.cpp:177-358)
        self.last_cloud = (p_w, jnp.asarray(mask, jnp.float32))
        self._vmap = vm.insert(self._vmap, p_w,
                              jnp.asarray(mask, jnp.float32), self.cfg.map_cfg,
                              center=jnp.asarray(t_e, jnp.float32))

    def _static_init(self, external_pose):
        acc = np.asarray(self._init_acc)
        gyr = np.asarray(self._init_gyr)
        bg = gyr.mean(axis=0)
        acc_mean = acc.mean(axis=0)
        R0 = np.asarray(lie.gravity_align(jnp.asarray(acc_mean, jnp.float32)))
        if external_pose is not None:
            # seed the world yaw from the external (VIO) stream so both
            # subsystems share one frame (reference stateInitialization
            # seeds the first LIO pose from VINS odom + gravity fix,
            # lidarodom.cpp:1352-1412); gravity alignment is kept, only
            # the free yaw is replaced
            R_ext = np.asarray(lie.quat_to_mat(
                jnp.asarray(external_pose[1], jnp.float32)))
            dyaw = np.arctan2(R_ext[1, 0], R_ext[0, 0]) \
                - np.arctan2(R0[1, 0], R0[0, 0])
            c, s = np.cos(dyaw), np.sin(dyaw)
            R0 = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]]) @ R0
        q0 = np.asarray(lie.mat_to_quat(jnp.asarray(R0, jnp.float32)))
        ba = acc_mean - R0.T @ np.array([0, 0, self.cfg.g_norm])
        self._eskf = self._eskf._replace(
            q=jnp.asarray(q0, jnp.float32),
            bg=jnp.asarray(bg, jnp.float32),
            ba=jnp.asarray(ba, jnp.float32))
        if external_pose is not None:
            p_ext, q_ext = external_pose
            self._eskf = self._eskf._replace(p=jnp.asarray(p_ext, jnp.float32))
            self.last_t_ext = np.asarray(p_ext, float).copy()
            self.last_q_ext = np.asarray(q_ext, float).copy()
        # continuity anchors start at the init pose
        self.t_fused = np.asarray(self._eskf.p, float).copy()
        self.q_fused = np.asarray(self._eskf.q, float).copy()
        self.last_t_lo = self.t_fused.copy()
        self.last_q_lo = self.q_fused.copy()

    def _output(self, t, degenerate, switched):
        return LioOutput(
            t=t, p_fused=self.t_fused.copy(), q_fused=self.q_fused.copy(),
            p_lio=np.asarray(self.last_t_lo), q_lio=np.asarray(self.last_q_lo),
            degenerate=degenerate, switched=switched, n_corr=0,
            sigma=np.zeros(3))
