"""M3DGR-format synthetic sequence: generation + full-pipeline replay.

The reference's validation story is rosbag replay of M3DGR sequences with
the shipped calibration (``/root/reference/README.md:146-189``). Real bags
are not redistributable with this repo, so this module synthesizes a
sequence *in the exact on-disk format and calibration* of the converted
M3DGR logs (``tools/rosbag_to_gf2log.py`` output): rendered 640x480 RGB-D
frames through the real intrinsics, IMU/wheel at real rates with the real
noise figures, LiDAR sweeps in the LiDAR frame behind the real extrinsics —
written to the native TLV log and replayed through the *complete* pipeline
(CLAHE -> KLT -> RANSAC -> VIO -> LIO -> switch), exactly the path a real
M3DGR bag takes after conversion.

Calibration source of truth: ``configs/m3dgr.yaml`` (values lifted from
``Ground-Fusion++/config/realsense/m3dgr.yaml:46-53`` and
``lio/config/m3dgr.yaml:15-18``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..config.loader import SystemYamlConfig, load_config
from ..runtime import native_bindings as nb
from . import synthetic as sim
from .render import SceneRenderer, make_room_scene

# RealSense-style IMU mount: body(IMU) axes in vehicle coordinates
# (vehicle: x forward, y left, z up; body: x right, y down, z forward).
R_VB = np.array([
    [0.0, 0.0, 1.0],
    [-1.0, 0.0, 0.0],
    [0.0, -1.0, 0.0],
])


def _mat_to_quat(R):
    w = np.sqrt(max(1.0 + R[0, 0] + R[1, 1] + R[2, 2], 1e-12)) / 2
    x = (R[2, 1] - R[1, 2]) / (4 * w)
    y = (R[0, 2] - R[2, 0]) / (4 * w)
    z = (R[1, 0] - R[0, 1]) / (4 * w)
    q = np.array([w, x, y, z])
    return q / np.linalg.norm(q)


def _quat_to_mat(q):
    return sim._quat_to_mat(q)


def generate_m3dgr_log(
    path: str,
    config: SystemYamlConfig,
    duration: float = 12.0,
    imu_rate: float = 200.0,
    cam_rate: float = 15.0,
    lidar_rate: float = 10.0,
    speed: float = 0.8,
    yaw_rate: float = 0.35,
    with_lidar: bool = True,
    seed: int = 0,
    stops: tuple = (),
    scene_rects=None,
    lidar_sim=None,
    image_effect=None,
    gnss_provider=None,
) -> None:
    """Render + write one sequence to ``path`` in the converted-bag format.

    Scenario hooks (degraded-sequence campaign, ``data/scenarios.py``):
    ``stops`` mid-sequence dwell intervals; ``scene_rects``/``lidar_sim``
    override the default room geometry (e.g. a degenerate corridor);
    ``image_effect(t, gray, depth) -> (gray, depth)`` post-processes
    rendered frames (dark stretches, dynamic occluders);
    ``gnss_provider(t, p_world, v_world) -> rows|None`` emits REC_GNSS
    epochs (rows from ``scenarios.gnss_to_rows``)."""
    raw_cam = config.cam_intrinsics
    fx, fy = raw_cam["fx"], raw_cam["fy"]
    cx, cy = raw_cam["cx"], raw_cam["cy"]
    W, H = raw_cam["width"], raw_cam["height"]
    g_norm = config.estimator.g_norm
    rng = np.random.default_rng(seed)

    traj = sim.make_planar_trajectory(
        duration=duration, imu_rate=imu_rate, speed=speed, yaw_rate=yaw_rate,
        wobble=0.02, static_time=1.5, ramp_time=1.0, stops=stops)
    n = traj.t.shape[0]

    # vehicle -> body resampling of IMU ground truth; specific force is
    # recomputed with the configured gravity magnitude (g_norm 9.7944)
    grav = np.array([0.0, 0.0, -g_norm])
    dt = 1.0 / imu_rate
    a_world = np.gradient(traj.v, dt, axis=0)
    acc_b = np.zeros((n, 3), np.float32)
    gyr_b = np.zeros((n, 3), np.float32)
    q_wb = np.zeros((n, 4), np.float64)
    for i in range(n):
        R_wv = _quat_to_mat(traj.q[i])
        R_wb = R_wv @ R_VB
        q_wb[i] = _mat_to_quat(R_wb)
        acc_b[i] = R_wb.T @ (a_world[i] - grav)
        gyr_b[i] = R_VB.T @ traj.gyr_body[i]

    imu_noise = config.estimator.imu_noise
    acc_meas = acc_b + rng.normal(scale=imu_noise.acc_n * np.sqrt(imu_rate),
                                  size=acc_b.shape).astype(np.float32) * 0.1
    gyr_meas = gyr_b + rng.normal(scale=imu_noise.gyr_n * np.sqrt(imu_rate),
                                  size=gyr_b.shape).astype(np.float32) * 0.1

    # wheel: odometer twist in the WHEEL frame (body_T_wheel lever arm +
    # rotation applied — a real encoder reports vehicle-frame velocity, the
    # reference's wheel topic semantics, rosNodeTest.cpp:147-167)
    r_io = config.r_io
    t_io = config.t_io
    wvel = np.zeros((n, 3), np.float32)
    for i in range(n):
        R_wb = _quat_to_mat(q_wb[i])
        v_o_body = R_wb.T @ traj.v[i] + np.cross(gyr_b[i], t_io)
        wvel[i] = r_io.T @ v_o_body

    # scene + renderer (camera behind the real body_T_cam0)
    rects = scene_rects if scene_rects is not None else \
        make_room_scene(x=(-10, 14), y=(-7, 7), h=3.0, seed=seed)
    renderer = SceneRenderer(rects, fx, fy, cx, cy, W, H)
    ric, tic = config.ric, config.tic

    lidar = None
    if with_lidar:
        lidar = lidar_sim if lidar_sim is not None else \
            sim.LidarSim.room(x=(-10, 14), y=(-7, 7), z=(0.0, 3.0),
                              n_rays=4096, noise=0.01, seed=seed)
    r_il, t_il = config.r_il, config.t_il

    writer = nb.LogWriter(path)
    cam_every = int(round(imu_rate / cam_rate))
    lid_every = int(round(imu_rate / lidar_rate))
    z_cam = 0.4  # sensor height above ground

    for i in range(n):
        t = traj.t[i]
        writer.write(nb.REC_IMU, t, np.concatenate(
            [acc_meas[i], gyr_meas[i]]).astype(np.float32))
        if i % 4 == 0:   # wheel at 50 Hz
            writer.write(nb.REC_WHEEL, t, wvel[i].astype(np.float32))
        writer.write(nb.REC_GT, t, np.concatenate(
            [traj.p[i] + [0, 0, z_cam], q_wb[i]]).astype(np.float32))

        if gnss_provider is not None:
            rows = gnss_provider(t, traj.p[i] + [0, 0, z_cam], traj.v[i])
            if rows is not None and len(rows):
                hdr = np.asarray([len(rows)], np.uint32).view(np.uint8)
                writer.write(nb.REC_GNSS, t, np.concatenate(
                    [hdr, np.asarray(rows, np.float64)
                     .reshape(-1).view(np.uint8)]))

        if i % cam_every == 0:
            R_wb = _quat_to_mat(q_wb[i])
            p_wb = traj.p[i] + np.array([0, 0, z_cam])
            R_wc = R_wb @ ric
            p_wc = p_wb + R_wb @ tic
            gray, depth = renderer.render(p_wc, R_wc)
            if image_effect is not None:
                gray, depth = image_effect(t, gray, depth)
            img_u8 = np.clip(gray * 255.0, 0, 255).astype(np.uint8)
            hdr = np.array([H, W], np.uint32).view(np.uint8)
            writer.write(nb.REC_IMAGE, t,
                         np.concatenate([hdr, img_u8.reshape(-1)]))
            depth_mm = np.clip(depth * 1000.0, 0, 65535).astype(np.uint16)
            writer.write(nb.REC_DEPTH, t, np.concatenate(
                [hdr, depth_mm.reshape(-1).view(np.uint8)]))

        if lidar is not None and i % lid_every == 0 and i + lid_every < n:
            j = i + lid_every
            # lidar pose at sweep begin/end: T_wl = T_wb T_bl
            def lid_pose(k):
                R_wb = _quat_to_mat(q_wb[k])
                p_wb = traj.p[k] + np.array([0, 0, z_cam])
                return p_wb + R_wb @ t_il, _mat_to_quat(R_wb @ r_il)
            p0, q0 = lid_pose(i)
            p1, q1 = lid_pose(j)
            pts_l, alpha, valid = lidar.scan(p0, q0, p1, q1, rng=rng)
            keep = valid > 0
            pts4 = np.concatenate(
                [pts_l[keep], alpha[keep][:, None]], axis=1).astype(np.float32)
            hdr = np.asarray([pts4.shape[0]], np.uint32).view(np.uint8)
            writer.write(nb.REC_CLOUD, traj.t[j], np.concatenate(
                [hdr, pts4.reshape(-1).view(np.uint8)]))
    writer.close()


@dataclass
class ReplayResult:
    t: np.ndarray
    est_p: np.ndarray      # fused output trajectory (body frame)
    gt_p: np.ndarray
    est_p_vio: np.ndarray  # VIO odometry stream
    gt_p_vio: np.ndarray
    n_switches: int
    outputs: list
    mesh_stats: dict | None = None
    occ_prob: "np.ndarray | None" = None
    n_loops: "int | None" = None


def _occ_cfg():
    """Grid sized for the rendered room scene (±10 m × ±6 m)."""
    from ..mapping.occupancy import GridConfig
    return GridConfig(size_x=320, size_y=240, init_x=160, init_y=120,
                      cell_size=0.1, max_range=12.0)


def replay_m3dgr_log(
    log_path: str,
    config: SystemYamlConfig,
    num_feats: int = 96,
    process_every: int = 2,      # reference: every 2nd image (estimator.cpp:226)
    use_lidar: bool = True,
    use_mesh: bool = False,
    mesh_ply: str | None = None,
    mesh_drain_every: int = 4,
    use_occupancy: bool = False,
    use_loop: bool = False,
    use_gnss: bool = False,
    use_global: bool = False,
    mesh_every: int = 1,
    loop_optimize_min_gap: int = 1,
) -> ReplayResult:
    """Replay a log through the complete pipeline; returns trajectories.

    ``use_mesh`` feeds the LIO's world clouds + fused poses + camera images
    through the online mesher (the reference's ImMesh intake,
    ``ImMesh_mesh_reconstruction.cpp:734-800``); ``mesh_ply`` exports the
    textured mesh at the end. ``use_loop`` wires the dense_map pose-graph
    analog (keyframe images feed BRIEF place recognition); ``use_gnss``
    consumes REC_GNSS epochs into the tightly-coupled window; ``use_global``
    feeds SPP fixes as global-fusion anchors (globalOpt.cpp).
    ``mesh_every``: feed the mesher every Nth sweep — the reconstruction
    is the dominant CPU cost at campaign scale and mapping density is not
    an ATE input (the reference's meshing thread similarly lags behind
    the odometry when loaded, README.md:237)."""
    import jax.numpy as jnp

    from ..frontend.tracker import FeatureTracker, TrackerConfig
    from ..core.cameras import Pinhole
    from ..system import GroundFusion, SystemConfig
    from ..vio.estimator import EstimatorConfig

    raw_cam = config.cam_intrinsics
    fx = raw_cam["fx"]
    cam = Pinhole.create(fx, raw_cam["fy"], raw_cam["cx"], raw_cam["cy"])
    d_lo, d_hi = raw_cam.get("depth_range", (0.1, 3.0))
    tracker = FeatureTracker(TrackerConfig(
        num_slots=num_feats, equalize=bool(raw_cam.get("equalize", 1)),
        use_ransac=True, focal=fx,
        depth_range=(d_lo, d_hi)), cam)

    gnss_on = use_gnss or config.use_gnss
    est_cfg = EstimatorConfig(
        num_feats=num_feats,
        vio=config.estimator.vio._replace(num_feats=num_feats,
                                          use_gnss=gnss_on),
        imu_noise=config.estimator.imu_noise,
        wheel_noise=config.estimator.wheel_noise,
        min_parallax=config.estimator.min_parallax,
        use_wheel=config.estimator.use_wheel,
        use_gnss=gnss_on,
        g_norm=config.estimator.g_norm)
    gf = GroundFusion(SystemConfig(vio=est_cfg, lio=config.lio,
                                   use_lidar=use_lidar and config.use_lidar,
                                   use_mesh=use_mesh,
                                   use_occupancy_grid=use_occupancy,
                                   occupancy=_occ_cfg() if use_occupancy
                                   else None,
                                   use_loop_closure=use_loop,
                                   use_global_fusion=use_global,
                                   mesh_drain_every=mesh_drain_every,
                                   mesh_every=mesh_every,
                                   loop_optimize_min_gap=loop_optimize_min_gap,
                                   cam_intr=(raw_cam["fx"], raw_cam["fy"],
                                             raw_cam["cx"], raw_cam["cy"]),
                                   mesh_intrinsics=(
                                       raw_cam["fx"], raw_cam["fy"],
                                       raw_cam["cx"], raw_cam["cy"])),
                      tic=config.tic, ric=config.ric,
                      tio=config.t_io, rio=config.r_io)

    # ingest state
    imu_t, imu_acc, imu_gyr = [], [], []
    wheel_t, wheel_v = [], []
    last_cam_imu_idx = 0
    pend_img = None
    img_count = 0
    gt_t, gt_p = [], []
    vio_t, vio_p = [], []
    fused_t, fused_p = [], []
    n_switch = 0
    outputs = []
    lid_last_idx = 0
    r_il, t_il = config.r_il, config.t_il
    pend_gnss = None           # epoch awaiting the next processed frame
    pend_gps_enu = None        # SPP fix (ENU rel. first fix) for global opt
    first_fix = None

    def imu_chunk(i0, i1):
        a = np.asarray(imu_acc[i0:i1 + 1], np.float32)
        g = np.asarray(imu_gyr[i0:i1 + 1], np.float32)
        ts = np.asarray(imu_t[i0:i1 + 1])
        dts = np.diff(ts).astype(np.float32)
        return a, g, dts

    def wheel_chunk(i0, i1):
        """Wheel velocity resampled at the IMU stamps of the chunk."""
        ts = np.asarray(imu_t[i0:i1 + 1])
        if not wheel_t:
            return np.zeros((len(ts), 3), np.float32)
        wt = np.asarray(wheel_t)
        wv = np.asarray(wheel_v)
        out = np.stack([np.interp(ts, wt, wv[:, k]) for k in range(3)], -1)
        return out.astype(np.float32)

    reader = nb.LogReader(log_path)
    while True:
        rec = reader.read()
        if rec is None:
            break
        ty, t, buf = rec
        if ty == nb.REC_IMU:
            v = np.frombuffer(buf, np.float32)
            imu_t.append(t); imu_acc.append(v[:3]); imu_gyr.append(v[3:6])
        elif ty == nb.REC_WHEEL:
            wheel_t.append(t); wheel_v.append(np.frombuffer(buf, np.float32))
        elif ty == nb.REC_GT:
            v = np.frombuffer(buf, np.float32)
            gt_t.append(t); gt_p.append(v[:3].copy())
        elif ty == nb.REC_IMAGE:
            h, w = np.frombuffer(buf[:8], np.uint32)
            img = np.frombuffer(buf[8:8 + h * w], np.uint8).reshape(h, w)
            pend_img = (t, img.astype(np.float32) / 255.0)
        elif ty == nb.REC_DEPTH and pend_img is not None \
                and abs(pend_img[0] - t) < 0.003:
            img_count += 1
            if (img_count - 1) % process_every:
                continue
            h, w = np.frombuffer(buf[:8], np.uint32)
            depth = np.frombuffer(
                buf[8:8 + 2 * h * w], np.uint16).reshape(h, w) / 1000.0
            ti, img = pend_img
            i1 = len(imu_t) - 1
            if i1 <= last_cam_imu_idx:
                continue
            obs = tracker.track(ti, jnp.asarray(img),
                                jnp.asarray(depth.astype(np.float32)))
            out = gf.process_camera(
                ti, obs, imu_chunk(last_cam_imu_idx, i1),
                wheel_vel=wheel_chunk(last_cam_imu_idx, i1),
                gnss_meas=pend_gnss,
                img=img if use_loop else None,
                depth_img=depth.astype(np.float32) if use_loop else None,
                gps_enu=pend_gps_enu if use_global else None,
                gps_std=1.5)
            pend_gnss = pend_gps_enu = None
            last_cam_imu_idx = i1
            outputs.append(out)
            if out.initialized:
                vio_t.append(ti); vio_p.append(out.p.copy())
        elif ty == nb.REC_GNSS and (use_gnss or use_global):
            from .scenarios import rows_to_meas
            n_sat = int(np.frombuffer(buf[:4], np.uint32)[0])
            rows = np.frombuffer(
                buf[4:4 + 136 * n_sat], np.float64).reshape(n_sat, 17)
            meas = rows_to_meas(rows)
            if use_gnss:
                pend_gnss = meas
            if use_global and len(meas) >= 5:
                from ..gnss.frames import ecef2rotation
                from ..gnss.spp import spp_position
                fix, _, ok = spp_position(meas)
                if ok:
                    if first_fix is None:
                        first_fix = fix.copy()
                    pend_gps_enu = ecef2rotation(first_fix) @ (fix - first_fix)
        elif ty == nb.REC_CLOUD and use_lidar and config.use_lidar:
            nn = int(np.frombuffer(buf[:4], np.uint32)[0])
            pts4 = np.frombuffer(buf[4:4 + 16 * nn], np.float32).reshape(nn, 4)
            # lidar frame -> body frame (the converter's cloud_convert step)
            pts_b = pts4[:, :3] @ r_il.T + t_il[None, :]
            i1 = len(imu_t) - 1
            if i1 <= lid_last_idx:
                continue
            mesh_kwargs = {}
            if use_mesh and pend_img is not None \
                    and gf.latest_vio is not None \
                    and gf.latest_vio.initialized:
                # texture camera pose = latest VIO body pose o cam extrinsic
                from ..core import lie as _lie
                import jax.numpy as _jnp
                R_wb = np.asarray(_lie.quat_to_mat(
                    _jnp.asarray(gf.latest_vio.q, _jnp.float32)))
                r_wc = R_wb @ config.ric
                t_wc = gf.latest_vio.p + R_wb @ config.tic
                img3 = np.repeat((pend_img[1] * 255.0)[:, :, None], 3, axis=2)
                mesh_kwargs = dict(img=img3.astype(np.float32),
                                   cam_pose_world=(r_wc, t_wc))
            lo = gf.process_lidar(
                t, pts_b.astype(np.float32), pts4[:, 3].copy(),
                np.ones((nn,), np.float32), imu_chunk(lid_last_idx, i1),
                **mesh_kwargs)
            lid_last_idx = i1
            if lo is not None:
                fused_t.append(t); fused_p.append(np.asarray(lo.p_fused))
                if lo.switched:
                    n_switch += 1
    reader.close()

    gt_t = np.asarray(gt_t)
    gt_p = np.asarray(gt_p)

    def gt_at(ts):
        return np.stack([np.interp(ts, gt_t, gt_p[:, k]) for k in range(3)], -1)

    occ_prob = gf.occ_grid.prob() if gf.occ_grid is not None else None
    mesh_stats = None
    if gf.mesher is not None:
        mesh_stats = gf.mesher.stats()
        if mesh_ply:
            nv, nf = gf.mesher.export_ply(mesh_ply)
            mesh_stats["exported"] = (nv, nf)

    est_p = np.asarray(fused_p) if fused_p else np.zeros((0, 3))
    est_t = np.asarray(fused_t) if fused_t else np.zeros((0,))
    vio_p = np.asarray(vio_p) if vio_p else np.zeros((0, 3))
    vio_ts = np.asarray(vio_t) if vio_t else np.zeros((0,))
    n_loops = None
    if use_loop:
        n_loops = sum(1 for e in gf.telemetry.events
                      if str(e.get("kind", "")).startswith("loop_closed"))
    # when no LiDAR ran (camera-only scenario) the fused output IS the VIO
    if len(est_t) == 0 and len(vio_ts):
        est_t, est_p = vio_ts, vio_p
    return ReplayResult(
        t=est_t, est_p=est_p, gt_p=gt_at(est_t) if len(est_t) else est_p,
        est_p_vio=vio_p, gt_p_vio=gt_at(vio_ts) if len(vio_ts) else vio_p,
        n_switches=n_switch, outputs=outputs, mesh_stats=mesh_stats,
        occ_prob=occ_prob, n_loops=n_loops)
