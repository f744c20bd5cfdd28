"""Fused single-dispatch LIO tick: equivalence with the legacy path,
dispatch counting, switch-state parity, and overflow eviction bias."""

import numpy as np
import jax.numpy as jnp
import pytest

from ground_fusion2_tpu.data import synthetic as sim
from ground_fusion2_tpu.lio import voxel_map as vm
from ground_fusion2_tpu.lio.ct_icp import CtIcpConfig
from ground_fusion2_tpu.lio.odometry import LidarOdometry, LioConfig


def _make_scans(duration=4.0, scan_rate=10.0, imu_rate=200.0, speed=0.6,
                n_rays=2048, seed=0):
    lidar = sim.LidarSim.room(x=(-4, 12), y=(-5, 5), n_rays=n_rays, seed=seed)
    traj = sim.make_planar_trajectory(
        duration=duration, imu_rate=imu_rate, speed=speed, yaw_rate=0.2,
        static_time=1.0, ramp_time=0.5)
    traj.p[:, 2] += 1.0
    rng = np.random.default_rng(seed)
    spf = int(imu_rate / scan_rate)
    scans = []
    for k in range(int(duration * scan_rate) - 1):
        i0, i1 = k * spf, (k + 1) * spf
        pts, alpha, valid = lidar.scan(
            traj.p[i0], traj.q[i0], traj.p[i1], traj.q[i1], rng=rng)
        imu = (traj.acc_body[i0:i1 + 1], traj.gyr_body[i0:i1 + 1],
               np.full((spf,), 1.0 / imu_rate, np.float32))
        ext = (traj.p[i1], traj.q[i1])
        scans.append((traj.t[i1], pts, alpha, valid, imu, ext))
    return scans


def _cfg():
    return LioConfig(
        map_cfg=vm.VoxelMapConfig(capacity=1 << 15, max_range=50.0),
        icp_cfg=CtIcpConfig(outer_iters=4),
        static_init_samples=100, scan_buffer=2048)


@pytest.mark.slow
def test_fused_matches_legacy():
    """Same scans through the fused device tick and the host-orchestrated
    path: identical math ⇒ near-identical trajectories (fp ordering only)."""
    scans = _make_scans()
    lo_f = LidarOdometry(_cfg(), fused=True)
    lo_l = LidarOdometry(_cfg(), fused=False)
    for (t, pts, alpha, valid, imu, ext) in scans:
        of = lo_f.process_scan(t, pts, alpha, valid, imu, external_pose=ext)
        ol = lo_l.process_scan(t, pts, alpha, valid, imu, external_pose=ext)
        assert (of is None) == (ol is None)
        if of is not None:
            np.testing.assert_allclose(of.p_fused, ol.p_fused, atol=5e-3)
            assert of.degenerate == ol.degenerate
            assert of.switched == ol.switched
    # map contents also agree (same inserts; fused pads with masked zeros)
    nf = int(jnp.sum(lo_f._carry.vmap.code != vm.INVALID))
    nl = int(jnp.sum(lo_l.vmap.code != vm.INVALID))
    assert abs(nf - nl) <= max(8, 0.01 * nl), (nf, nl)


def test_fused_single_dispatch_per_scan():
    """Post-init, every sweep is exactly ONE fused device dispatch."""
    scans = _make_scans(duration=2.5)
    lo = LidarOdometry(_cfg(), fused=True)
    n_ticks = 0
    for (t, pts, alpha, valid, imu, ext) in scans:
        out = lo.process_scan(t, pts, alpha, valid, imu, external_pose=ext)
        if out is not None and lo._carry is not None:
            n_ticks += 1
    # static-init frame is excluded by the _carry check (no dispatch there)
    assert lo.dispatch_count == n_ticks, (lo.dispatch_count, n_ticks)


@pytest.mark.slow
def test_fused_pipelined_lags_one():
    scans = _make_scans(duration=2.5)
    lo_s = LidarOdometry(_cfg(), fused=True)
    lo_p = LidarOdometry(_cfg(), fused=True, pipelined=True)
    outs_s, outs_p = [], []
    for (t, pts, alpha, valid, imu, ext) in scans:
        o = lo_s.process_scan(t, pts, alpha, valid, imu, external_pose=ext)
        if o is not None and lo_s.dispatch_count > 0:
            outs_s.append(o)
        o = lo_p.process_scan(t, pts, alpha, valid, imu, external_pose=ext)
        if o is not None and lo_p.dispatch_count > 0:
            outs_p.append(o)
    tail = lo_p.flush()
    if tail is not None:
        outs_p.append(tail)
    assert len(outs_s) == len(outs_p)
    for a, b in zip(outs_s, outs_p):
        assert a.t == b.t
        np.testing.assert_allclose(a.p_fused, b.p_fused, atol=1e-5)


def test_insert_overflow_keeps_near_points(rng):
    """On capacity overflow no near point is evicted while far ones stay
    (reference evicts by distance, lidarodom.cpp:1268; the old code-order
    truncation dropped the +x/+y/+z corner instead)."""
    cfg = vm.VoxelMapConfig(capacity=512, voxel_size=0.2, max_per_voxel=20)
    m = vm.VoxelMap.empty(cfg)
    near = rng.uniform(-3, 3, size=(400, 3)).astype(np.float32)
    far = rng.uniform(20, 40, size=(512, 3)).astype(np.float32) \
        * np.sign(rng.normal(size=(512, 3))).astype(np.float32)
    pts = jnp.asarray(np.concatenate([near, far]))
    m = vm.insert(m, pts, jnp.ones((912,)), cfg, center=jnp.zeros(3))
    kept = m.pts[m.code != vm.INVALID]
    d = np.linalg.norm(np.asarray(kept), axis=-1)
    n_near, n_far = int((d < 6.0).sum()), int((d > 6.0).sum())
    # capacity is filled, every (deduped) near point kept, far = filler only
    assert kept.shape[0] == 512
    assert n_near >= 390, n_near
    assert n_far == 512 - n_near


def test_insert_no_overflow_is_lossless(rng):
    """Below capacity the ``center`` argument must not evict anything."""
    cfg = vm.VoxelMapConfig(capacity=4096, voxel_size=0.2, max_per_voxel=20)
    m0 = vm.VoxelMap.empty(cfg)
    pts = jnp.asarray(rng.uniform(-8, 8, size=(1500, 3)), jnp.float32)
    m1 = vm.insert(m0, pts, jnp.ones((1500,)), cfg)
    m2 = vm.insert(m0, pts, jnp.ones((1500,)), cfg, center=jnp.zeros(3))
    assert int(jnp.sum(m1.code != vm.INVALID)) \
        == int(jnp.sum(m2.code != vm.INVALID))
    np.testing.assert_array_equal(np.asarray(m1.code), np.asarray(m2.code))


def test_spatial_subsample_balances_density_skew():
    """Keypoints per cell bounded at 1: on a scan with a 10:1 density skew
    (dense near wall vs sparse far wall) the index stride kept ~10x more
    near points; the spatial subsample must keep the two walls' keypoint
    counts within ~2x (reference subSampleFrame, main_eskf.cpp:58,89)."""
    import numpy as np
    from ground_fusion2_tpu.lio import fused as fu

    rng = np.random.default_rng(0)
    # near wall at x=1 (dense): 3600 pts over 4 m^2; far wall at x=20
    # (sparse): 360 pts over the same extent
    near = np.stack([np.full(3600, 1.0),
                     rng.uniform(-1, 1, 3600),
                     rng.uniform(0, 2, 3600)], 1).astype(np.float32)
    far = np.stack([np.full(360, 20.0),
                    rng.uniform(-1, 1, 360),
                    rng.uniform(0, 2, 360)], 1).astype(np.float32)
    pts = np.concatenate([near, far])
    N = pts.shape[0]
    valid = np.ones((N,), bool)
    K = 512
    code = fu._subsample_codes(pts, 0.25, valid)
    order = np.argsort(code, kind="stable")
    sc = code[order]
    firsts = np.concatenate([[True], sc[1:] != sc[:-1]]) \
        & (sc < fu._CODE_SENTINEL)
    sel = np.argsort(~firsts, kind="stable")[:K]
    take = order[sel]
    kept = take[firsts[sel]]
    n_near = int((pts[kept][:, 0] < 10).sum())
    n_far = int((pts[kept][:, 0] >= 10).sum())
    assert n_far > 0
    # 0.25 m cells on a 2x2 m wall -> ~64 occupied cells per wall; the
    # dense wall fills them all, the sparse wall most — ratio bounded
    assert n_near / n_far < 2.0, (n_near, n_far)
    # the old stride would keep 10:1
    stride = (np.arange(K) * (N - 1)) // (K - 1)
    s_near = int((pts[stride][:, 0] < 10).sum())
    s_far = max(int((pts[stride][:, 0] >= 10).sum()), 1)
    assert s_near / s_far > 5.0
