"""IMU-rate propagated odometry (reference fastPredictIMU +
getClosestOdom: estimator.cpp:324-352, lidarodom.cpp:761-800)."""

import numpy as np

from ground_fusion2_tpu.data import synthetic as sim
from ground_fusion2_tpu.vio.fast_predict import FastPropagator, slerp


def _traj(duration=6.0, speed=0.8, yaw_rate=0.4):
    return sim.make_planar_trajectory(duration=duration, speed=speed,
                                      yaw_rate=yaw_rate, static_time=0.5,
                                      ramp_time=0.4)


def _chunk(traj, i0, i1):
    return (traj.acc_body[i0:i1 + 1].astype(np.float32),
            traj.gyr_body[i0:i1 + 1].astype(np.float32),
            np.full((i1 - i0,), 0.005, np.float32))


def test_propagator_tracks_truth_between_solves():
    """Feed 200 Hz IMU in 10 Hz chunks, rebase from ground truth each
    chunk: the mid-interval propagated pose must stay centimetre-true
    (the whole point: a 100 ms-stale pose at 1 m/s is a 10 cm error)."""
    traj = _traj()
    prop = FastPropagator(g_norm=9.81)
    spf = 20
    n_frames = int(len(traj.t) - 1) // spf
    errs = []
    for k in range(n_frames):
        i0, i1 = k * spf, (k + 1) * spf
        prop.feed_chunk(traj.t[i1], _chunk(traj, i0, i1))
        prop.rebase(traj.t[i1], traj.p[i1], traj.q[i1], traj.v[i1])
        if k >= 2:
            # query mid-NEXT-interval: pose must interpolate/propagate,
            # not hold the last tick
            tq = traj.t[i1] + 0.05
            j = i1 + 10
            if j < len(traj.t):
                # feed the next half-chunk first (the LIO's own timeline)
                prop.feed_chunk(traj.t[j], _chunk(traj, i1, j))
                p, q = prop.lookup(tq)
                errs.append(np.linalg.norm(p - traj.p[j]))
    assert errs, "no queries ran"
    assert float(np.median(errs)) < 0.02, np.median(errs)
    # the stale last-tick pose at the same query times is ~speed*50ms off;
    # the propagated lookup must beat it by a wide margin
    stale = 0.8 * 0.05
    assert float(np.median(errs)) < 0.4 * stale


def test_lookup_interpolates_not_nearest():
    prop = FastPropagator()
    prop.valid = True
    q0 = np.array([1.0, 0, 0, 0])
    th = 0.2
    q1 = np.array([np.cos(th / 2), 0, 0, np.sin(th / 2)])
    prop._buf = [(0.0, np.zeros(3), q0), (0.1, np.array([1.0, 0, 0]), q1)]
    p, q = prop.lookup(0.05)
    assert abs(p[0] - 0.5) < 1e-9
    # half-angle yaw
    assert abs(2 * np.arctan2(q[3], q[0]) - th / 2) < 1e-6
    # clamped outside the buffer
    p_lo, _ = prop.lookup(-1.0)
    p_hi, _ = prop.lookup(9.0)
    assert np.allclose(p_lo, [0, 0, 0]) and np.allclose(p_hi, [1, 0, 0])


def test_rebase_replays_newer_samples():
    """A lagged (pipelined) solve must rewrite the buffered stream after
    its timestamp by replaying the logged IMU samples."""
    traj = _traj(duration=3.0)
    prop = FastPropagator()
    spf = 20
    # two chunks in, then rebase at the FIRST chunk's end (one-frame lag)
    prop.feed_chunk(traj.t[spf], _chunk(traj, 0, spf))
    prop.feed_chunk(traj.t[2 * spf], _chunk(traj, spf, 2 * spf))
    prop.rebase(traj.t[spf], traj.p[spf], traj.q[spf], traj.v[spf])
    p, _ = prop.lookup(traj.t[2 * spf])
    assert np.linalg.norm(p - traj.p[2 * spf]) < 0.02


def test_slerp_shortest_path():
    q0 = np.array([1.0, 0, 0, 0])
    q1 = -np.array([np.cos(0.1), 0, 0, np.sin(0.1)])   # negated rep
    q = slerp(q0, q1, 0.5)
    # must interpolate the short way (~0.1 rad yaw), not the 2pi-0.2 way
    assert abs(abs(2 * np.arctan2(q[3], q[0])) - 0.1) < 1e-6
