"""Dataset log replay + conversion.

The reference replays rosbags through ROS topics; here sequences live in the
native TLV log (``runtime/native/gf2_runtime.cc``) and replay is a simple
time-ordered record iterator feeding :class:`~ground_fusion2_tpu.system.GroundFusion`.
``tools/rosbag_to_gf2log.py`` converts M3DGR/M2DGR-plus bags offline.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..runtime import native_bindings as nb


@dataclass
class Record:
    type: int
    t: float
    payload: bytes | np.ndarray


def write_synthetic_log(path: str, traj, acc, gyr, wvel,
                        clouds=None, imu_rate: float = 200.0):
    """Dump a simulated sequence (arrays from data/synthetic) to a log."""
    w = nb.LogWriter(path)
    n = acc.shape[0]
    cloud_iter = iter(clouds or [])
    next_cloud = next(cloud_iter, None)
    for i in range(n):
        t = i / imu_rate
        w.write(nb.REC_IMU, t,
                np.concatenate([acc[i], gyr[i]]).astype(np.float32))
        w.write(nb.REC_WHEEL, t, wvel[i].astype(np.float32))
        w.write(nb.REC_GT, t, np.concatenate(
            [traj.p[i], traj.q[i]]).astype(np.float32))
        while next_cloud is not None and next_cloud[0] <= t:
            tc, pts_xyzt = next_cloud
            hdr = np.asarray([pts_xyzt.shape[0]], np.uint32).view(np.uint8)
            payload = np.concatenate(
                [hdr, pts_xyzt.astype(np.float32).reshape(-1).view(np.uint8)])
            w.write(nb.REC_CLOUD, tc, payload)
            next_cloud = next(cloud_iter, None)
    w.close()


def read_log(path: str):
    """Yield (type, t, decoded payload) records in file order."""
    r = nb.LogReader(path)
    try:
        while True:
            rec = r.read()
            if rec is None:
                return
            ty, t, buf = rec
            if ty == nb.REC_IMU:
                v = np.frombuffer(buf, np.float32)
                yield ty, t, (v[:3], v[3:6])
            elif ty == nb.REC_WHEEL:
                yield ty, t, np.frombuffer(buf, np.float32)
            elif ty == nb.REC_GT:
                v = np.frombuffer(buf, np.float32)
                yield ty, t, (v[:3], v[3:7])
            elif ty == nb.REC_CLOUD:
                n = int(np.frombuffer(buf[:4], np.uint32)[0])
                pts = np.frombuffer(buf[4:4 + 16 * n], np.float32).reshape(n, 4)
                yield ty, t, pts
            elif ty == nb.REC_IMAGE:
                h, w = np.frombuffer(buf[:8], np.uint32)
                img = np.frombuffer(buf[8:8 + h * w],
                                    np.uint8).reshape(h, w)
                yield ty, t, img
            elif ty == nb.REC_DEPTH:
                h, w = np.frombuffer(buf[:8], np.uint32)
                d = np.frombuffer(buf[8:8 + 2 * h * w],
                                  np.uint16).reshape(h, w)
                yield ty, t, d.astype(np.float32) * 1e-3   # mm -> m
            elif ty == nb.REC_GNSS:
                n = int(np.frombuffer(buf[:4], np.uint32)[0])
                sats = np.frombuffer(buf[4:4 + 136 * n],
                                     np.float64).reshape(n, 17)
                yield ty, t, sats
            else:
                yield ty, t, bytes(buf)
    finally:
        r.close()
