#!/usr/bin/env python3
"""Replay a recorded Livox LVX file through the LiDAR-inertial odometry.

The reference converts lvx recordings through its driver replay
(``livox_ros_driver/launch/lvx_to_rosbag.launch`` → ``lds_lvx.cpp``) and
feeds the LIO node; this is the framework's one-command equivalent:

  python tools/run_lvx.py seq.lvx out/ [--config configs/m3dgr.yaml]

Reads point packages + the inline IMU stream (data type 6), groups sweeps
at the driver publish cadence, runs :class:`LidarOdometry` (fused
single-dispatch tick), and writes ``out/lio.tum``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("lvx_path")
    ap.add_argument("out_dir")
    ap.add_argument("--config", default="configs/m3dgr.yaml")
    ap.add_argument("--sweep-dt", type=float, default=0.1)
    ap.add_argument("--accel-unit-g", action="store_true", default=True,
                    help="LVX inline IMU accel is in g (Livox convention)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ground_fusion2_tpu.config.loader import load_config
    from ground_fusion2_tpu.data.lvx import lvx_sweeps
    from ground_fusion2_tpu.lio.odometry import LidarOdometry

    cfg = load_config(args.config)
    sweeps, imu = lvx_sweeps(args.lvx_path, sweep_dt=args.sweep_dt,
                             apply_extrinsic=True)
    if not imu:
        sys.exit("no inline IMU packages (data type 6) in the file; the "
                 "LIO needs an IMU stream")
    imu_t = np.array([r[0] for r in imu])
    gyr = np.array([r[1] for r in imu], np.float32)
    acc = np.array([r[2] for r in imu], np.float32)
    if args.accel_unit_g:
        acc = acc * 9.81

    lo = LidarOdometry(cfg.lio)
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rows, t_prev, n_deg = [], imu_t[0], 0
    t0 = time.time()
    for (xyz, alpha, inten, t_end) in sweeps:
        idx = np.where((imu_t > t_prev - 1e-9) & (imu_t <= t_end + 1e-9))[0]
        if len(idx) < 2:
            continue
        dts = np.diff(imu_t[idx]).astype(np.float32)
        res = lo.process_scan(t_end, xyz, alpha,
                              np.ones(len(xyz), bool),
                              (acc[idx], gyr[idx], dts))
        t_prev = t_end
        if res is not None:
            n_deg += int(res.degenerate)
            q = np.asarray(res.q_lio)
            rows.append((t_end, *np.asarray(res.p_lio), *q[1:], q[0]))
    with open(out / "lio.tum", "w") as f:
        for r in rows:
            f.write(" ".join(f"{v:.6f}" for v in r) + "\n")
    print(json.dumps({
        "sweeps": len(sweeps), "tracked": len(rows),
        "degenerate": n_deg, "wall_s": round(time.time() - t0, 1),
        "tum": str(out / "lio.tum")}))


if __name__ == "__main__":
    main()
