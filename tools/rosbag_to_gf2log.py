#!/usr/bin/env python3
"""Convert a ROS1 bag (M3DGR / M2DGR-plus) to the native gf2 TLV log.

Replaces the reference's live ``rosbag play`` replay path: run once offline,
then feed the log through ``ground_fusion2_tpu.data.dataset.read_log``.

Requires the ``rosbags`` (pure-python) or ``rosbag`` package — neither ships
in this image, so this tool runs on the machine that holds the bags.

Usage:
  python tools/rosbag_to_gf2log.py seq.bag seq.gf2log \
      --imu /handsfree/imu --color /camera/color/image_raw/compressed \
      --depth /camera/aligned_depth_to_color/image_raw \
      --cloud /livox/lidar --wheel /odom
"""

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bag")
    ap.add_argument("out")
    ap.add_argument("--imu", default="/handsfree/imu")
    ap.add_argument("--wheel", default="/odom")
    ap.add_argument("--color", default="/camera/color/image_raw/compressed")
    ap.add_argument("--depth", default="/camera/aligned_depth_to_color/image_raw")
    ap.add_argument("--cloud", default="/livox/lidar")
    args = ap.parse_args()

    try:
        from rosbags.highlevel import AnyReader
        from pathlib import Path
    except ImportError:
        sys.exit("install the pure-python 'rosbags' package to convert bags")

    sys.path.insert(0, str(Path(__file__).parent.parent))
    from ground_fusion2_tpu.runtime import native_bindings as nb

    w = nb.LogWriter(args.out)
    with AnyReader([Path(args.bag)]) as reader:
        conns = [c for c in reader.connections
                 if c.topic in (args.imu, args.wheel, args.color,
                                args.depth, args.cloud)]
        for conn, ts, raw in reader.messages(connections=conns):
            t = ts / 1e9
            msg = reader.deserialize(raw, conn.msgtype)
            if conn.topic == args.imu:
                payload = np.array([
                    msg.linear_acceleration.x, msg.linear_acceleration.y,
                    msg.linear_acceleration.z, msg.angular_velocity.x,
                    msg.angular_velocity.y, msg.angular_velocity.z],
                    np.float32)
                w.write(nb.REC_IMU, t, payload)
            elif conn.topic == args.wheel:
                payload = np.array([
                    msg.twist.twist.linear.x, msg.twist.twist.linear.y,
                    msg.twist.twist.linear.z], np.float32)
                w.write(nb.REC_WHEEL, t, payload)
            elif conn.topic == args.color:
                data = np.frombuffer(msg.data, np.uint8)
                hdr = np.array([0, len(data)], np.uint32).view(np.uint8)
                w.write(nb.REC_IMAGE, t, np.concatenate([hdr, data]))
            elif conn.topic == args.depth:
                data = np.frombuffer(msg.data, np.uint8)
                hdr = np.array([msg.height, msg.width], np.uint32).view(np.uint8)
                w.write(nb.REC_DEPTH, t, np.concatenate([hdr, data]))
            elif conn.topic == args.cloud:
                # livox CustomMsg or PointCloud2
                if hasattr(msg, "points"):   # livox custom
                    pts = np.array(
                        [[p.x, p.y, p.z, p.offset_time / 1e9]
                         for p in msg.points], np.float32)
                else:
                    # PointCloud2: xyz + (optional) time field, stride decode
                    step = msg.point_step
                    buf = np.frombuffer(msg.data, np.uint8)
                    n = len(buf) // step
                    xyz = np.stack([
                        buf[o::step].view(np.float32)[:n]
                        for o in (0, 4, 8)], axis=-1)
                    pts = np.concatenate(
                        [xyz, np.zeros((n, 1), np.float32)], axis=1)
                hdr = np.array([pts.shape[0]], np.uint32).view(np.uint8)
                w.write(nb.REC_CLOUD, t, np.concatenate(
                    [hdr, pts.reshape(-1).view(np.uint8)]))
    w.close()
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
