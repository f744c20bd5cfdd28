#!/usr/bin/env python3
"""Convert a ROS1 bag (M3DGR / M2DGR-plus) to the native gf2 TLV log.

Replaces the reference's live ``rosbag play`` replay path: run once offline,
then feed the log through ``ground_fusion2_tpu.data.dataset.read_log``.

Requires the ``rosbags`` (pure-python) or ``rosbag`` package — neither ships
in this image, so this tool runs on the machine that holds the bags. The
per-message handlers below are module-level pure functions so they are
testable with hand-crafted raw byte buffers without ROS
(tests/test_converter_fixtures.py; reference decode logic:
``lio/src/preprocess/cloud_convert/cloud_convert.cc:19-329``).

Usage:
  python tools/rosbag_to_gf2log.py seq.bag seq.gf2log \
      --imu /handsfree/imu --color /camera/color/image_raw/compressed \
      --depth /camera/aligned_depth_to_color/image_raw \
      --cloud /livox/lidar --wheel /odom
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

PC2_DTYPES = {1: "i1", 2: "u1", 3: "i2", 4: "u2", 5: "i4", 6: "u4",
              7: "f4", 8: "f8"}


def pc2_structured(msg):
    """sensor_msgs/PointCloud2 -> numpy structured array via the field
    table (datatype/offset/point_step), zero-copy over ``msg.data``."""
    names, formats, offsets = [], [], []
    for f in msg.fields:
        names.append(f.name)
        formats.append(PC2_DTYPES[f.datatype])
        offsets.append(f.offset)
    dt = np.dtype({"names": names, "formats": formats,
                   "offsets": offsets, "itemsize": msg.point_step})
    n = (msg.width * msg.height) or (len(msg.data) // msg.point_step)
    return np.frombuffer(msg.data, dtype=dt, count=n)


def livox_structured(msg):
    """livox CustomMsg -> the structured layout CloudConvert expects."""
    arr = np.zeros(len(msg.points), dtype=[
        ("x", "f4"), ("y", "f4"), ("z", "f4"),
        ("reflectivity", "u1"), ("offset_time", "u4"),
        ("tag", "u1"), ("line", "u1")])
    for k, p in enumerate(msg.points):
        arr[k] = (p.x, p.y, p.z, p.reflectivity,
                  p.offset_time, p.tag, p.line)
    return arr


def encode_imu(msg):
    """sensor_msgs/Imu -> (rec_type, payload f32[6] acc+gyr)."""
    from ground_fusion2_tpu.runtime import native_bindings as nb
    payload = np.array([
        msg.linear_acceleration.x, msg.linear_acceleration.y,
        msg.linear_acceleration.z, msg.angular_velocity.x,
        msg.angular_velocity.y, msg.angular_velocity.z], np.float32)
    return nb.REC_IMU, payload


def encode_wheel(msg):
    """nav_msgs/Odometry -> (rec_type, payload f32[3] body velocity)."""
    from ground_fusion2_tpu.runtime import native_bindings as nb
    payload = np.array([
        msg.twist.twist.linear.x, msg.twist.twist.linear.y,
        msg.twist.twist.linear.z], np.float32)
    return nb.REC_WHEEL, payload


def encode_color(msg):
    """CompressedImage -> (rec_type, payload u32[2] hdr + raw bytes)."""
    from ground_fusion2_tpu.runtime import native_bindings as nb
    data = np.frombuffer(msg.data, np.uint8)
    hdr = np.array([0, len(data)], np.uint32).view(np.uint8)
    return nb.REC_IMAGE, np.concatenate([hdr, data])


def encode_depth(msg):
    """sensor_msgs/Image (16UC1 mm) -> (rec_type, u32 h, u32 w, bytes)."""
    from ground_fusion2_tpu.runtime import native_bindings as nb
    data = np.frombuffer(msg.data, np.uint8)
    hdr = np.array([msg.height, msg.width], np.uint32).view(np.uint8)
    return nb.REC_DEPTH, np.concatenate([hdr, data])


def encode_cloud(msg, cconv, t):
    """LiDAR message -> (rec_type, t_end, payload u32 n + f32[n*4] xyzt).

    Routes livox CustomMsg vs PointCloud2 into the per-vendor decoder
    (``ground_fusion2_tpu.data.cloud_convert``, the reference's
    ``cloud_convert.cc`` handlers)."""
    from ground_fusion2_tpu.runtime import native_bindings as nb
    if hasattr(msg, "points"):   # livox CustomMsg
        arr = livox_structured(msg)
    else:
        arr = pc2_structured(msg)
    xyz, alpha, _inten, t_end = cconv.process(arr, t)
    pts = np.concatenate([xyz, alpha[:, None]], axis=1)
    hdr = np.array([pts.shape[0]], np.uint32).view(np.uint8)
    payload = np.concatenate(
        [hdr, pts.astype(np.float32).reshape(-1).view(np.uint8)])
    return nb.REC_CLOUD, t_end, payload


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bag")
    ap.add_argument("out")
    ap.add_argument("--imu", default="/handsfree/imu")
    ap.add_argument("--wheel", default="/odom")
    ap.add_argument("--color", default="/camera/color/image_raw/compressed")
    ap.add_argument("--depth", default="/camera/aligned_depth_to_color/image_raw")
    ap.add_argument("--cloud", default="/livox/lidar")
    ap.add_argument("--lidar-type", type=int, default=1,
                    help="1 AVIA 2 VELO32 3 OUST64 4 ROBOSENSE16 5 PANDAR "
                    "(reference lio/config preprocess.lidar_type)")
    ap.add_argument("--blind", type=float, default=0.1)
    ap.add_argument("--point-filter-num", type=int, default=1)
    args = ap.parse_args()

    try:
        from rosbags.highlevel import AnyReader
    except ImportError:
        sys.exit("install the pure-python 'rosbags' package to convert bags")

    from ground_fusion2_tpu.runtime import native_bindings as nb
    from ground_fusion2_tpu.data.cloud_convert import (
        CloudConvert, CloudConvertConfig, LidarType)

    cconv = CloudConvert(CloudConvertConfig(
        lidar_type=LidarType(args.lidar_type), blind=args.blind,
        point_filter_num=args.point_filter_num))

    w = nb.LogWriter(args.out)
    with AnyReader([Path(args.bag)]) as reader:
        conns = [c for c in reader.connections
                 if c.topic in (args.imu, args.wheel, args.color,
                                args.depth, args.cloud)]
        for conn, ts, raw in reader.messages(connections=conns):
            t = ts / 1e9
            msg = reader.deserialize(raw, conn.msgtype)
            if conn.topic == args.imu:
                rec, payload = encode_imu(msg)
                w.write(rec, t, payload)
            elif conn.topic == args.wheel:
                rec, payload = encode_wheel(msg)
                w.write(rec, t, payload)
            elif conn.topic == args.color:
                rec, payload = encode_color(msg)
                w.write(rec, t, payload)
            elif conn.topic == args.depth:
                rec, payload = encode_depth(msg)
                w.write(rec, t, payload)
            elif conn.topic == args.cloud:
                rec, t_end, payload = encode_cloud(msg, cconv, t)
                w.write(rec, t_end, payload)
    w.close()
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
