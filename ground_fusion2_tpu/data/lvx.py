"""Offline Livox LVX file replay (the reference's lvx-file data path).

The reference ingests recorded Livox sweeps through its stock driver's LVX
replay (``livox_ros_driver/livox_ros_driver/lvx_file.h:74-120`` container
structs, ``lds_lvx.cpp`` packet walk, ``lvx_to_rosbag.launch``). This
module is the framework's offline equivalent: it reads (and, for tests and
dataset synthesis, writes) the LVX v1.x container and yields canonical
sweep arrays — ``xyz [N,3] float32`` metres, ``alpha [N]`` in ``[0,1]``
(per-point relative sweep time), ``intensity [N]``, ``t_end`` seconds —
exactly what :class:`~ground_fusion2_tpu.lio.odometry.LidarOdometry`
consumes, plus the inline IMU stream (data type 6).

Container layout (public Livox format, mirrored by the reference structs):

* public header (24 B): 16 B signature, 4 B version, u32 magic
  ``0xAC0EA767``;
* private header v1.1+ (5 B): u32 frame_duration_ms, u8 device_count
  (v1.0: u8 device_count only — both supported on read);
* ``device_count`` × 59 B device-info blocks: two 16 B broadcast codes,
  u8 device_index / device_type / extrinsic_enable, 6 × f32 extrinsic
  (roll, pitch, yaw in degrees; x, y, z metres);
* frames: 24 B header (u64 current_offset, next_offset, frame_index)
  followed by raw point packages up to ``next_offset``;
* package: u8 device_index, version, slot, lidar_id, reserved; u32
  status; u8 timestamp_type, data_type; u64 timestamp (ns); point block.

Supported point data types (Livox SDK public encoding):

* 0 — cartesian: 100 pts × 13 B (3 × i32 mm + u8 reflectivity);
* 2 — extended cartesian (Avia/Horizon/Mid-70 single return): 96 pts ×
  14 B (3 × i32 mm + u8 reflectivity + u8 tag);
* 6 — IMU: 24 B (gyro xyz rad/s + accel xyz g as f32).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

MAGIC = 0xAC0EA767
SIGNATURE = b"livox_tech\x00\x00\x00\x00\x00\x00"

# data_type -> (points per package, bytes per point)
_POINT_LAYOUT = {0: (100, 13), 2: (96, 14), 6: (1, 24)}
_PKG_HEAD = struct.Struct("<5BIBBQ")          # 19 B package header
_DEV_INFO = struct.Struct("<16s16s3B6f")      # 59 B device info
_FRAME_HEAD = struct.Struct("<3Q")            # 24 B frame header


@dataclass
class LvxDevice:
    broadcast_code: bytes = b"0" * 16
    device_index: int = 0
    device_type: int = 3            # Horizon-class
    extrinsic_enable: int = 0
    rpy_deg: tuple = (0.0, 0.0, 0.0)
    xyz: tuple = (0.0, 0.0, 0.0)

    def rotation(self) -> np.ndarray:
        r, p, y = np.deg2rad(np.asarray(self.rpy_deg, np.float64))
        cr, sr, cp, sp, cy, sy = np.cos(r), np.sin(r), np.cos(p), \
            np.sin(p), np.cos(y), np.sin(y)
        Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1.0]])
        Ry = np.array([[cp, 0, sp], [0, 1.0, 0], [-sp, 0, cp]])
        Rx = np.array([[1.0, 0, 0], [0, cr, -sr], [0, sr, cr]])
        return Rz @ Ry @ Rx


@dataclass
class LvxPackage:
    device_index: int
    timestamp_ns: int
    data_type: int
    payload: bytes


@dataclass
class LvxFile:
    frame_duration_ms: int = 50
    devices: list = field(default_factory=lambda: [LvxDevice()])
    packages: list = field(default_factory=list)   # list[LvxPackage]


# -- write ---------------------------------------------------------------

def _encode_points_type2(xyz_m: np.ndarray, refl: np.ndarray) -> list:
    """Metres -> packed 96-point type-2 packages (zero-padded tail; zero
    points sit inside the blind radius and are range-filtered on decode,
    matching the driver's treatment of empty returns)."""
    n, per = len(xyz_m), 96
    mm = np.round(np.asarray(xyz_m, np.float64) * 1000.0).astype("<i4")
    r8 = np.clip(np.asarray(refl), 0, 255).astype(np.uint8)
    out = []
    for k in range(0, max(n, 1), per):
        pts = np.zeros((per, 14), np.uint8)
        blk = slice(k, min(k + per, n))
        m = blk.stop - blk.start
        raw = np.zeros((m, 14), np.uint8)
        raw[:, :12] = mm[blk].view(np.uint8).reshape(m, 12)
        raw[:, 12] = r8[blk]
        pts[:m] = raw
        out.append(pts.tobytes())
    return out


def write_lvx(path: str | Path, lvx: LvxFile) -> None:
    """Serialize an :class:`LvxFile` (v1.1 container)."""
    with open(path, "wb") as f:
        f.write(SIGNATURE)
        f.write(bytes([1, 1, 0, 0]))
        f.write(struct.pack("<I", MAGIC))
        f.write(struct.pack("<IB", lvx.frame_duration_ms, len(lvx.devices)))
        for d in lvx.devices:
            f.write(_DEV_INFO.pack(
                d.broadcast_code.ljust(16, b"\x00")[:16], b"\x00" * 16,
                d.device_index, d.device_type, d.extrinsic_enable,
                *d.rpy_deg, *d.xyz))
        # group packages into frames of frame_duration_ms
        frame_ns = lvx.frame_duration_ms * 1_000_000
        pkgs = sorted(lvx.packages, key=lambda p: p.timestamp_ns)
        t0 = pkgs[0].timestamp_ns if pkgs else 0
        frames: dict[int, list] = {}
        for p in pkgs:
            frames.setdefault((p.timestamp_ns - t0) // frame_ns,
                              []).append(p)
        offset = f.tell()
        for idx in sorted(frames):
            body = b"".join(
                _PKG_HEAD.pack(p.device_index, 0, 0, 0, 0, 0, 0,
                               p.data_type, p.timestamp_ns) + p.payload
                for p in frames[idx])
            nxt = offset + _FRAME_HEAD.size + len(body)
            f.write(_FRAME_HEAD.pack(offset, nxt, idx))
            f.write(body)
            offset = nxt


def write_lvx_sweeps(path: str | Path, sweeps: list, imu: list = (),
                     device: LvxDevice | None = None,
                     pkgs_per_sweep: int = 24) -> None:
    """Convenience writer: ``sweeps`` = [(t_start_s, xyz [N,3] m,
    reflectivity [N])], ``imu`` = [(t_s, gyro [3] rad/s, accel_g [3])].
    Points are spread over ``pkgs_per_sweep`` packages across 0.1 s so
    per-point sweep time survives the round trip."""
    lvx = LvxFile(devices=[device or LvxDevice()])
    for (t0, xyz, refl) in sweeps:
        order = np.array_split(np.arange(len(xyz)), pkgs_per_sweep)
        for j, idx in enumerate(order):
            if not len(idx):
                continue
            for payload in _encode_points_type2(xyz[idx],
                                                np.asarray(refl)[idx]):
                lvx.packages.append(LvxPackage(
                    0, int((t0 + 0.1 * j / pkgs_per_sweep) * 1e9), 2,
                    payload))
    for (t, g, a) in imu:
        lvx.packages.append(LvxPackage(
            0, int(t * 1e9), 6,
            np.asarray([*g, *a], "<f4").tobytes()))
    write_lvx(path, lvx)


# -- read ----------------------------------------------------------------

def read_lvx(path: str | Path) -> LvxFile:
    """Parse the container; raises ValueError on a bad signature/magic."""
    buf = Path(path).read_bytes()
    if buf[:16] != SIGNATURE:
        raise ValueError("not an LVX file (signature mismatch)")
    ver = buf[16:20]
    (magic,) = struct.unpack_from("<I", buf, 20)
    if magic != MAGIC:
        raise ValueError("not an LVX file (magic mismatch)")
    off = 24
    if ver[0] >= 1 and ver[1] >= 1:
        frame_ms, ndev = struct.unpack_from("<IB", buf, off)
        off += 5
    else:                                       # v1.0 private header
        frame_ms, (ndev,) = 50, struct.unpack_from("<B", buf, off)
        off += 1
    devices = []
    for _ in range(ndev):
        bc, _hub, di, dt, ee, r, p, y, x, yy, z = \
            _DEV_INFO.unpack_from(buf, off)
        off += _DEV_INFO.size
        devices.append(LvxDevice(bc.rstrip(b"\x00"), di, dt, ee,
                                 (r, p, y), (x, yy, z)))
    lvx = LvxFile(frame_ms, devices)
    while off + _FRAME_HEAD.size <= len(buf):
        cur, nxt, _idx = _FRAME_HEAD.unpack_from(buf, off)
        off += _FRAME_HEAD.size
        end = min(nxt if nxt > cur else len(buf), len(buf))
        while off + _PKG_HEAD.size <= end:
            di, _v, _s, _l, _r, _st, _tt, dtype, ts = \
                _PKG_HEAD.unpack_from(buf, off)
            off += _PKG_HEAD.size
            if dtype not in _POINT_LAYOUT:
                raise ValueError(f"unsupported LVX data_type {dtype}")
            npts, psz = _POINT_LAYOUT[dtype]
            lvx.packages.append(LvxPackage(
                di, ts, dtype, buf[off:off + npts * psz]))
            off += npts * psz
        off = end
    return lvx


def _decode_cartesian(payload: bytes, per: int, psz: int):
    raw = np.frombuffer(payload, np.uint8).reshape(-1, psz)
    xyz = raw[:, :12].copy().view("<i4").astype(np.float32) / 1000.0
    return xyz.reshape(-1, 3), raw[:, 12].astype(np.float32)


def lvx_sweeps(path: str | Path, sweep_dt: float = 0.1,
               blind: float = 0.1, apply_extrinsic: bool = False):
    """Replay an LVX file as canonical sweeps + IMU samples.

    Returns ``(sweeps, imu)`` where ``sweeps`` is a list of
    ``(xyz [N,3] f32, alpha [N], intensity [N], t_end_s)`` grouped into
    ``sweep_dt`` windows (the driver's publish cadence) and ``imu`` is
    ``[(t_s, gyro [3], accel_g [3])]``. Points closer than ``blind`` m
    (including the writer's zero padding) are dropped, matching the
    reference preprocessing (``cloud_convert.cc`` blind filter). With
    ``apply_extrinsic`` the device-info rotation/translation is applied.
    """
    lvx = read_lvx(path)
    dev = {d.device_index: d for d in lvx.devices}
    pts, imu = [], []
    for p in sorted(lvx.packages, key=lambda q: q.timestamp_ns):
        t = p.timestamp_ns * 1e-9
        if p.data_type == 6:
            v = np.frombuffer(p.payload, "<f4")
            imu.append((t, v[:3].copy(), v[3:6].copy()))
            continue
        npts, psz = _POINT_LAYOUT[p.data_type]
        xyz, refl = _decode_cartesian(p.payload, npts, psz)
        # blind filter in the SENSOR frame (reference cloud_convert.cc
        # semantics), before any device extrinsic moves the origin
        keep = np.linalg.norm(xyz, axis=1) > blind
        xyz, refl = xyz[keep], refl[keep]
        d = dev.get(p.device_index)
        if apply_extrinsic and d is not None and d.extrinsic_enable:
            xyz = xyz @ d.rotation().T.astype(np.float32) \
                + np.asarray(d.xyz, np.float32)
        pts.append((t, xyz, refl))
    sweeps = []
    if pts:
        t0 = pts[0][0]
        groups: dict[int, list] = {}
        for rec in pts:
            groups.setdefault(int((rec[0] - t0) / sweep_dt), []).append(rec)
        for k in sorted(groups):
            g = groups[k]
            xyz = np.concatenate([r[1] for r in g])
            inten = np.concatenate([r[2] for r in g])
            ts = np.concatenate(
                [np.full(len(r[1]), r[0]) for r in g])
            t_end = float(ts.max())
            span = max(t_end - float(ts.min()), 1e-9)
            alpha = ((ts - ts.min()) / span).astype(np.float32)
            sweeps.append((xyz, alpha, inten.astype(np.float32), t_end))
    return sweeps, imu
