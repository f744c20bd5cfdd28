"""ctypes bindings for the native runtime (builds the .so on first use).

The native layer owns high-rate host bookkeeping — sensor queues,
measurement synchronization, point-cloud subsampling, the dataset log —
leaving Python/JAX to device compute only. Compiled with g++ -O3 on demand
and cached under ``build/``.
"""

from __future__ import annotations

import ctypes as ct
import os
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "native" / "gf2_runtime.cc"
_BUILD = Path(__file__).parent.parent.parent / "build"
_SO = _BUILD / "libgf2runtime.so"

_lib = None


class ImuSample(ct.Structure):
    _fields_ = [("t", ct.c_double), ("acc", ct.c_float * 3),
                ("gyr", ct.c_float * 3)]


class WheelSample(ct.Structure):
    _fields_ = [("t", ct.c_double), ("vel", ct.c_float * 3)]


def _ensure_built():
    global _lib
    if _lib is not None:
        return _lib
    _BUILD.mkdir(exist_ok=True)
    if (not _SO.exists()
            or _SO.stat().st_mtime < _SRC.stat().st_mtime):
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             str(_SRC), "-o", str(_SO)],
            check=True, capture_output=True)
    lib = ct.CDLL(str(_SO))

    lib.gf2_sync_create.restype = ct.c_void_p
    lib.gf2_sync_create.argtypes = [ct.c_double]
    lib.gf2_sync_destroy.argtypes = [ct.c_void_p]
    lib.gf2_sync_push_imu.argtypes = [
        ct.c_void_p, ct.c_double, ct.POINTER(ct.c_float),
        ct.POINTER(ct.c_float)]
    lib.gf2_sync_push_wheel.argtypes = [
        ct.c_void_p, ct.c_double, ct.POINTER(ct.c_float)]
    lib.gf2_sync_push_color.argtypes = [ct.c_void_p, ct.c_double, ct.c_int64]
    lib.gf2_sync_push_depth.argtypes = [ct.c_void_p, ct.c_double, ct.c_int64]
    lib.gf2_sync_push_cloud.argtypes = [ct.c_void_p, ct.c_double, ct.c_int64]
    lib.gf2_sync_pop_camera.restype = ct.c_int
    lib.gf2_sync_pop_camera.argtypes = [
        ct.c_void_p, ct.POINTER(ct.c_double), ct.POINTER(ct.c_int64),
        ct.POINTER(ct.c_int64), ct.POINTER(ImuSample),
        ct.POINTER(WheelSample), ct.c_int, ct.POINTER(ct.c_int)]
    lib.gf2_grid_subsample.restype = ct.c_int
    lib.gf2_grid_subsample.argtypes = [
        ct.POINTER(ct.c_float), ct.POINTER(ct.c_float), ct.c_int,
        ct.c_float, ct.POINTER(ct.c_int32), ct.c_int]
    lib.gf2_log_open_write.restype = ct.c_void_p
    lib.gf2_log_open_write.argtypes = [ct.c_char_p]
    lib.gf2_log_write.argtypes = [
        ct.c_void_p, ct.c_uint32, ct.c_double, ct.c_void_p, ct.c_uint32]
    lib.gf2_log_close_write.argtypes = [ct.c_void_p]
    lib.gf2_log_open_read.restype = ct.c_void_p
    lib.gf2_log_open_read.argtypes = [ct.c_char_p]
    lib.gf2_log_read.restype = ct.c_int64
    lib.gf2_log_read.argtypes = [
        ct.c_void_p, ct.POINTER(ct.c_uint32), ct.POINTER(ct.c_double),
        ct.c_void_p, ct.c_uint32]
    lib.gf2_log_close_read.argtypes = [ct.c_void_p]
    _lib = lib
    return lib


class MeasurementSync:
    """Native measurement synchronizer (the reference's ``sync_process``)."""

    def __init__(self, depth_tol: float = 0.003, max_imu: int = 512):
        self._lib = _ensure_built()
        self._h = self._lib.gf2_sync_create(depth_tol)
        self._max = max_imu
        self._imu_buf = (ImuSample * max_imu)()
        self._whl_buf = (WheelSample * max_imu)()

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.gf2_sync_destroy(self._h)
            self._h = None

    def push_imu(self, t, acc, gyr):
        a = (ct.c_float * 3)(*np.asarray(acc, np.float32))
        g = (ct.c_float * 3)(*np.asarray(gyr, np.float32))
        self._lib.gf2_sync_push_imu(self._h, float(t), a, g)

    def push_wheel(self, t, vel):
        v = (ct.c_float * 3)(*np.asarray(vel, np.float32))
        self._lib.gf2_sync_push_wheel(self._h, float(t), v)

    def push_color(self, t, frame_id):
        self._lib.gf2_sync_push_color(self._h, float(t), int(frame_id))

    def push_depth(self, t, frame_id):
        self._lib.gf2_sync_push_depth(self._h, float(t), int(frame_id))

    def pop_camera(self):
        """Returns (t, color_id, depth_id, acc [n,3], gyr [n,3], wheel [n,3],
        stamps [n]) or None if no group is ready."""
        t = ct.c_double()
        cid = ct.c_int64()
        did = ct.c_int64()
        n = ct.c_int()
        ok = self._lib.gf2_sync_pop_camera(
            self._h, ct.byref(t), ct.byref(cid), ct.byref(did),
            self._imu_buf, self._whl_buf, self._max, ct.byref(n))
        if not ok:
            return None
        m = n.value
        acc = np.array([self._imu_buf[i].acc[:] for i in range(m)], np.float32)
        gyr = np.array([self._imu_buf[i].gyr[:] for i in range(m)], np.float32)
        whl = np.array([self._whl_buf[i].vel[:] for i in range(m)], np.float32)
        ts = np.array([self._imu_buf[i].t for i in range(m)])
        return (t.value, cid.value, did.value, acc, gyr, whl, ts)


def grid_subsample(xyz: np.ndarray, times: np.ndarray, voxel: float,
                   max_out: int = 1 << 16) -> np.ndarray:
    """First-point-per-voxel subsample, output time-sorted. Returns indices."""
    lib = _ensure_built()
    xyz = np.ascontiguousarray(xyz, np.float32)
    times = np.ascontiguousarray(times, np.float32)
    out = np.zeros((max_out,), np.int32)
    n = lib.gf2_grid_subsample(
        xyz.ctypes.data_as(ct.POINTER(ct.c_float)),
        times.ctypes.data_as(ct.POINTER(ct.c_float)),
        xyz.shape[0], voxel,
        out.ctypes.data_as(ct.POINTER(ct.c_int32)), max_out)
    return out[:n].copy()


# record types for the dataset log
REC_IMU = 1        # payload: f32[6] acc, gyr
REC_WHEEL = 2      # payload: f32[3]
REC_IMAGE = 3      # payload: u32 h, u32 w, u8[h*w] grayscale
REC_DEPTH = 4      # payload: u32 h, u32 w, u16[h*w] mm
REC_CLOUD = 5      # payload: u32 n, f32[n*4] xyzt
REC_GNSS = 6       # payload: u32 n, f64[n*17] per-sat records
                   # (sat psr dopp psr_std dopp_std sat_pos[3] sat_vel[3]
                   #  clk clk_drift az el iono trop — scenarios.gnss_to_rows)
REC_GT = 7         # payload: f32[7] p, q


class LogWriter:
    def __init__(self, path: str):
        self._lib = _ensure_built()
        self._h = self._lib.gf2_log_open_write(path.encode())
        if not self._h:
            raise IOError(f"cannot open {path}")

    def write(self, rec_type: int, t: float, payload: np.ndarray):
        buf = np.ascontiguousarray(payload)
        self._lib.gf2_log_write(self._h, rec_type, float(t),
                                buf.ctypes.data_as(ct.c_void_p), buf.nbytes)

    def close(self):
        if self._h:
            self._lib.gf2_log_close_write(self._h)
            self._h = None


class LogReader:
    def __init__(self, path: str, max_payload: int = 1 << 24):
        self._lib = _ensure_built()
        self._h = self._lib.gf2_log_open_read(path.encode())
        if not self._h:
            raise IOError(f"cannot open {path}")
        self._buf = np.zeros((max_payload,), np.uint8)

    def read(self):
        """Returns (type, t, payload bytes) or None at EOF."""
        ty = ct.c_uint32()
        t = ct.c_double()
        size = self._lib.gf2_log_read(
            self._h, ct.byref(ty), ct.byref(t),
            self._buf.ctypes.data_as(ct.c_void_p), self._buf.nbytes)
        if size < 0:
            return None
        return ty.value, t.value, self._buf[:size].copy()

    def close(self):
        if self._h:
            self._lib.gf2_log_close_read(self._h)
            self._h = None
