"""ctypes bindings for the native host-side runtime (lmpc_runtime.cpp).

The shared library is compiled on demand with g++ (no pip/pybind11
dependency) and cached next to the source; ``available()`` reports whether
the native path is usable so every consumer can fall back to its numpy
implementation (tests exercise both paths).
"""

from __future__ import annotations

import ctypes as ct
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "src" / "lmpc_runtime.cpp"
_LIB = _HERE / "_liblmpc_runtime.so"

_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _build() -> str | None:
    """Compile the shared library if missing/stale.  Returns error or None."""
    try:
        if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
            return None
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
            "-fvisibility=hidden", str(_SRC), "-o", str(_LIB),
        ]
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=180)
        if proc.returncode != 0:
            return f"g++ failed: {proc.stderr[-2000:]}"
        return None
    except (OSError, subprocess.SubprocessError) as e:  # g++ missing etc.
        return str(e)


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return
        err = _build()
        if err is not None:
            _build_error = err
            return
        lib = ct.CDLL(str(_LIB))
        c_p, c_i64, c_i32, c_f32, c_f64, c_char = (
            ct.c_void_p, ct.c_int64, ct.c_int32, ct.c_float, ct.c_double,
            ct.c_char_p)
        f32_p = ct.POINTER(ct.c_float)
        f64_p = ct.POINTER(ct.c_double)
        i32_p = ct.POINTER(ct.c_int32)
        u8_p = ct.POINTER(ct.c_uint8)

        sigs = {
            "lr_table_load": (c_p, [c_char]),
            "lr_table_rows": (c_i64, [c_p]),
            "lr_table_cols": (c_i64, [c_p]),
            "lr_table_copy": (None, [c_p, f64_p]),
            "lr_table_free": (None, [c_p]),
            "lr_kdtree_build": (c_p, [f32_p, c_i64]),
            "lr_kdtree_knn": (None, [c_p, f32_p, c_i64, c_i32, i32_p, f32_p]),
            "lr_kdtree_free": (None, [c_p]),
            "lr_ss_new": (c_p, [c_i64, c_i64]),
            "lr_ss_free": (None, [c_p]),
            "lr_ss_add_lap": (None, [c_p, f32_p, c_i64, c_f64]),
            "lr_ss_num_laps": (c_i64, [c_p]),
            "lr_ss_query": (c_i64, [c_p, f32_p, c_i32, c_i32, f32_p, f32_p]),
            "lr_prof_new": (c_p, [c_i64]),
            "lr_prof_free": (None, [c_p]),
            "lr_prof_add": (None, [c_p, c_f64]),
            "lr_prof_stats": (None, [c_p, f64_p]),
            "lr_bus_new": (c_p, []),
            "lr_bus_free": (None, [c_p]),
            "lr_bus_subscribe": (None, [c_p, c_char, c_p, c_p]),
            "lr_bus_publish": (None, [c_p, c_char, u8_p, c_i64]),
            "lr_bus_flush": (None, [c_p, c_f64]),
            "lr_bus_delivered": (c_i64, [c_p]),
        }
        for name, (res, args) in sigs.items():
            fn = getattr(lib, name)
            fn.restype = res
            fn.argtypes = args
        _lib = lib


def available() -> bool:
    _load()
    return _lib is not None


def build_error() -> str | None:
    _load()
    return _build_error


def _np_f32(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float32)


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------

def load_table(path: str | os.PathLike) -> np.ndarray:
    """Native whitespace-table loader (tracks / recorded laps)."""
    _load()
    if _lib is None:
        raise RuntimeError(f"native runtime unavailable: {_build_error}")
    h = _lib.lr_table_load(str(path).encode())
    if not h:
        raise OSError(f"failed to parse table: {path}")
    try:
        rows, cols = _lib.lr_table_rows(h), _lib.lr_table_cols(h)
        out = np.empty((rows, cols), dtype=np.float64)
        _lib.lr_table_copy(h, out.ctypes.data_as(ct.POINTER(ct.c_double)))
        return out
    finally:
        _lib.lr_table_free(h)


class KdTree2D:
    """Static 2-D KD-tree (CGAL replacement, trajectory_kd_tree.hpp:69-121)."""

    def __init__(self, xy: np.ndarray):
        _load()
        if _lib is None:
            raise RuntimeError(f"native runtime unavailable: {_build_error}")
        xy = _np_f32(xy).reshape(-1, 2)
        self.n = xy.shape[0]
        self._h = _lib.lr_kdtree_build(
            xy.ctypes.data_as(ct.POINTER(ct.c_float)), self.n)

    def knn(self, q_xy: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        """(nq, 2) queries -> ((nq, k) indices, (nq, k) squared distances)."""
        q = _np_f32(q_xy).reshape(-1, 2)
        nq = q.shape[0]
        idx = np.empty((nq, k), dtype=np.int32)
        d2 = np.empty((nq, k), dtype=np.float32)
        _lib.lr_kdtree_knn(
            self._h, q.ctypes.data_as(ct.POINTER(ct.c_float)), nq, k,
            idx.ctypes.data_as(ct.POINTER(ct.c_int32)),
            d2.ctypes.data_as(ct.POINTER(ct.c_float)))
        return idx, d2

    def __del__(self):
        if _lib is not None and getattr(self, "_h", None):
            _lib.lr_kdtree_free(self._h)


class NativeSafeSet:
    """Native padded-lap store + threaded k-NN query (safe_set.cpp:33-191)."""

    def __init__(self, max_laps: int, nx: int):
        _load()
        if _lib is None:
            raise RuntimeError(f"native runtime unavailable: {_build_error}")
        self.nx = nx
        self._h = _lib.lr_ss_new(max_laps, nx)

    def add_lap(self, x: np.ndarray, total_length: float):
        x = _np_f32(x)
        _lib.lr_ss_add_lap(
            self._h, x.ctypes.data_as(ct.POINTER(ct.c_float)), x.shape[0],
            float(total_length))

    @property
    def num_laps(self) -> int:
        return int(_lib.lr_ss_num_laps(self._h))

    def query(self, q_xy: np.ndarray, max_total: int, max_per_lap: int
              ) -> tuple[np.ndarray, np.ndarray]:
        q = _np_f32(q_xy).reshape(2)
        out_x = np.empty((max_total, self.nx), dtype=np.float32)
        out_J = np.empty((max_total,), dtype=np.float32)
        num = _lib.lr_ss_query(
            self._h, q.ctypes.data_as(ct.POINTER(ct.c_float)),
            max_total, max_per_lap,
            out_x.ctypes.data_as(ct.POINTER(ct.c_float)),
            out_J.ctypes.data_as(ct.POINTER(ct.c_float)))
        return out_x[:num], out_J[:num]

    def __del__(self):
        if _lib is not None and getattr(self, "_h", None):
            _lib.lr_ss_free(self._h)


class CycleProfiler:
    """Windowed min/mean/max cycle statistics (cycle_profiler.hpp:69-136)."""

    def __init__(self, capacity: int):
        _load()
        if _lib is None:
            raise RuntimeError(f"native runtime unavailable: {_build_error}")
        self._h = _lib.lr_prof_new(capacity)

    def add(self, value: float):
        _lib.lr_prof_add(self._h, float(value))

    def stats(self) -> dict:
        out = np.zeros(4, dtype=np.float64)
        _lib.lr_prof_stats(self._h, out.ctypes.data_as(ct.POINTER(ct.c_double)))
        return {"min": out[0], "mean": out[1], "max": out[2],
                "count": int(out[3])}

    def __del__(self):
        if _lib is not None and getattr(self, "_h", None):
            _lib.lr_prof_free(self._h)


_BUS_CB = ct.CFUNCTYPE(None, ct.c_char_p, ct.POINTER(ct.c_uint8), ct.c_int64,
                       ct.c_void_p)


class Bus:
    """Intra-process pub/sub with a serialized dispatch thread — the
    DDS/rclcpp-executor replacement wiring simulator to controller
    (racing_mpc_node.cpp:92-118)."""

    def __init__(self):
        _load()
        if _lib is None:
            raise RuntimeError(f"native runtime unavailable: {_build_error}")
        self._h = _lib.lr_bus_new()
        self._keep = []  # keep callback trampolines alive

    def subscribe(self, topic: str, fn):
        """fn(topic: str, payload: bytes) — called on the dispatch thread."""
        def tramp(t, data, length, _user):
            fn(t.decode(), bytes(bytearray(data[:length])))
        cb = _BUS_CB(tramp)
        self._keep.append(cb)
        _lib.lr_bus_subscribe(self._h, topic.encode(),
                              ct.cast(cb, ct.c_void_p), None)

    def publish(self, topic: str, payload: bytes):
        buf = (ct.c_uint8 * len(payload)).from_buffer_copy(payload)
        _lib.lr_bus_publish(self._h, topic.encode(), buf, len(payload))

    def flush(self, timeout_s: float = 5.0):
        _lib.lr_bus_flush(self._h, timeout_s)

    @property
    def delivered(self) -> int:
        return int(_lib.lr_bus_delivered(self._h))

    def close(self):
        if _lib is not None and self._h:
            _lib.lr_bus_free(self._h)
            self._h = None

    def __del__(self):
        self.close()
