"""ctypes binding + lazy build of the native C++ grid builder.

The compute-heavy host-side "compile" stage (SAT binning two-pass counting
sort) in native code, like the reference's Zig build stage — OpenMP-parallel
where the reference runs single-threaded.  Compiled on first use with g++
into the package directory (no pip/pybind involved; pure ctypes).

``build_grid_native`` mirrors grid/builder.py:build_grid exactly — same
GridBuild result, same per-cell triangle order, same stats — and the test
suite holds them equal.  Falls back (raising ImportError-like RuntimeError)
if no compiler is available; callers use grid/builder.py then.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path
from typing import Callable

import numpy as np

from .builder import GridBuild

log = logging.getLogger("zig_raytracing_contest_tpu")

_SRC = Path(__file__).resolve().parent.parent / "native" / "grid_builder.cpp"
_LIB_PATH = Path(__file__).resolve().parent.parent / "native" / "libzrcgrid.so"
_lock = threading.Lock()
_lib = None


def _compile_library() -> Path:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        str(_SRC), "-o", str(_LIB_PATH),
    ]
    log.info("Building native grid builder: %s", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def load_library():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
            _compile_library()
        lib = ctypes.CDLL(str(_LIB_PATH))
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.zrc_grid_count.restype = ctypes.c_int64
        lib.zrc_grid_count.argtypes = [
            f32p, ctypes.c_int64, i32p, f32p, f32p, f32p, i32p,
        ]
        lib.zrc_grid_fill.restype = None
        lib.zrc_grid_fill.argtypes = [
            f32p, ctypes.c_int64, i32p, f32p, f32p, i32p, i32p, i32p, i32p,
        ]
        _lib = lib
        return lib


def native_available() -> bool:
    try:
        load_library()
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def _fp(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def build_grid_native(
    positions: np.ndarray,
    resolution,
    log_fn: Callable[[str], None] | None = None,
) -> GridBuild:
    """Drop-in replacement for grid.builder.build_grid (same result)."""
    lib = load_library()
    log_fn = log_fn or (lambda msg: None)
    positions = np.ascontiguousarray(positions, np.float32)
    resolution = np.ascontiguousarray(resolution, np.int32)
    num_tris = positions.shape[0]
    num_cells = int(np.prod(resolution, dtype=np.int64))

    bbox_min = np.zeros(3, np.float32)
    bbox_max = np.zeros(3, np.float32)
    cell_size = np.zeros(3, np.float32)
    counts = np.zeros(num_cells, np.int32)

    log_fn(f"Grid resolution: {tuple(int(r) for r in resolution)}")
    total = lib.zrc_grid_count(
        _fp(positions, ctypes.c_float),
        num_tris,
        _fp(resolution, ctypes.c_int32),
        _fp(bbox_min, ctypes.c_float),
        _fp(bbox_max, ctypes.c_float),
        _fp(cell_size, ctypes.c_float),
        _fp(counts, ctypes.c_int32),
    )

    begin = np.zeros(num_cells, np.int64)
    np.cumsum(counts[:-1], out=begin[1:])
    begin32 = begin.astype(np.int32)
    cursors = np.zeros(num_cells, np.int32)
    dup = np.zeros(max(int(total), 1), np.int32)

    lib.zrc_grid_fill(
        _fp(positions, ctypes.c_float),
        num_tris,
        _fp(resolution, ctypes.c_int32),
        _fp(bbox_min, ctypes.c_float),
        _fp(cell_size, ctypes.c_float),
        _fp(begin32, ctypes.c_int32),
        _fp(counts, ctypes.c_int32),
        _fp(cursors, ctypes.c_int32),
        _fp(dup, ctypes.c_int32),
    )

    end = begin + counts
    nonzero = counts[counts > 0]
    empty = num_cells - len(nonzero)
    if len(nonzero):
        log_fn(
            "Empty cells: {}/{} ({:.2f}%) min triangles: {} max triangles: {} "
            "mean_triangles: {}".format(
                empty, num_cells, empty / num_cells * 100,
                int(nonzero.min()), int(nonzero.max()),
                int(total) // len(nonzero),
            )
        )
    if total:
        log_fn(
            "Unique triangle count: {}/{} ({:.2f}%)".format(
                num_tris, int(total), num_tris / int(total) * 100
            )
        )

    return GridBuild(
        bbox_min=bbox_min,
        bbox_max=bbox_max,
        resolution=resolution,
        cell_size=cell_size,
        cell_begin=begin32,
        cell_end=end.astype(np.int32),
        dup_to_tri=dup[: int(total)],
        stats={
            "num_cells": num_cells,
            "empty_cells": int(empty),
            "total_refs": int(total),
            "min_tris": int(nonzero.min()) if len(nonzero) else 0,
            "max_tris": int(nonzero.max()) if len(nonzero) else 0,
            "duplication": int(total) / max(num_tris, 1),
        },
    )
