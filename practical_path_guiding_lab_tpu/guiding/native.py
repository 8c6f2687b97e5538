"""ctypes loader for the native SD-tree host engine (C++).

Refinement walks trees node-by-node — Python loops take minutes on the
hundreds of thousands of quadtree nodes a veach-ajar-scale run produces;
the native engine does the identical walk in milliseconds. Python stays as
the differential-testing reference (PPG_TPU_NO_NATIVE=1 disables native).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np
from .. import knobs

_HERE = Path(__file__).parent
_SRC = _HERE / "cpp" / "sdtree_native.cpp"
_LIB = _HERE / "cpp" / "_sdtree_native.so"
_lock = threading.Lock()
_lib = None
_failed = False

_i64 = ctypes.c_int64
_i32 = ctypes.c_int32
_f64 = ctypes.c_double
_pi64 = ctypes.POINTER(_i64)


def _ptr(a, dtype):
    assert a.dtype == dtype and a.flags.c_contiguous, (a.dtype, dtype)
    return a.ctypes.data_as(ctypes.c_void_p)


def load():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    if knobs.get_bool("PPG_TPU_NO_NATIVE"):
        _failed = True
        return None
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC)],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(str(_LIB))
            lib.kd_propagate.restype = None
            lib.quad_propagate.restype = None
            lib.kd_refine.restype = ctypes.c_int
            lib.quad_refine.restype = ctypes.c_int
            lib.quad_compact.restype = ctypes.c_int
            if hasattr(lib, "build_alias"):
                lib.build_alias.restype = ctypes.c_int
                lib.build_alias.argtypes = [
                    ctypes.c_void_p, _i64,
                    ctypes.c_void_p, ctypes.c_void_p,
                    ctypes.c_void_p, ctypes.c_void_p,
                ]
            _lib = lib
        except Exception as e:
            # No silent degradation: the Python fallback walks hundreds of
            # thousands of nodes per refinement and takes MINUTES at
            # veach-ajar scale (round-1 verdict item 8).
            import sys

            detail = ""
            if isinstance(e, subprocess.CalledProcessError):
                detail = (e.stderr or b"").decode(errors="replace")[-2000:]
            print(
                "WARNING practical_path_guiding_lab_tpu.guiding.native: "
                f"C++ SD-tree engine unavailable ({type(e).__name__}: {e}). "
                "Tree refinement falls back to the SLOW Python reference "
                "implementation (minutes per iteration at production scale)."
                + (f"\ncompiler output:\n{detail}" if detail else ""),
                file=sys.stderr,
                flush=True,
            )
            _failed = True
            _lib = None
    return _lib


def kd_propagate(leaf_vals: np.ndarray, left: np.ndarray, count: int):
    lib = load()
    if lib is None:
        return None
    out = np.zeros_like(leaf_vals)
    lib.kd_propagate(
        _ptr(leaf_vals, np.float64), _ptr(out, np.float64),
        _ptr(left, np.int32), _i64(count),
    )
    return out


def quad_propagate(leaf_vals: np.ndarray, child: np.ndarray, count: int):
    lib = load()
    if lib is None:
        return None
    out = np.zeros_like(leaf_vals)
    lib.quad_propagate(
        _ptr(leaf_vals, np.float64), _ptr(out, np.float64),
        _ptr(child, np.int32), _i64(count),
    )
    return out


def refine(tree) -> bool:
    """Full native refine (kd split + quad merge/split + compaction) on an
    SDTree instance. Returns False if native is unavailable."""
    lib = load()
    if lib is None:
        return False
    kd_leaf = tree.kd_leaf.view(np.uint8)
    kd_count = _i64(tree.kd_count)
    q_count = _i64(tree.q_count)
    rc = lib.kd_refine(
        _ptr(tree.kd_left, np.int32), _ptr(kd_leaf, np.uint8),
        _ptr(tree.kd_depth, np.int32), _ptr(tree.kd_vert, np.float64),
        _ptr(tree.kd_quad_root, np.int32), ctypes.byref(kd_count),
        _i64(tree.kd_capacity), _i32(tree.kd_max_depth),
        _f64(tree.kd_threshold), _f64(tree.max_leaf_size),
        _ptr(tree.q_child, np.int32), _ptr(tree.q_irr, np.float64),
        _ptr(tree.q_depth, np.int32), _ptr(tree.q_threshold, np.float32),
        ctypes.byref(q_count), _i64(tree.quad_capacity),
    )
    if rc == -1:
        raise RuntimeError("kd capacity exceeded; raise kd_capacity")
    if rc == -2:
        raise RuntimeError("quad capacity exceeded; raise quad_capacity")
    tree.kd_count = kd_count.value
    tree.q_count = q_count.value

    from .sdtree import QUAD_FLUX_FRACTION

    q_count = _i64(tree.q_count)
    rc = lib.quad_refine(
        _ptr(tree.kd_quad_root, np.int32), _ptr(kd_leaf, np.uint8),
        _i64(tree.kd_count),
        _ptr(tree.q_child, np.int32), _ptr(tree.q_irr, np.float64),
        _ptr(tree.q_depth, np.int32), _ptr(tree.q_threshold, np.float32),
        ctypes.byref(q_count), _i64(tree.quad_capacity),
        _i32(tree.quad_max_depth), _f64(QUAD_FLUX_FRACTION),
    )
    if rc == -2:
        raise RuntimeError("quad capacity exceeded; raise quad_capacity")
    tree.q_count = q_count.value

    q_count = _i64(tree.q_count)
    rc = lib.quad_compact(
        _ptr(tree.kd_quad_root, np.int32), _ptr(kd_leaf, np.uint8),
        _i64(tree.kd_count),
        _ptr(tree.q_child, np.int32), _ptr(tree.q_irr, np.float64),
        _ptr(tree.q_depth, np.int32), _ptr(tree.q_threshold, np.float32),
        ctypes.byref(q_count), _i64(tree.quad_capacity),
    )
    tree.q_count = q_count.value
    tree._kd_recompute_geometry()
    return True


def build_alias(leaf_cdf, n_roots, root_leaf_off, root_leaf_cnt):
    """Walker alias tables over each root's leaf CDF segment. Returns
    (alias_prob (q_cap,) f32, alias_other (q_cap,) i32) or None."""
    lib = load()
    if lib is None or not hasattr(lib, "build_alias"):
        return None
    cap = len(leaf_cdf)
    alias_prob = np.ones(cap, np.float32)
    alias_other = np.zeros(cap, np.int32)
    rc = lib.build_alias(
        _ptr(leaf_cdf, np.float32), _i64(n_roots),
        _ptr(root_leaf_off, np.int32), _ptr(root_leaf_cnt, np.int32),
        _ptr(alias_prob, np.float32), _ptr(alias_other, np.int32),
    )
    if rc != 0:
        return None
    return alias_prob, alias_other


def build_lookup(tree, grid_l: int, max_roots: int):
    """Build flattened lookup tables (leaf CDFs + point-location grid) for
    the device. Returns dict of numpy arrays or None if native missing."""
    lib = load()
    if lib is None:
        return None
    if not hasattr(lib, "build_lookup"):
        return None
    nq_cap = tree.quad_capacity
    cells = (1 << grid_l) ** 2
    root_slot = np.full(nq_cap, -1, np.int32)
    grid_node = np.zeros((max_roots, cells), np.int32)
    leaf_node = np.zeros(nq_cap, np.int32)
    leaf_cdf = np.ones(nq_cap, np.float32)
    leaf_lo = np.zeros((nq_cap, 2), np.float32)
    leaf_depth = np.zeros(nq_cap, np.int32)
    root_leaf_off = np.zeros(max_roots, np.int32)
    root_leaf_cnt = np.zeros(max_roots, np.int32)
    n_roots = _i64(0)
    kd_leaf = tree.kd_leaf.view(np.uint8)
    lib.build_lookup.restype = ctypes.c_int
    rc = lib.build_lookup(
        _ptr(tree.kd_quad_root, np.int32), _ptr(kd_leaf, np.uint8),
        _i64(tree.kd_count),
        _ptr(tree.q_child, np.int32), _ptr(tree.q_irr, np.float64),
        _ptr(tree.q_depth, np.int32), _i64(tree.q_count),
        _i32(grid_l),
        _ptr(root_slot, np.int32), _ptr(grid_node, np.int32),
        _ptr(leaf_node, np.int32), _ptr(leaf_cdf, np.float32),
        _ptr(leaf_lo, np.float32), _ptr(leaf_depth, np.int32),
        _ptr(root_leaf_off, np.int32), _ptr(root_leaf_cnt, np.int32),
        _i64(max_roots), ctypes.byref(n_roots),
    )
    if rc != 0:
        raise RuntimeError("build_lookup: root capacity exceeded")
    return dict(
        root_slot=root_slot, grid_node=grid_node, leaf_node=leaf_node,
        leaf_cdf=leaf_cdf, leaf_lo=leaf_lo, leaf_depth=leaf_depth,
        root_leaf_off=root_leaf_off, root_leaf_cnt=root_leaf_cnt,
        n_roots=n_roots.value,
    )
