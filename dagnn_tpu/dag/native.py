"""ctypes bindings for the native dagcore preprocessing library.

Compiles csrc/dagcore.cpp on first use (cached next to the source) and
exposes the C kernels; every entry point has a numpy fallback, so the
framework works without a toolchain. pybind11 is deliberately avoided —
the ABI is three plain C functions.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "csrc", "dagcore.cpp")
_LIB_PATH = os.path.join(_REPO, "csrc", "libdagcore.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    for cc in ("g++", "c++", "clang++"):
        try:
            subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC],
                check=True, capture_output=True,
            )
            return True
        except (FileNotFoundError, subprocess.CalledProcessError):
            continue
    return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)
        ):
            if not os.path.exists(_SRC) or not _build():
                return None
        lib = ctypes.CDLL(_LIB_PATH)
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.dag_topo_levels.argtypes = [i64p, i64p, ctypes.c_int64,
                                        ctypes.c_int64, i32p]
        lib.dag_topo_levels.restype = ctypes.c_int
        lib.dag_topo_levels_batch.argtypes = [i64p, i64p, i64p, i64p,
                                              ctypes.c_int64, i32p]
        lib.dag_topo_levels_batch.restype = ctypes.c_int
        lib.dag_pack_rows.argtypes = [i64p, i64p, i64p, ctypes.c_int64,
                                      ctypes.c_int64, ctypes.c_int64,
                                      ctypes.c_int64, ctypes.c_int64, i64p]
        lib.dag_pack_rows.restype = ctypes.c_int
        lib.dag_stagger_offsets.argtypes = [
            i64p, i64p, ctypes.c_int64, ctypes.c_int64, i64p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i64p]
        lib.dag_stagger_offsets.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_topo_levels(src, dst, num_nodes: int) -> Optional[np.ndarray]:
    """Native leveling; None if the library is unavailable.
    Raises ValueError on cycles (matching dag.topo.topo_levels)."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    out = np.zeros(num_nodes, np.int32)
    r = lib.dag_topo_levels(src, dst, len(src), num_nodes, out)
    if r != 0:
        raise ValueError("graph contains a cycle: topological leveling failed")
    return out


def native_topo_levels_batch(src, dst, noffsets, eoffsets) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    noffsets = np.ascontiguousarray(noffsets, np.int64)
    eoffsets = np.ascontiguousarray(eoffsets, np.int64)
    out = np.zeros(int(noffsets[-1]), np.int32)
    r = lib.dag_topo_levels_batch(src, dst, noffsets, eoffsets,
                                  len(noffsets) - 1, out)
    if r != 0:
        raise ValueError(f"graph {-r - 1} contains a cycle")
    return out


def native_stagger_offsets(level, node_graph, num_graphs: int, kn: int,
                           edge_budget: int = 0,
                           edge_dst=None) -> Optional[np.ndarray]:
    """Greedy stagger packing (schedule.stagger_offsets semantics,
    bit-identical tie-breaking); None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    level = np.ascontiguousarray(level, np.int64).ravel()
    node_graph = np.ascontiguousarray(node_graph, np.int64).ravel()
    if edge_budget and edge_dst is not None:
        edge_dst = np.ascontiguousarray(edge_dst, np.int64).ravel()
    else:
        edge_dst = np.zeros(0, np.int64)
    offs = np.zeros(max(num_graphs, 1), np.int64)
    r = lib.dag_stagger_offsets(level, node_graph, len(level), num_graphs,
                                edge_dst, len(edge_dst), kn,
                                edge_budget or 0, offs)
    if r != 0:
        raise ValueError("invalid stagger input (node_graph out of range)")
    return offs


def native_pack_rows(rdepth, msg_src, msg_dst, n: int, kn: int,
                     edge_budget: int, tg_budget: int = 0
                     ) -> Optional[np.ndarray]:
    """Critical-path row packing (schedule.pack_rows semantics, identical
    pop order / stash bound); None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    rdepth = np.ascontiguousarray(rdepth, np.int64).ravel()
    msg_src = np.ascontiguousarray(msg_src, np.int64).ravel()
    msg_dst = np.ascontiguousarray(msg_dst, np.int64).ravel()
    out = np.zeros(max(n, 1), np.int64)
    r = lib.dag_pack_rows(rdepth, msg_src, msg_dst, n, len(msg_src),
                          kn, edge_budget, tg_budget, out)
    if r == -1:
        raise ValueError(
            f"edge_budget={edge_budget} < max in-degree (native)")
    if r != 0:
        raise ValueError("invalid pack_rows input (edge endpoint range)")
    return out[:n]
