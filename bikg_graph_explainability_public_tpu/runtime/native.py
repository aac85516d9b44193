"""ctypes bindings for the native host-side graph builder.

Compiles ``graph_builder.cpp`` with g++ on first use (cached next to the
source, keyed by source mtime).  Falls back to pure-numpy implementations if
no compiler is available, so the framework never hard-requires the native
path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "graph_builder.cpp")
_SO = os.path.join(_HERE, "_graph_builder.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _compile() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _SO
    except Exception:
        return None


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is None and not _TRIED:
            _TRIED = True
            so = _compile()
            if so:
                lib = ctypes.CDLL(so)
                lib.degree_count.argtypes = [ctypes.c_int64, ctypes.c_int64, _i32p, _i64p]
                lib.build_csr.argtypes = [
                    ctypes.c_int64, ctypes.c_int64, _i32p, _i32p, _i64p, _i32p, _i32p,
                ]
                lib.build_ell.argtypes = [
                    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                    _i32p, _i32p, _i32p, _i32p, _u8p,
                ]
                lib.build_ell.restype = ctypes.c_int64
                lib.max_degree.argtypes = [ctypes.c_int64, ctypes.c_int64, _i32p]
                lib.max_degree.restype = ctypes.c_int64
                lib.khop_reachable.argtypes = [
                    ctypes.c_int64, ctypes.c_int64, _i32p, _i32p,
                    ctypes.c_int64, ctypes.c_int64, _u8p,
                ]
                lib.bfs_levels_csr.argtypes = [
                    ctypes.c_int64, _i64p, _i32p,
                    ctypes.c_int64, ctypes.c_int64, _i32p,
                ]
                lib.edge_mask_from_node_mask.argtypes = [
                    ctypes.c_int64, _i32p, _i32p, _u8p, _u8p,
                ]
                lib.halo_plan_sizes.argtypes = [
                    ctypes.c_int64, ctypes.c_int64, _i32p, _i32p,
                    ctypes.c_int64, ctypes.c_int64, _i64p, _i64p,
                ]
                lib.halo_plan_fill.argtypes = [
                    ctypes.c_int64, ctypes.c_int64, _i32p, _i32p,
                    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                    ctypes.c_int64, _i32p, _i32p, _i32p, _i32p, _u8p,
                ]
                _LIB = lib
        return _LIB


def native_available() -> bool:
    """True when the C++ runtime shared library is loaded."""
    return _lib() is not None


def _c32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, np.int32))


def build_csr(n: int, src, dst) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """CSR by receiver: (row_ptr [n+1] i64, col [e] i32 senders, eid [e] i32)."""
    src, dst = _c32(src), _c32(dst)
    e = src.shape[0]
    lib = _lib()
    row_ptr = np.zeros(n + 1, np.int64)
    col = np.zeros(e, np.int32)
    eid = np.zeros(e, np.int32)
    if lib is not None:
        lib.build_csr(n, e, src, dst, row_ptr, col, eid)
        return row_ptr, col, eid
    order = np.argsort(dst, kind="stable")
    counts = np.bincount(dst, minlength=n)
    row_ptr[1:] = np.cumsum(counts)
    return row_ptr, src[order], order.astype(np.int32)


def max_degree(n: int, dst) -> int:
    """Maximum in-degree over receivers (native, numpy fallback)."""
    dst = _c32(dst)
    lib = _lib()
    if lib is not None:
        return int(lib.max_degree(n, dst.shape[0], dst))
    return int(np.bincount(dst, minlength=n).max()) if dst.size else 0


def build_ell(
    n: int, src, dst, k: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Padded neighbour tables: (nbr [n,k] i32, eid [n,k] i32,
    valid [n,k] bool, dropped)."""
    src, dst = _c32(src), _c32(dst)
    e = src.shape[0]
    lib = _lib()
    nbr = np.zeros((n, k), np.int32)
    eid = np.zeros((n, k), np.int32)
    valid = np.zeros((n, k), np.uint8)
    if lib is not None:
        dropped = int(lib.build_ell(n, e, k, src, dst, nbr, eid, valid))
        return nbr, eid, valid.astype(bool), dropped
    # vectorized fallback (same argsort/cumsum pattern as the compact-plan
    # builder, spmm_pallas.py): a stable sort by receiver preserves edge
    # order within each row, so `position - group_start` IS the slot the
    # edge-order loop would assign; slots >= k are the dropped tail.
    order = np.argsort(dst, kind="stable")
    counts = np.bincount(dst, minlength=n)
    group_start = np.zeros(n, np.int64)
    np.cumsum(counts[:-1], out=group_start[1:])
    slot = np.arange(e, dtype=np.int64) - np.repeat(group_start, counts)
    keep = slot < k
    rows = dst[order][keep]
    cols = slot[keep]
    nbr[rows, cols] = src[order][keep]
    eid[rows, cols] = order[keep].astype(np.int32)
    valid[rows, cols] = 1
    dropped = int(e - keep.sum())
    return nbr, eid, valid.astype(bool), dropped


def khop_reachable(n: int, src, dst, query: int, hops: int) -> np.ndarray:
    """Directed BFS towards the query (PyG source_to_target semantics)."""
    src, dst = _c32(src), _c32(dst)
    lib = _lib()
    out = np.zeros(n, np.uint8)
    if lib is not None:
        lib.khop_reachable(n, src.shape[0], src, dst, query, hops, out)
        return out.astype(bool)
    reach = np.zeros(n, bool)
    reach[query] = True
    for _ in range(hops):
        new = reach | np.bincount(
            src[reach[dst]], minlength=n
        ).astype(bool)
        if (new == reach).all():
            break
        reach = new
    return reach


def build_halo_plan(n: int, src, dst, n_local: int, d: int, round_to: int = 8):
    """Native halo-exchange partition plan (see ``parallel/halo.py``).

    Returns ``(halo, e_loc, send_idx [d,d,halo] i32, edge_slot [d,e_loc] i32,
    edge_rcv, edge_id, edge_valid [d,e_loc] f32)`` or ``None`` when the
    native library is unavailable (callers fall back to the numpy planner).
    """
    lib = _lib()
    if lib is None:
        return None
    src, dst = _c32(src), _c32(dst)
    e = src.shape[0]
    halo_sz = np.zeros(1, np.int64)
    eloc_sz = np.zeros(1, np.int64)
    lib.halo_plan_sizes(n, e, src, dst, n_local, d, halo_sz, eloc_sz)
    rnd = max(round_to, 1)
    halo = max((int(halo_sz[0]) + rnd - 1) // rnd * rnd, rnd)
    e_loc = max((int(eloc_sz[0]) + rnd - 1) // rnd * rnd, rnd)
    send_idx = np.zeros((d, d, halo), np.int32)
    edge_slot = np.zeros((d, e_loc), np.int32)
    edge_rcv = np.zeros((d, e_loc), np.int32)
    edge_id = np.zeros((d, e_loc), np.int32)
    edge_valid = np.zeros((d, e_loc), np.uint8)
    lib.halo_plan_fill(
        n, e, src, dst, n_local, d, halo, e_loc,
        send_idx, edge_slot, edge_rcv, edge_id, edge_valid,
    )
    return halo, e_loc, send_idx, edge_slot, edge_rcv, edge_id, edge_valid.astype(np.float32)


def edge_mask_from_node_mask(src, dst, node_mask) -> np.ndarray:
    """Edge keep-mask from a node mask: keep iff both endpoints kept
    (reference data.py:431-444 in1d role)."""
    src, dst = _c32(src), _c32(dst)
    node_mask = np.ascontiguousarray(np.asarray(node_mask, np.uint8))
    lib = _lib()
    keep = np.zeros(src.shape[0], np.uint8)
    if lib is not None:
        lib.edge_mask_from_node_mask(src.shape[0], src, dst, node_mask, keep)
        return keep.astype(bool)
    nm = node_mask.astype(bool)
    return nm[src] & nm[dst]


def bfs_levels_csr(
    n: int, row_ptr: np.ndarray, col: np.ndarray, query: int, max_hops: int
) -> np.ndarray:
    """In-distance (BFS level) per node from ``query`` over a prebuilt
    receiver-CSR; unreached nodes get ``max_hops + 1``.  One call replaces
    ``max_hops + 1`` :func:`khop_reachable` calls (each rebuilds the CSR)."""
    lib = _lib()
    out = np.full(n, max_hops + 1, np.int32)
    if lib is not None:
        lib.bfs_levels_csr(
            n,
            np.ascontiguousarray(row_ptr, np.int64),
            np.ascontiguousarray(col, np.int32),
            query,
            max_hops,
            out,
        )
        return out
    out[query] = 0
    frontier = [query]
    for h in range(1, max_hops + 1):
        nxt = []
        for v in frontier:
            for u in col[row_ptr[v] : row_ptr[v + 1]]:
                if out[u] > h:
                    out[u] = h
                    nxt.append(u)
        frontier = nxt
    return out
