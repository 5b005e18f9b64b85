"""ctypes binding for the native host library (csrc/gnnhost.cpp).

The reference's host runtime is C++ (loader src/data.cu, scheduler
include/graph_schedule.h, sampling include/sample.h); the TPU rebuild keeps
device compute in XLA/Pallas but implements the same host-side O(m) passes
natively.  The shared library is built lazily with g++ on first use and
cached next to the package; every entry point has a numpy fallback so the
framework still works without a toolchain.

Public surface:
  available()            -> bool
  parse_ints(path)       -> int64[]        (text graph/reorder parsing)
  ng_schedule(indptr, B) -> (start, count, dst)
  union_find_merge(n, pairs, cap) -> root[n]
  subgraph_compact(...)  -> (src, dst, rowptr)
  expand_frontier(...)   -> newly active ids
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "csrc",
    "gnnhost.cpp",
)
_LIB_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native")
_LIB_PATH = os.path.join(_LIB_DIR, "libgnnhost.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    os.makedirs(_LIB_DIR, exist_ok=True)
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        _SRC,
        "-o",
        _LIB_PATH,
    ]
    try:
        r = subprocess.run(
            cmd, capture_output=True, text=True, timeout=120
        )
        return r.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def _load() -> Optional[ctypes.CDLL]:
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
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None

        i64, i32, u8, u64 = (
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_uint8,
            ctypes.c_uint64,
        )
        P = ctypes.POINTER
        lib.gs_parse_ints.restype = i64
        lib.gs_parse_ints.argtypes = [ctypes.c_char_p, P(i64), i64]
        lib.gs_ng_schedule.restype = i64
        lib.gs_ng_schedule.argtypes = [
            i64, P(i32), i64, P(i64), P(i32), P(i32)]
        lib.gs_union_find_merge.restype = None
        lib.gs_union_find_merge.argtypes = [i64, i64, P(i64), i64, P(i64)]
        lib.gs_subgraph_compact.restype = i64
        lib.gs_subgraph_compact.argtypes = [
            i64, P(i32), P(i32), P(i32), P(u8), P(i64), i64, u64,
            P(i32), P(i32), P(i64)]
        lib.gs_expand_frontier.restype = i64
        lib.gs_expand_frontier.argtypes = [
            i64, P(i32), P(i32), P(i32), P(u8), P(i32), i64]
        f32 = ctypes.c_float
        i8 = ctypes.c_int8
        lib.gs_scatter_add_f32.restype = None
        lib.gs_scatter_add_f32.argtypes = [i64, P(i64), P(f32), P(f32)]
        lib.gs_saturating_count_i8.restype = None
        lib.gs_saturating_count_i8.argtypes = [i64, P(i64), i64, P(i8), P(u8)]
        lib.gs_counting_sort.restype = None
        lib.gs_counting_sort.argtypes = [i64, P(i64), i64, P(i64), P(i64)]
        lib.gs_jaccard_cluster.restype = None
        lib.gs_jaccard_cluster.argtypes = [
            i64, P(i64), P(i32), i64, P(i64), i64, P(i64)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def parse_ints(path: str) -> Optional[np.ndarray]:
    """Parse all whitespace-separated ints in a text file (mmap'd native
    scanner); None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    count = lib.gs_parse_ints(path.encode(), None, 0)
    if count < 0:
        raise IOError(f"cannot read {path}")
    out = np.empty(count, dtype=np.int64)
    got = lib.gs_parse_ints(path.encode(), _ptr(out, ctypes.c_int64), count)
    assert got == count
    return out


def ng_schedule(
    indptr: np.ndarray, block: int
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    n = len(indptr) - 1
    num = lib.gs_ng_schedule(
        n, _ptr(indptr, ctypes.c_int32), block, None, None, None
    )
    start = np.empty(num, dtype=np.int64)
    count = np.empty(num, dtype=np.int32)
    dst = np.empty(num, dtype=np.int32)
    lib.gs_ng_schedule(
        n,
        _ptr(indptr, ctypes.c_int32),
        block,
        _ptr(start, ctypes.c_int64),
        _ptr(count, ctypes.c_int32),
        _ptr(dst, ctypes.c_int32),
    )
    return start, count, dst


def jaccard_cluster(
    indptr: np.ndarray,
    indices: np.ndarray,
    pairs: np.ndarray,
    cap: int,
) -> Optional[np.ndarray]:
    """Exact-Jaccard priority-queue agglomeration with lazy root
    re-enqueue — the reference's full clustering loop
    (script/cluster2.py:108-153), native.  ``pairs``: int64[npairs, 2]
    LSH candidates.  Returns root[n], or None without the native lib
    (the algorithm is inherently sequential heap-pops — no vectorized
    numpy rendition exists; callers fall back to cluster_reorder's
    one-shot merge)."""
    lib = _load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    pairs = np.ascontiguousarray(pairs, dtype=np.int64)
    n = len(indptr) - 1
    root = np.empty(n, dtype=np.int64)
    lib.gs_jaccard_cluster(
        n,
        _ptr(indptr, ctypes.c_int64),
        _ptr(indices, ctypes.c_int32),
        len(pairs),
        _ptr(pairs, ctypes.c_int64),
        cap,
        _ptr(root, ctypes.c_int64),
    )
    return root


def union_find_merge(
    n: int, pairs: np.ndarray, cap: int
) -> Optional[np.ndarray]:
    """pairs: int64[npairs, 2] best-first; returns root[n]."""
    lib = _load()
    if lib is None:
        return None
    pairs = np.ascontiguousarray(pairs, dtype=np.int64)
    root = np.empty(n, dtype=np.int64)
    lib.gs_union_find_merge(
        n,
        len(pairs),
        _ptr(pairs, ctypes.c_int64),
        cap,
        _ptr(root, ctypes.c_int64),
    )
    return root


def subgraph_compact(
    vertices: np.ndarray,
    indptr: np.ndarray,
    indices: np.ndarray,
    active: np.ndarray,
    renum: np.ndarray,
    cap: int = 0,
    seed: int = 123,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    vertices = np.ascontiguousarray(vertices, dtype=np.int32)
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    active = np.ascontiguousarray(active, dtype=np.uint8)
    renum = np.ascontiguousarray(renum, dtype=np.int64)
    num_v = len(vertices)
    total = lib.gs_subgraph_compact(
        num_v,
        _ptr(vertices, ctypes.c_int32),
        _ptr(indptr, ctypes.c_int32),
        _ptr(indices, ctypes.c_int32),
        _ptr(active, ctypes.c_uint8),
        _ptr(renum, ctypes.c_int64),
        cap,
        seed,
        None,
        None,
        None,
    )
    src = np.empty(total, dtype=np.int32)
    dst = np.empty(total, dtype=np.int32)
    rowptr = np.empty(num_v + 1, dtype=np.int64)
    lib.gs_subgraph_compact(
        num_v,
        _ptr(vertices, ctypes.c_int32),
        _ptr(indptr, ctypes.c_int32),
        _ptr(indices, ctypes.c_int32),
        _ptr(active, ctypes.c_uint8),
        _ptr(renum, ctypes.c_int64),
        cap,
        seed,
        _ptr(src, ctypes.c_int32),
        _ptr(dst, ctypes.c_int32),
        _ptr(rowptr, ctypes.c_int64),
    )
    return src, dst, rowptr


def expand_frontier(
    frontier: np.ndarray,
    indptr: np.ndarray,
    indices: np.ndarray,
    active: np.ndarray,
) -> Optional[np.ndarray]:
    """One hop; mutates ``active`` in place, returns new ids."""
    lib = _load()
    if lib is None:
        return None
    frontier = np.ascontiguousarray(frontier, dtype=np.int32)
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    assert active.dtype == np.uint8 and active.flags.c_contiguous
    cap = len(indices)
    out = np.empty(cap, dtype=np.int32)
    cnt = lib.gs_expand_frontier(
        len(frontier),
        _ptr(frontier, ctypes.c_int32),
        _ptr(indptr, ctypes.c_int32),
        _ptr(indices, ctypes.c_int32),
        _ptr(active, ctypes.c_uint8),
        _ptr(out, ctypes.c_int32),
        cap,
    )
    return out[:cnt].copy()


def scatter_add_f32(flat: np.ndarray, val: np.ndarray, out: np.ndarray) -> bool:
    """out[flat] += val (flat int64, out f32 flat buffer).  True if the
    native path ran; caller falls back to np.add.at otherwise."""
    lib = _load()
    if lib is None:
        return False
    flat = np.ascontiguousarray(flat, dtype=np.int64)
    val = np.ascontiguousarray(val, dtype=np.float32)
    assert out.dtype == np.float32 and out.flags.c_contiguous
    lib.gs_scatter_add_f32(
        len(flat),
        _ptr(flat, ctypes.c_int64),
        _ptr(val, ctypes.c_float),
        _ptr(out, ctypes.c_float),
    )
    return True


def saturating_count_i8(
    flat: np.ndarray, cap: int, out: np.ndarray
) -> Optional[np.ndarray]:
    """out[flat] saturating-increment up to cap; returns bool spill mask
    (True where the edge exceeded the cap), or None without the lib."""
    lib = _load()
    if lib is None:
        return None
    flat = np.ascontiguousarray(flat, dtype=np.int64)
    assert out.dtype == np.int8 and out.flags.c_contiguous
    spill = np.empty(len(flat), dtype=np.uint8)
    lib.gs_saturating_count_i8(
        len(flat),
        _ptr(flat, ctypes.c_int64),
        int(cap),
        _ptr(out, ctypes.c_int8),
        _ptr(spill, ctypes.c_uint8),
    )
    return spill.astype(bool)


def counting_sort(key: np.ndarray, nbins: int) -> Optional[np.ndarray]:
    """Stable ascending-by-key permutation (int64 keys < nbins), O(m+nbins);
    None without the lib (caller uses np.argsort(kind='stable'))."""
    lib = _load()
    if lib is None:
        return None
    key = np.ascontiguousarray(key, dtype=np.int64)
    scratch = np.empty(nbins, dtype=np.int64)
    order = np.empty(len(key), dtype=np.int64)
    lib.gs_counting_sort(
        len(key),
        _ptr(key, ctypes.c_int64),
        int(nbins),
        _ptr(scratch, ctypes.c_int64),
        _ptr(order, ctypes.c_int64),
    )
    return order
