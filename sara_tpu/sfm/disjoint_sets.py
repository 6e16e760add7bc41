"""Union-find / connected components with a native C++ fast path.

Host-side counterpart of the reference's DisjointSets
(reference: cpp/src/DO/Sara/DisjointSets/DisjointSets.hpp, DisjointSetsV2.hpp,
DisjointSets/TwoPassConnectedComponents.hpp). The native library is built
from ``native/sara_native.cpp`` on first use (ctypes C ABI — the image has
no pybind11); a pure-NumPy fallback keeps everything working without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsara_native.so")
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load_native():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            src = os.path.join(_NATIVE_DIR, "sara_native.cpp")
            stale = (os.path.exists(src) and os.path.exists(_LIB_PATH)
                     and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH))
            if not os.path.exists(_LIB_PATH) or stale:
                subprocess.run(["make", "-C", _NATIVE_DIR, "-B"], check=True,
                               capture_output=True)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.ds_create.restype = ctypes.c_void_p
            lib.ds_create.argtypes = [ctypes.c_int64]
            lib.ds_destroy.argtypes = [ctypes.c_void_p]
            lib.ds_union_edges.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64]
            lib.ds_components.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
            lib.connected_components.argtypes = [
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_void_p]
            lib.compress_labels.restype = ctypes.c_int64
            lib.compress_labels.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
            lib.tk_create.restype = ctypes.c_void_p
            lib.tk_create.argtypes = [ctypes.c_int64]
            lib.tk_destroy.argtypes = [ctypes.c_void_p]
            lib.tk_add_features.argtypes = [
                ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p,
                ctypes.c_int64]
            lib.tk_union_edges.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64]
            lib.tk_fill.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
            lib.tk_tracks.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
            _lib = lib
        except Exception:
            _lib_failed = True
    return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


class DisjointSets:
    """Incremental union-find over n elements (native-backed)."""

    def __init__(self, n: int):
        self.n = int(n)
        lib = _load_native()
        if lib is not None:
            self._h = lib.ds_create(self.n)
            self._lib = lib
            self._parent = None
        else:
            self._h = None
            self._lib = None
            self._parent = np.arange(self.n, dtype=np.int64)
            self._rank = np.zeros(self.n, dtype=np.int8)

    def __del__(self):
        if getattr(self, "_h", None) is not None and self._lib is not None:
            self._lib.ds_destroy(self._h)
            self._h = None

    def union_edges(self, a: np.ndarray, b: np.ndarray):
        a = np.ascontiguousarray(a, dtype=np.int64)
        b = np.ascontiguousarray(b, dtype=np.int64)
        if self._h is not None:
            self._lib.ds_union_edges(self._h, _ptr(a), _ptr(b), len(a))
        else:
            for x, y in zip(a, b):
                self._union(int(x), int(y))

    def components(self) -> np.ndarray:
        """Root label of every element."""
        out = np.empty(self.n, dtype=np.int64)
        if self._h is not None:
            self._lib.ds_components(self._h, _ptr(out), self.n)
        else:
            for i in range(self.n):
                out[i] = self._find(i)
        return out

    # -- NumPy fallback internals --
    def _find(self, x: int) -> int:
        root = x
        while self._parent[root] != root:
            root = self._parent[root]
        while self._parent[x] != root:
            self._parent[x], x = root, self._parent[x]
        return root

    def _union(self, a: int, b: int):
        ra, rb = self._find(a), self._find(b)
        if ra == rb:
            return
        if self._rank[ra] < self._rank[rb]:
            ra, rb = rb, ra
        self._parent[rb] = ra
        if self._rank[ra] == self._rank[rb]:
            self._rank[ra] += 1


class TrackerCore:
    """Native incremental union-find + per-(component, frame) non-max
    suppression (winner maps merged small-into-large on union — amortized
    flat per-frame cost). Returns None from :func:`make_tracker_core` when
    the native library is unavailable; callers then use the batch path.
    """

    def __init__(self, capacity: int, lib):
        self.capacity = int(capacity)
        self.n = 0
        self._lib = lib
        self._h = lib.tk_create(self.capacity)

    def __del__(self):
        if getattr(self, "_h", None) is not None:
            self._lib.tk_destroy(self._h)
            self._h = None

    def add_features(self, frame: int, responses: np.ndarray):
        r = np.ascontiguousarray(responses, dtype=np.float32)
        self._lib.tk_add_features(self._h, int(frame), _ptr(r), len(r))
        self.n += len(r)

    def union_edges(self, a: np.ndarray, b: np.ndarray):
        a = np.ascontiguousarray(a, dtype=np.int64)
        b = np.ascontiguousarray(b, dtype=np.int64)
        self._lib.tk_union_edges(self._h, _ptr(a), _ptr(b), len(a))

    def fill(self):
        """(roots, kept, comp_min_gid, comp_nframes) — all per feature."""
        n = self.n
        roots = np.empty(n, np.int64)
        kept = np.empty(n, np.uint8)
        comp_min = np.empty(n, np.int64)
        comp_nframes = np.empty(n, np.int32)
        self._lib.tk_fill(self._h, n, _ptr(roots), _ptr(kept), _ptr(comp_min),
                          _ptr(comp_nframes))
        return roots, kept.astype(bool), comp_min, comp_nframes

    def tracks(self, min_length: int):
        """One native pass: (track_of_feature, component_of_feature,
        comp_min_gid (k,), rep_of_track (t,), k, t)."""
        n = self.n
        out_track = np.empty(n, np.int64)
        out_label = np.empty(n, np.int64)
        comp_min = np.empty(n, np.int64)
        reps = np.empty(n, np.int64)
        k = ctypes.c_int64()
        t = ctypes.c_int64()
        self._lib.tk_tracks(self._h, n, int(min_length), _ptr(out_track),
                            _ptr(out_label), _ptr(comp_min), _ptr(reps),
                            ctypes.byref(k), ctypes.byref(t))
        return (out_track, out_label, comp_min[:k.value].copy(),
                reps[:t.value].copy(), k.value, t.value)


def make_tracker_core(capacity: int):
    lib = _load_native()
    if lib is None or not hasattr(lib, "tk_create"):
        return None
    return TrackerCore(capacity, lib)


def dense_labels(raw: np.ndarray):
    """Compress arbitrary integer labels in [0, n) to dense [0, k).
    Returns (labels (n,) int64, k). Native fast path; np.unique fallback."""
    raw = np.ascontiguousarray(raw, dtype=np.int64)
    n = len(raw)
    lib = _load_native()
    if lib is not None and n:
        out = raw.copy()
        scratch = np.empty(n, dtype=np.int64)
        k = lib.compress_labels(_ptr(out), n, _ptr(scratch))
        return out, int(k)
    uniq, labels = np.unique(raw, return_inverse=True)
    return labels.astype(np.int64), len(uniq)


def connected_components(n: int, a: np.ndarray, b: np.ndarray):
    """One-shot CC over an edge list. Returns (labels (n,), num_components)
    with dense labels in [0, k)."""
    a = np.ascontiguousarray(a, dtype=np.int64)
    b = np.ascontiguousarray(b, dtype=np.int64)
    lib = _load_native()
    if lib is not None:
        out = np.empty(n, dtype=np.int64)
        lib.connected_components(n, _ptr(a), _ptr(b), len(a), _ptr(out))
        scratch = np.empty(n, dtype=np.int64)
        k = lib.compress_labels(_ptr(out), n, _ptr(scratch))
        return out, int(k)
    ds = DisjointSets(n)
    ds.union_edges(a, b)
    roots = ds.components()
    uniq, labels = np.unique(roots, return_inverse=True)
    return labels.astype(np.int64), len(uniq)
