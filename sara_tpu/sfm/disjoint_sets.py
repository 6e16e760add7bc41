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
            if not os.path.exists(_LIB_PATH):
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
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
