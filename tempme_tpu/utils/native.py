"""ctypes bindings for the native host runtime (native/tempme_host.cpp).

Compiles the shared library on first use (g++ -O3 -fopenmp) into
``native/build/``; all entry points degrade gracefully if a toolchain is
unavailable (``available()`` gates callers).
"""
from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
_SRC = osp.join(_REPO, "native", "tempme_host.cpp")
_BUILD = osp.join(_REPO, "native", "build")
_SO = osp.join(_BUILD, "libtempme_host.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    os.makedirs(_BUILD, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        out = getattr(e, "stderr", b"")
        print(f"[native] build failed: {out.decode() if out else e}")
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not osp.exists(_SO) or osp.getmtime(_SO) < osp.getmtime(_SRC):
        if not _build():
            return None
    lib = ctypes.CDLL(_SO)
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.th_load_csv.restype = ctypes.c_int64
    lib.th_load_csv.argtypes = [ctypes.c_char_p, ctypes.c_int64, i32p, i32p,
                                f32p, f32p, i32p]
    lib.th_build_csr.restype = None
    lib.th_build_csr.argtypes = [ctypes.c_int64, i32p, i32p, i32p, f32p,
                                 ctypes.c_int64, i32p, i32p, f32p, i64p]
    lib.th_sample_neighbors.restype = None
    lib.th_sample_neighbors.argtypes = [i32p, i32p, f32p, i64p,
                                        ctypes.c_int64, i32p, f32p,
                                        ctypes.c_int32, ctypes.c_uint64,
                                        i32p, i32p, f32p]
    lib.th_sample_walks.restype = None
    lib.th_sample_walks.argtypes = [i32p, i32p, f32p, i64p, f32p,
                                    ctypes.c_int64, i32p, i32p, i32p,
                                    ctypes.c_uint64, i32p, f32p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def load_csv(path: str):
    """Fast ml_{name}.csv parser -> (src, dst, ts, label, eidx)."""
    lib = _load()
    assert lib is not None
    empty_i = np.empty(0, np.int32)
    empty_f = np.empty(0, np.float32)
    n = lib.th_load_csv(path.encode(), 0, empty_i, empty_i, empty_f, empty_f,
                        empty_i)
    if n < 0:
        raise IOError(f"cannot read {path}")
    src = np.empty(n, np.int32)
    dst = np.empty(n, np.int32)
    ts = np.empty(n, np.float32)
    label = np.empty(n, np.float32)
    eidx = np.empty(n, np.int32)
    got = lib.th_load_csv(path.encode(), n, src, dst, ts, label, eidx)
    assert got >= n
    return src, dst, ts, label, eidx


class HostGraph:
    """Host-side CSR adjacency + exact-semantics samplers (native)."""

    def __init__(self, src, dst, eidx, ts, num_nodes: int, num_edges: int):
        lib = _load()
        assert lib is not None
        self._lib = lib
        n = len(src)
        t = 2 * n
        self.ngh = np.empty(t, np.int32)
        self.eid = np.empty(t, np.int32)
        self.ts = np.empty(t, np.float32)
        self.off = np.empty(num_nodes + 1, np.int64)
        lib.th_build_csr(n, np.ascontiguousarray(src, np.int32),
                         np.ascontiguousarray(dst, np.int32),
                         np.ascontiguousarray(eidx, np.int32),
                         np.ascontiguousarray(ts, np.float32),
                         num_nodes, self.ngh, self.eid, self.ts, self.off)
        self.edge_ts = np.zeros(num_edges, np.float32)
        self.edge_ts[np.asarray(eidx)] = np.asarray(ts)

    def sample_neighbors(self, nodes, times, n: int, seed: int = 0
                         ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        q = len(nodes)
        out_n = np.empty((q, n), np.int32)
        out_e = np.empty((q, n), np.int32)
        out_t = np.empty((q, n), np.float32)
        self._lib.th_sample_neighbors(
            self.ngh, self.eid, self.ts, self.off, q,
            np.ascontiguousarray(nodes, np.int32),
            np.ascontiguousarray(times, np.float32), n, seed,
            out_n, out_e, out_t)
        return out_n, out_e, out_t

    def sample_walks(self, s1, u1, e1, seed: int = 0):
        """Flattened walk continuation: per (s1, u1, e1) row, events 2 and 3
        plus the (x, t) anonymous code.
        Returns int out [W, 8] = (s2,u2,e2,s3,u3,e3,x,t) and ts [W, 2]."""
        w = len(s1)
        out = np.empty((w, 8), np.int32)
        out_t = np.empty((w, 2), np.float32)
        self._lib.th_sample_walks(
            self.ngh, self.eid, self.ts, self.off, self.edge_ts, w,
            np.ascontiguousarray(s1, np.int32),
            np.ascontiguousarray(u1, np.int32),
            np.ascontiguousarray(e1, np.int32), seed, out, out_t)
        return out, out_t
