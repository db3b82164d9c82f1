"""Build-on-first-use loader for the C Delaunay kernel (_delaunay.c).

Why compile at import: executors receive the package via
``spark-submit --py-files`` as a zip of sources; shipping a prebuilt
``.so`` would pin one glibc/arch.  Compiling the single-file kernel with
the node's ``cc`` takes ~200 ms once per node, the artifact is cached in
a content-addressed temp path (atomic rename, safe under 32 concurrent
workers), and ANY failure — no compiler, sandboxed /tmp, exotic arch —
falls back to the pure-numpy Bowyer-Watson in :mod:`delaunay`, which is
semantics-identical (both produce valid Delaunay triangulations; rasters
are compared with tolerance, SURVEY.md §7).

Kill-switch: ``LSU_NO_NATIVE=1`` forces the pure-Python path (used by
tests to pin fallback behavior).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_delaunay.c")
_loaded = False
_fn = None


def _build_and_load():
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    cache_dir = os.path.join(tempfile.gettempdir(), "lasutility_native")
    so_path = os.path.join(cache_dir, f"_delaunay_{tag}.so")
    if not os.path.exists(so_path):
        os.makedirs(cache_dir, exist_ok=True)
        cc = shutil.which("cc") or shutil.which("gcc") or shutil.which("clang")
        if cc is None:
            return None
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=cache_dir)
        os.close(fd)
        try:
            subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", "-o", tmp, _SRC, "-lm"],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.replace(tmp, so_path)  # atomic under concurrent builders
        except Exception:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            return None
    lib = ctypes.CDLL(so_path)
    fn = lib.lsu_triangulate
    fn.restype = ctypes.c_int64
    fn.argtypes = [
        ctypes.c_int64,
        np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS"),
    ]
    return fn


def triangulate(x: np.ndarray, y: np.ndarray) -> np.ndarray | None:
    """C sweep-hull triangulation; None => caller must use the fallback."""
    global _loaded, _fn
    if os.environ.get("LSU_NO_NATIVE") == "1":
        return None
    if not _loaded:
        try:
            _fn = _build_and_load()
        except Exception:
            _fn = None
        _loaded = True
    if _fn is None:
        return None
    n = len(x)
    if n < 3:
        return np.empty((0, 3), dtype=np.int64)
    x = np.ascontiguousarray(x, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)
    out = np.empty((2 * n, 3), dtype=np.int64)
    rc = _fn(n, x, y, out)
    if rc == -2:  # fully collinear
        return np.empty((0, 3), dtype=np.int64)
    if rc < 0:
        return None
    return out[:rc].copy()
