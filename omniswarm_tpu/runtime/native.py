"""ctypes loader for the native runtime components.

Native C++ pieces live next to this module and are compiled on demand with
g++ into ``build/``. Every entry point has a pure-numpy fallback so the
framework degrades gracefully where no toolchain exists.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).resolve().parent
_BUILD = _HERE / "build"
_LOCK = threading.Lock()
_LIBS: dict = {}


def _compile(name: str, sources: list[str], extra_flags: list[str] = ()) -> Optional[Path]:
    _BUILD.mkdir(exist_ok=True)
    so = _BUILD / f"lib{name}.so"
    srcs = [_HERE / s for s in sources]
    if so.exists() and all(so.stat().st_mtime >= s.stat().st_mtime for s in srcs):
        return so
    cmd = ["g++", "-O2", "-march=native", "-shared", "-fPIC", "-std=c++17",
           *extra_flags, *[str(s) for s in srcs], "-o", str(so)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so
    except (subprocess.SubprocessError, FileNotFoundError):
        return None


def _load(name: str, sources: list[str]):
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        so = _compile(name, sources)
        lib = ctypes.CDLL(str(so)) if so is not None else None
        _LIBS[name] = lib
        return lib


def max_clique(adj: np.ndarray) -> np.ndarray:
    """Indices of a (heuristic) maximum clique of a boolean adjacency matrix.

    Uses the native library when available, else the numpy greedy fallback.
    """
    adj = np.ascontiguousarray(adj.astype(np.uint8))
    n = adj.shape[0]
    if n == 0:
        return np.zeros((0,), np.int64)
    lib = _load("maxclique", ["maxclique.cpp"])
    if lib is not None:
        fn = lib.max_clique_heu
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
                       ctypes.POINTER(ctypes.c_int)]
        out = np.zeros(n, np.int32)
        k = fn(adj.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n,
               out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        return out[:k].astype(np.int64)
    return _max_clique_numpy(adj.astype(bool))


def _max_clique_numpy(adj: np.ndarray) -> np.ndarray:
    """Greedy degree-heuristic clique (fallback)."""
    n = adj.shape[0]
    a = adj.copy()
    np.fill_diagonal(a, False)
    best: list[int] = []
    order = np.argsort(-a.sum(1))
    for seed in order[: min(n, 16)]:
        clique = [int(seed)]
        cand = np.flatnonzero(a[seed])
        while cand.size:
            sub = a[np.ix_(cand, cand)]
            pick = cand[int(np.argmax(sub.sum(1)))]
            clique.append(int(pick))
            cand = cand[a[pick, cand]]
        if len(clique) > len(best):
            best = clique
    if not best:
        best = [int(order[0])] if n else []
    return np.asarray(sorted(best), np.int64)
