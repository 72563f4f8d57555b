"""ctypes binding for the native C++ featurizer (featurizer.cpp).

The library is built on demand (``make`` in this directory, g++ -O3) and
cached; when the toolchain or build is unavailable, ``available()`` returns
False and callers fall back to the pure-Python chem/ stack.  Output parity
between the two is asserted in tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

from ..chem.featurize import GraphArrays

__all__ = ["available", "featurize", "NativeError", "build"]

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "libcgrfeat.so"
_lock = threading.Lock()
_lib = None
_build_failed = False


class NativeError(RuntimeError):
    pass


def build(force: bool = False) -> bool:
    """Compile the shared library; returns success."""
    global _build_failed
    if _SO.exists() and not force:
        return True
    try:
        subprocess.run(["make", "-C", str(_DIR), "-s"], check=True,
                       capture_output=True, text=True, timeout=300)
        return _SO.exists()
    except Exception:
        _build_failed = True
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not _SO.exists() and not build():
            raise NativeError("native featurizer unavailable (build failed)")
        lib = ctypes.CDLL(str(_SO))
        lib.cgr_graph_new.restype = ctypes.c_void_p
        lib.cgr_graph_new.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.cgr_last_error.restype = ctypes.c_char_p
        for f in ["cgr_graph_num_atoms", "cgr_graph_num_edges",
                  "cgr_graph_atom_fdim", "cgr_graph_bond_fdim"]:
            getattr(lib, f).restype = ctypes.c_int
            getattr(lib, f).argtypes = [ctypes.c_void_p]
        lib.cgr_graph_copy.restype = None
        lib.cgr_graph_copy.argtypes = [ctypes.c_void_p] + \
            [np.ctypeslib.ndpointer(np.float32)] * 2 + \
            [np.ctypeslib.ndpointer(np.int32)] * 2
        lib.cgr_graph_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    if _build_failed:
        return False
    try:
        _load()
        return True
    except NativeError:
        return False


def featurize(smiles: str, mode: str = "rxn") -> GraphArrays:
    """Native equivalent of chem.RxnGraph / chem.MolGraph -> GraphArrays."""
    lib = _load()
    h = lib.cgr_graph_new(smiles.encode(), 1 if mode == "rxn" else 0)
    if not h:
        raise NativeError(lib.cgr_last_error().decode())
    try:
        n = lib.cgr_graph_num_atoms(h)
        e = lib.cgr_graph_num_edges(h)
        fa = lib.cgr_graph_atom_fdim(h)
        fb = lib.cgr_graph_bond_fdim(h)
        node_feats = np.empty((n, fa), np.float32)
        edge_feats = np.empty((e, fb), np.float32)
        senders = np.empty((e,), np.int32)
        receivers = np.empty((e,), np.int32)
        lib.cgr_graph_copy(h, node_feats, edge_feats, senders, receivers)
    finally:
        lib.cgr_graph_free(h)
    rev = (np.arange(e, dtype=np.int32) ^ 1) if e else np.zeros((0,), np.int32)
    return GraphArrays(node_feats, edge_feats, senders, receivers, rev)
