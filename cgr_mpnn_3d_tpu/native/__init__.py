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

__all__ = ["available", "featurize", "pack_graphs_native",
           "pack_epoch_native", "place_graphs_native", "last_error",
           "NativeError", "build"]

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "libcgrfeat.so"
_lock = threading.Lock()
_lib = None
_build_failed = False


class NativeError(RuntimeError):
    pass


def _stale() -> bool:
    """True when the .so predates a source edit (rebuild needed)."""
    if not _SO.exists():
        return True
    so_mtime = _SO.stat().st_mtime
    return any((_DIR / src).exists()
               and (_DIR / src).stat().st_mtime > so_mtime
               for src in ("featurizer.cpp", "packer.cpp", "Makefile"))


def build(force: bool = False) -> bool:
    """Compile the shared library; returns success.

    Rebuilds automatically when featurizer.cpp/packer.cpp are newer than the
    existing .so, so a stale binary is never silently used."""
    global _build_failed
    if not force and not _stale():
        return True
    try:
        subprocess.run(["make", "-C", str(_DIR), "-s", "-B"], check=True,
                       capture_output=True, text=True, timeout=300)
        return _SO.exists() and not _stale()
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
        if not build():
            raise NativeError("native featurizer unavailable (build failed)")
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError as e:  # wrong arch/glibc for a prebuilt binary
            raise NativeError(f"native featurizer failed to load: {e}") from e
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
        f32 = np.ctypeslib.ndpointer(np.float32, flags="C")
        i32 = np.ctypeslib.ndpointer(np.int32, flags="C")
        lib.cgr_pack_graphs.restype = ctypes.c_int
        lib.cgr_pack_graphs.argtypes = (
            [ctypes.c_int32] * 6            # spec
            + [ctypes.c_int32, i32, i32]    # n_graphs, node/edge counts
            + [f32, ctypes.c_int32, f32, ctypes.c_int32]  # feats + dims
            + [i32, i32, f32, i32]          # senders, receivers, labels, rows
            + [f32, f32, i32, i32, i32, i32, i32, i32, i32, i32, i32,
               f32, f32, i32])              # outputs
        lib.cgr_place_graphs.restype = ctypes.c_int
        lib.cgr_place_graphs.argtypes = (
            [ctypes.c_int32] * 6 + [ctypes.c_int32, i32, i32, i32])
        u64 = np.ctypeslib.ndpointer(np.uint64, flags="C")
        lib.cgr_pack_epoch.restype = ctypes.c_int
        lib.cgr_pack_epoch.argtypes = (
            [ctypes.c_int32] * 6            # spec
            + [ctypes.c_int32, i32, i32]    # n_rows, node/edge counts
            + [u64, ctypes.c_int32]         # node feat ptrs, base_dim
            + [u64, ctypes.c_int32]         # extra feat ptrs, extra_dim
            + [u64, ctypes.c_int32]         # edge feat ptrs, e_feat
            + [u64, u64, f32, i32]          # send/recv ptrs, labels, rows
            + [ctypes.c_int32] * 4          # bs, sort, drop_last, max_win
            + [f32, f32, i32, i32, i32, i32, i32, i32, i32, i32, i32,
               f32, f32, i32]               # stacked outputs [W, ...]
            + [np.ctypeslib.ndpointer(np.int32)])  # n_windows_out
        _lib = lib
        return _lib


def available() -> bool:
    if _build_failed:
        return False
    try:
        _load()
        return True
    except Exception:
        # any failure (build, dlopen on a foreign platform, symbol lookup)
        # means callers must fall back to the pure-Python chem/ stack
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


def pack_graphs_native(graphs, labels, spec, extra_node_feats=None,
                       row_ids=None):
    """Native equivalent of data.batch.pack_graphs (same semantics, same
    sentinels; bit-parity asserted in tests/test_native.py).  Falls back is
    the caller's responsibility (check available())."""
    from ..data.batch import PackedGraphBatch

    lib = _load()
    n_graphs = len(graphs)
    n_feat = graphs[0].node_feats.shape[1]
    if extra_node_feats is not None:
        n_feat += extra_node_feats[0].shape[1]
    e_feat = graphs[0].edge_feats.shape[1]

    node_counts = np.asarray([g.num_nodes for g in graphs], np.int32)
    edge_counts = np.asarray([g.num_edges for g in graphs], np.int32)
    if extra_node_feats is None:
        node_feats = np.ascontiguousarray(
            np.concatenate([g.node_feats for g in graphs], axis=0))
    else:
        node_feats = np.ascontiguousarray(np.concatenate(
            [np.concatenate([g.node_feats,
                             np.asarray(x, np.float32)], axis=1)
             for g, x in zip(graphs, extra_node_feats)], axis=0))
    edge_feats = np.ascontiguousarray(
        np.concatenate([g.edge_feats for g in graphs], axis=0))
    senders = np.ascontiguousarray(
        np.concatenate([g.senders for g in graphs]))
    receivers = np.ascontiguousarray(
        np.concatenate([g.receivers for g in graphs]))
    labels_in = np.asarray(labels, np.float32)
    rows_in = (np.arange(n_graphs, dtype=np.int32) if row_ids is None
               else np.asarray(list(row_ids), np.int32))

    ET, NT, BT = spec.total_edges, spec.total_nodes, spec.total_graphs
    out = PackedGraphBatch(
        node_x=np.empty((NT, n_feat), np.float32),
        edge_attr=np.empty((ET, e_feat), np.float32),
        senders=np.empty(ET, np.int32),
        receivers=np.empty(ET, np.int32),
        rev=np.empty(ET, np.int32),
        edge_nbr=np.empty((ET, spec.d), np.int32),
        edge_nbr_rev=np.empty((ET, spec.d), np.int32),
        node_inc=np.empty((NT, spec.d), np.int32),
        node_out=np.empty((NT, spec.d), np.int32),
        graph_of_node=np.empty(NT, np.int32),
        graph_nodes=np.empty((BT, spec.dn), np.int32),
        labels=np.empty(BT, np.float32),
        graph_mask=np.empty(BT, np.float32),
        row_ids=np.empty(BT, np.int32),
    )
    rc = lib.cgr_pack_graphs(
        spec.p, spec.te, spec.tn, spec.tb, spec.d, spec.dn,
        n_graphs, node_counts, edge_counts,
        node_feats, n_feat, edge_feats, e_feat,
        senders, receivers, labels_in, rows_in,
        out.node_x, out.edge_attr, out.senders, out.receivers, out.rev,
        out.edge_nbr, out.edge_nbr_rev, out.node_inc, out.node_out,
        out.graph_of_node, out.graph_nodes, out.labels, out.graph_mask,
        out.row_ids)
    if rc != 0:
        raise ValueError(lib.cgr_last_error().decode())
    if np.dtype(spec.feat_dtype) != np.float32:
        out = out._replace(
            node_x=out.node_x.astype(spec.feat_dtype),
            edge_attr=out.edge_attr.astype(spec.feat_dtype))
    return out


def place_graphs_native(graphs, spec) -> bool:
    """Placement-only feasibility probe for one window (no output
    allocation/writes): True iff ``pack_graphs_native(graphs, ..., spec)``
    would succeed.  The loader's overflow-shrink loop probes with this
    and pays the full pack exactly once (cf. cgr_pack_epoch's dry pass).
    Raises ValueError at the caller's request via :func:`last_error`."""
    lib = _load()
    node_counts = np.asarray([g.num_nodes for g in graphs], np.int32)
    edge_counts = np.asarray([g.num_edges for g in graphs], np.int32)
    recv = (np.ascontiguousarray(np.concatenate(
        [g.receivers for g in graphs])) if len(graphs) else
        np.zeros(0, np.int32))
    if recv.size == 0:
        recv = np.zeros(1, np.int32)  # valid pointer for the empty case
    rc = lib.cgr_place_graphs(
        spec.p, spec.te, spec.tn, spec.tb, spec.d, spec.dn,
        len(graphs), node_counts, edge_counts, recv)
    return rc == 0


def last_error() -> str:
    return _load().cgr_last_error().decode()


def _ptr_table(arrays, dtype, keep: list) -> np.ndarray:
    """uint64 table of each array's data pointer (C-contiguous, dtype
    coerced); appends every (possibly copied) array to ``keep``, which
    the caller must hold alive across the native call."""
    ptrs = np.empty(len(arrays), np.uint64)
    for i, a in enumerate(arrays):
        a = np.ascontiguousarray(a, dtype=dtype)
        keep.append(a)
        ptrs[i] = a.ctypes.data
    return ptrs


def pack_epoch_native(graphs, labels, spec, batch_size,
                      extra_node_feats=None, row_ids=None,
                      sort_within=True, drop_last=False):
    """Pack a WHOLE epoch in one native call (the --reuse_packs cache
    build).  ``graphs``/``labels`` arrive in epoch (already-shuffled)
    order; windowing, in-window descending-edge stable sort, overflow
    shrink (n -> int(n*0.8)) and row carry replicate
    data/loader.py::_iter_pack's serial path bit-for-bit
    (tests/test_native.py asserts parity).  Returns the list of
    PackedGraphBatch — each a zero-copy view into one stacked allocation.

    The inputs cross the ABI as PER-GRAPH POINTER TABLES (no epoch-sized
    feature concatenation on the host: numpy concatenate of thousands of
    small arrays dominated the first draft of this call); C++ memcpys
    each graph's featurizer-cache buffers straight into the packed
    output, fusing the optional MACE block per node row on the way.

    Motivation (BASELINE.md "Host input pipeline"): at bs-64 windows the
    per-call marshal overhead bounds the per-window packer at
    ~0.5 Medge/s on a 2-vCPU host — first-epoch wall time on the real
    T1x run; the mega-call removes it."""
    from ..data.batch import PackedGraphBatch

    lib = _load()
    n_rows = len(graphs)
    e_feat = graphs[0].edge_feats.shape[1]
    base_dim = graphs[0].node_feats.shape[1]
    keep: list = []   # pointer-table buffers, alive across the call
    nf_ptrs = _ptr_table([g.node_feats for g in graphs], np.float32, keep)
    ef_ptrs = _ptr_table([g.edge_feats for g in graphs], np.float32, keep)
    s_ptrs = _ptr_table([g.senders for g in graphs], np.int32, keep)
    r_ptrs = _ptr_table([g.receivers for g in graphs], np.int32, keep)
    if extra_node_feats is not None:
        extra_dim = np.asarray(extra_node_feats[0]).shape[1]
        x_ptrs = _ptr_table(list(extra_node_feats), np.float32, keep)
    else:
        extra_dim = 0
        x_ptrs = np.zeros(max(1, n_rows), np.uint64)
    n_feat = base_dim + extra_dim
    node_counts = np.asarray([g.num_nodes for g in graphs], np.int32)
    edge_counts = np.asarray([g.num_edges for g in graphs], np.int32)
    labels_in = np.asarray(labels, np.float32)
    rows_in = (np.arange(n_rows, dtype=np.int32) if row_ids is None
               else np.asarray(list(row_ids), np.int32))

    ET, NT, BT = spec.total_edges, spec.total_nodes, spec.total_graphs
    # window-count estimate: the graph-count bound (no shrinking) AND the
    # edge/node-capacity bounds at 90% fill (overflow shrink is the norm
    # when a bs window holds more edges than p*te slots — under-estimating
    # costs a full grow-and-retry pass)
    total_e = int(edge_counts.sum())
    total_n = int(node_counts.sum())
    W = max(int(np.ceil(n_rows / batch_size)),
            int(np.ceil(total_e / max(1, 0.9 * ET))),
            int(np.ceil(total_n / max(1, 0.9 * NT)))) + 4
    while True:
        out = PackedGraphBatch(
            node_x=np.empty((W, NT, n_feat), np.float32),
            edge_attr=np.empty((W, ET, e_feat), np.float32),
            senders=np.empty((W, ET), np.int32),
            receivers=np.empty((W, ET), np.int32),
            rev=np.empty((W, ET), np.int32),
            edge_nbr=np.empty((W, ET, spec.d), np.int32),
            edge_nbr_rev=np.empty((W, ET, spec.d), np.int32),
            node_inc=np.empty((W, NT, spec.d), np.int32),
            node_out=np.empty((W, NT, spec.d), np.int32),
            graph_of_node=np.empty((W, NT), np.int32),
            graph_nodes=np.empty((W, BT, spec.dn), np.int32),
            labels=np.empty((W, BT), np.float32),
            graph_mask=np.empty((W, BT), np.float32),
            row_ids=np.empty((W, BT), np.int32),
        )
        n_windows = np.zeros(1, np.int32)
        rc = lib.cgr_pack_epoch(
            spec.p, spec.te, spec.tn, spec.tb, spec.d, spec.dn,
            n_rows, node_counts, edge_counts,
            nf_ptrs, base_dim, x_ptrs, extra_dim, ef_ptrs, e_feat,
            s_ptrs, r_ptrs, labels_in, rows_in,
            int(batch_size), int(bool(sort_within)), int(bool(drop_last)),
            W,
            out.node_x, out.edge_attr, out.senders, out.receivers,
            out.rev, out.edge_nbr, out.edge_nbr_rev, out.node_inc,
            out.node_out, out.graph_of_node, out.graph_nodes, out.labels,
            out.graph_mask, out.row_ids, n_windows)
        if rc == -2:
            # pathological carry produced more windows than estimated
            W *= 2
            continue
        if rc != 0:
            raise ValueError(lib.cgr_last_error().decode())
        break
    nw = int(n_windows[0])
    cast = np.dtype(spec.feat_dtype) != np.float32

    def window(w: int) -> PackedGraphBatch:
        b = PackedGraphBatch(*[getattr(out, f)[w]
                               for f in PackedGraphBatch._fields])
        if cast:
            b = b._replace(node_x=b.node_x.astype(spec.feat_dtype),
                           edge_attr=b.edge_attr.astype(spec.feat_dtype))
        return b

    return [window(w) for w in range(nw)]
