"""Whole-model-per-pack Pallas kernels: the entire CGR-MPNN in two kernels.

The packer guarantees each pack is a self-contained set of graphs, so the
*complete* network — edge_init, the depth-L D-MPNN stack, the edge->node
readout, sum-pooling and the FFN head (GNN.py:76-110) — can run per pack
without ever writing an activation to HBM:

  forward  (per pack): read x, e, index tiles; compute through to the
                       per-graph predictions; write [TB] predictions.
  backward (per pack): read the same inputs + dpred [TB]; REPLAY the whole
                       forward in VMEM; walk it backwards accumulating every
                       parameter gradient across packs. No activation
                       cotangent leaves the chip: the graph inputs need no
                       gradients, so the kernel's only outputs are dW/db.

Per-step HBM traffic collapses to the raw inputs (read twice) plus the
parameter-gradient accumulators — the step becomes MXU-bound.  Weights stay
resident in VMEM across the grid (constant index maps).

Activation- and aggregation-general (relu/silu/gelu x add/mean — the whole
reference config space); capture mode uses per-layer kernels.
Loss/optimizer remain outside (tiny).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fused import (_build_mt, _hash_bits, k_act, k_dact,
                           k_dropout_mask, mean_colscale)

__all__ = ["ModelKernelSpec", "fused_model", "fused_model_train"]


@dataclass(frozen=True)
class ModelKernelSpec:
    p: int
    d_nbr: int                  # msg/inc neighbor rows
    dn_pool: int                # pooling neighbor rows (nodes per graph)
    depth: int
    dropout_ps: tuple[float, ...] = ()
    train: bool = False
    learnable_skip: bool = False
    mat_dtype: object = jnp.bfloat16
    interpret: bool = False
    act: str = "relu"           # relu | silu | gelu (exact/erf)
    aggr: str = "add"           # add | mean (DMPNNConv aggr, GNN.py:120):
                                # mean scales the msg/inc one-hot columns by
                                # 1/in-degree in-kernel (pallas_fused.
                                # mean_colscale — the colsum IS the degree)
    pooling: str = "add"        # add | mean (GNN.py:23 pooling_fn): mean
                                # applies the same column scale to the pool
                                # one-hot (colsum = the graph's node count)
    # sub-packs fused per grid step: the one-hot matrices are block-diagonal
    # per pack, so q small packs (e.g. te=128) shrink the message matmuls to
    # q x [te,te] while every dense matmul still runs on the concatenated
    # [q*te, H] tile at full MXU rate.  p % q == 0.
    q: int = 1

    def __post_init__(self):
        if self.p % self.q:
            raise ValueError(
                f"pack count p={self.p} not divisible by sub-packs "
                f"q={self.q}")

    def keep(self, l):
        return 1.0 - self.dropout_ps[l]

    def use_dropout(self, l):
        return self.train and self.dropout_ps[l] > 0.0


def _onehot(il, base, c_tile, d_nbr, dtype, signed: bool = False,
            mean: bool = False):
    """One-hot matrix [C, R] from transposed index row *values* ``il``
    ([D, R], global ids).  With ``signed``, row d_nbr is the rev row and
    subtracts (the D-MPNN message matrix, cf. pallas_fused._build_mt).
    With ``mean``, the positive part is scaled per column by 1/in-degree
    (aggr='mean'; the rev row stays unscaled — GNN.py:141 subtracts the
    raw reverse message)."""
    ilb = il - base
    r_tile = il.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (c_tile, r_tile), 0)
    g = jnp.zeros((c_tile, r_tile), dtype)
    for d in range(d_nbr):
        g = g + (rows == ilb[d:d + 1, :]).astype(dtype)
    if mean:
        g = mean_colscale(g, dtype)
    if signed:
        g = g - (rows == ilb[d_nbr:d_nbr + 1, :]).astype(dtype)
    return g


def _dot0(a, b, md):
    """contract dim0 of both: [C,R]x[C,F] -> [R,F]."""
    return jax.lax.dot_general(a, b.astype(md),
                               dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm(a, b, md):
    return jax.lax.dot_general(a.astype(md), b.astype(md),
                               dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mmT(a, b, md):
    """a @ b^T."""
    return jax.lax.dot_general(a.astype(md), b.astype(md),
                               dimension_numbers=(((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _outerT(a, b, md):
    """a^T @ b: [R,F]x[R,H] -> [F,H]."""
    return jax.lax.dot_general(a.astype(md), b.astype(md),
                               dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


class _BlockDiag:
    """q per-sub-pack one-hot matrices used as one block-diagonal operator.

    The packer's pack-locality invariant makes every one-hot matrix
    block-diagonal across sub-packs, so contributions never cross blocks:
    contractions run per sub and concatenate — q x [te,te] message matmuls
    instead of one [q*te, q*te], while the dense matmuls that consume the
    result still see full [q*te, H] tiles.
    """

    def __init__(self, blocks, rows_in, rows_out):
        self.blocks = blocks          # q matrices [rows_in, rows_out]
        self.rows_in = rows_in
        self.rows_out = rows_out

    def dot0(self, v, md):
        """contract dim0: blockdiag[C,R]^T-style x v[C,F] -> [R,F]."""
        outs = [_dot0(b, v[j * self.rows_in:(j + 1) * self.rows_in], md)
                for j, b in enumerate(self.blocks)]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    def mm(self, v, md):
        """blockdiag[C,R] @ v[R,F] -> [C,F] (the adjoint of dot0)."""
        outs = [_mm(b, v[j * self.rows_out:(j + 1) * self.rows_out], md)
                for j, b in enumerate(self.blocks)]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def _build_ops(spec, p, idx_send, idx_msg, idx_inc, idx_pool, tn, te, md):
    """One-hot operators for the q sub-packs of grid step ``p``."""
    q = spec.q
    i_send, i_msg = idx_send[:], idx_msg[:]
    i_inc, i_pool = idx_inc[:], idx_pool[:]
    dps, dpm = i_send.shape[0] // q, i_msg.shape[0] // q
    dpi, dnp = i_inc.shape[0] // q, i_pool.shape[0] // q
    mean = spec.aggr == "mean"
    mean_pool = spec.pooling == "mean"
    sends, mts, incs, pools = [], [], [], []
    for j in range(q):
        nb, eb = (p * q + j) * tn, (p * q + j) * te
        sends.append(_onehot(i_send[j * dps:(j + 1) * dps], nb, tn, 1, md))
        mts.append(_onehot(i_msg[j * dpm:(j + 1) * dpm], eb, te,
                           spec.d_nbr, md, signed=True, mean=mean))
        incs.append(_onehot(i_inc[j * dpi:(j + 1) * dpi], eb, te,
                            spec.d_nbr, md, mean=mean))
        pools.append(_onehot(i_pool[j * dnp:(j + 1) * dnp], nb, tn,
                             spec.dn_pool, md, mean=mean_pool))
    return (_BlockDiag(sends, tn, te), _BlockDiag(mts, te, te),
            _BlockDiag(incs, te, tn),
            _BlockDiag(pools, tn, idx_pool.shape[1]))


def _replay_forward(spec, p, refs):
    """Common forward computation in VMEM; returns all needed states."""
    (idx_send, idx_msg, idx_inc, idx_pool, x_ref, e_ref, wx, we, be, wc, bc,
     skips, ws, wxn, ben, wffn, bffn, seeds) = refs
    md = spec.mat_dtype
    q = spec.q
    tn = x_ref.shape[0] // q      # nodes per sub-pack
    te = e_ref.shape[0] // q      # edges per sub-pack

    g_send, mt, g_inc, g_pool = _build_ops(
        spec, p, idx_send, idx_msg, idx_inc, idx_pool, tn, te, md)

    x_src = g_send.dot0(x_ref[:], md)                       # [QTE, F]
    pre0 = _mm(x_src, wx[:], md) + _mm(e_ref[:], we[:], md) \
        + be[:].astype(jnp.float32)
    h0 = k_act(spec.act, pre0)

    states = [h0]
    ts = []          # per-layer messages, kept for the backward wgrad
    h = h0
    for l in range(spec.depth):
        t = mt.dot0(h, md)
        # kept in mat_dtype: the backward wgrad consumes t cast to md anyway
        ts.append(t.astype(md))
        pre = _mm(t, wc[l], md) + bc[l:l + 1, :].astype(jnp.float32) \
            + skips[0, l] * h0
        out = k_act(spec.act, pre)
        if spec.use_dropout(l):
            bits = _hash_bits(out.shape, seeds[0, l], p)
            thr = jnp.uint32(min(int(spec.dropout_ps[l] * 2**32),
                                 2**32 - 1))
            out = jnp.where(bits >= thr, out * (1.0 / spec.keep(l)), 0.0)
        states.append(out)
        h = out

    s = g_inc.dot0(h, md)                                   # [QTN, H]
    pre_n = _mm(s, ws[:], md) + _mm(x_ref[:], wxn[:], md) \
        + ben[:].astype(jnp.float32)
    hn = k_act(spec.act, pre_n)                             # [QTN, H]

    pooled = g_pool.dot0(hn, md)                            # [QTB, H]
    preds = _mm(pooled, wffn[:], md) + bffn[:].astype(jnp.float32)  # [QTB,1]
    return (g_send, x_src, mt, states, ts, g_inc, s, hn, g_pool, pooled,
            preds)


def _fwd_kernel(*refs, spec: ModelKernelSpec):
    p = pl.program_id(0)
    ins, out_ref = refs[:-1], refs[-1]
    (*_, preds) = _replay_forward(spec, p, ins)
    out_ref[:] = preds.astype(out_ref.dtype)


def _bwd_kernel(*refs, spec: ModelKernelSpec, with_loss: bool = False):
    """Backward (replay + grads). With ``with_loss``, the cotangent is
    derived in-kernel from labels/mask (dpred = 2*mask*(pred-y)) and the
    masked SSE partial is accumulated — a complete training step's compute
    in ONE kernel, no separate forward pass."""
    p = pl.program_id(0)
    ins = refs[:18]
    if with_loss:
        labels_ref, mask_ref = refs[18], refs[19]
        (loss_ref, dwx_ref, dwe_ref, dbe_ref, dwc_ref, dbc_ref, dskip_ref,
         dws_ref, dwxn_ref, dben_ref, dwffn_ref, dbffn_ref) = refs[20:]
    else:
        dpred_ref = refs[18]
        (dwx_ref, dwe_ref, dbe_ref, dwc_ref, dbc_ref, dskip_ref, dws_ref,
         dwxn_ref, dben_ref, dwffn_ref, dbffn_ref) = refs[19:]
    (idx_send, idx_msg, idx_inc, idx_pool, x_ref, e_ref, wx, we, be, wc, bc,
     skips, ws, wxn, ben, wffn, bffn, seeds) = ins
    md = spec.mat_dtype

    (g_send, x_src, mt, states, ts, g_inc, s, hn, g_pool, pooled, preds) = \
        _replay_forward(spec, p, ins)

    @pl.when(p == 0)
    def _():
        for r in (dwx_ref, dwe_ref, dbe_ref, dwc_ref, dbc_ref, dskip_ref,
                  dws_ref, dwxn_ref, dben_ref, dwffn_ref, dbffn_ref):
            r[:] = jnp.zeros_like(r)
        if with_loss:
            loss_ref[:] = jnp.zeros_like(loss_ref)

    if with_loss:
        err = (preds - labels_ref[:].astype(jnp.float32)) \
            * mask_ref[:].astype(jnp.float32)
        loss_ref[:] += jnp.sum(err * err).reshape(1, 1)
        dpred = 2.0 * err                                   # [TB, 1]
    else:
        dpred = dpred_ref[:].astype(jnp.float32)            # [TB, 1]
    # ffn head
    dwffn_ref[:] += _outerT(pooled, dpred, md)
    dbffn_ref[:] += jnp.sum(dpred, axis=0, keepdims=True)
    dpooled = _mmT(dpred, wffn[:], md)                      # [QTB, H]
    # pooling
    dhn = g_pool.mm(dpooled, md)                            # [QTN, H]
    # readout (non-ReLU: pre_n recomputed from the saved s — storing the
    # pre-activations instead costs ~4 MB of scoped VMEM and OOMs at q=4)
    if spec.act == "relu":
        dpre_n = jnp.where(hn > 0.0, dhn, 0.0)
    else:
        pre_n = _mm(s.astype(md), ws[:], md) \
            + _mm(x_ref[:], wxn[:], md) + ben[:].astype(jnp.float32)
        dpre_n = dhn * k_dact(spec.act, pre_n)
    dws_ref[:] += _outerT(s, dpre_n, md)
    dwxn_ref[:] += _outerT(x_ref[:], dpre_n, md)
    dben_ref[:] += jnp.sum(dpre_n, axis=0, keepdims=True)
    ds = _mmT(dpre_n, ws[:], md)                            # [QTN, H]
    g_h = g_inc.mm(ds, md)                                  # [QTE, H]
    # conv stack (reverse replay)
    h0 = states[0]
    dh0 = jnp.zeros_like(g_h)
    g_cur = g_h
    for l in reversed(range(spec.depth)):
        out_l = states[l + 1]
        scale = (1.0 / spec.keep(l)) if spec.use_dropout(l) else 1.0
        if spec.act == "relu":
            # ReLU+dropout fold: out>0 iff kept & pre>0
            dpre = jnp.where(out_l > 0.0, g_cur * scale, 0.0)
        else:
            gg = g_cur
            if spec.use_dropout(l):
                gg = gg * scale * k_dropout_mask(gg.shape, seeds[0, l], p,
                                                 spec.keep(l))
            pre_l = _mm(ts[l], wc[l], md) \
                + bc[l:l + 1, :].astype(jnp.float32) + skips[0, l] * h0
            dpre = gg * k_dact(spec.act, pre_l)
        # t saved from the forward replay (one fewer [TE,TE]x[TE,H] matmul
        # per layer than recomputing it here)
        dwc_ref[l] += _outerT(ts[l], dpre, md)
        dbc_ref[l:l + 1, :] += jnp.sum(dpre, axis=0, keepdims=True)
        dskip_ref[0:1, l:l + 1] += jnp.sum(dpre * h0).reshape(1, 1)
        dh0 = dh0 + skips[0, l] * dpre
        dt = _mmT(dpre, wc[l], md)
        g_cur = mt.mm(dt, md)
    dh0 = dh0 + g_cur
    # edge_init
    if spec.act == "relu":
        dpre0 = jnp.where(h0 > 0.0, dh0, 0.0)
    else:
        pre0 = _mm(x_src.astype(md), wx[:], md) \
            + _mm(e_ref[:], we[:], md) + be[:].astype(jnp.float32)
        dpre0 = dh0 * k_dact(spec.act, pre0)
    dwx_ref[:] += _outerT(x_src, dpre0, md)
    dwe_ref[:] += _outerT(e_ref[:], dpre0, md)
    dbe_ref[:] += jnp.sum(dpre0, axis=0, keepdims=True)


def _in_specs(spec, d_pad_msg, d_pad_send, d_pad_inc, dn_pad, te, tn, tb,
              F, Fe, H, L):
    vm = pltpu.VMEM
    q = spec.q
    fixed = lambda *shape: pl.BlockSpec(shape, (lambda i: (0,) * len(shape)),
                                        memory_space=vm)
    # per-grid-step blocks cover q consecutive sub-packs
    per = lambda shape: pl.BlockSpec((q * shape[0],) + shape[1:],
                                     lambda i: (i,) + (0,) *
                                     (len(shape) - 1), memory_space=vm)
    smem = lambda *shape: pl.BlockSpec(shape, (lambda i: (0,) * len(shape)),
                                       memory_space=pltpu.SMEM)
    return [
        per((d_pad_send, te)),      # idx_send
        per((d_pad_msg, te)),       # idx_msg
        per((d_pad_inc, tn)),       # idx_inc
        per((dn_pad, tb)),          # idx_pool
        per((tn, F)),               # x
        per((te, Fe)),              # e
        fixed(F, H), fixed(Fe, H), fixed(1, H),        # wx, we, be
        fixed(L, H, H), fixed(L, H),                   # wc, bc
        smem(1, L),                                    # skips
        fixed(H, H), fixed(F, H), fixed(1, H),         # ws, wxn, ben
        fixed(H, 1), fixed(1, 1),                      # wffn, bffn
        smem(1, L),                                    # seeds
    ]


def _prep_args(spec, x, e, idxs, params_flat):
    (wx, we, be, wc, bc, skips, ws, wxn, ben, wffn, bffn, seeds) = params_flat
    L = wc.shape[0]
    H = wc.shape[2]
    return (idxs[0], idxs[1], idxs[2], idxs[3], x, e, wx, we,
            be.reshape(1, H), wc, bc, skips.reshape(1, L), ws, wxn,
            ben.reshape(1, H), wffn, bffn.reshape(1, 1),
            seeds.reshape(1, L).astype(jnp.int32))


def _dims(x, e, idxs, wc, p):
    tn = x.shape[0] // p
    te = e.shape[0] // p
    d_pad_send = idxs[0].shape[0] // p
    d_pad_msg = idxs[1].shape[0] // p
    d_pad_inc = idxs[2].shape[0] // p
    dn_pad = idxs[3].shape[0] // p
    tb = idxs[3].shape[1]
    return tn, te, tb, d_pad_send, d_pad_msg, d_pad_inc, dn_pad


def _fwd_call(spec, x, e, idxs, params_flat):
    args = _prep_args(spec, x, e, idxs, params_flat)
    wc = params_flat[3]
    L, _, H = wc.shape
    F, Fe = x.shape[1], e.shape[1]
    tn, te, tb, dps, dpm, dpi, dnp_ = _dims(x, e, idxs, wc, spec.p)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, spec=spec),
        grid=(spec.p // spec.q,),
        in_specs=_in_specs(spec, dpm, dps, dpi, dnp_, te, tn, tb, F, Fe, H, L),
        out_specs=pl.BlockSpec((spec.q * tb, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((spec.p * tb, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * spec.p * te * spec.depth * (te + H) * H,
            bytes_accessed=spec.p * (tn * F + te * Fe) * 4,
            transcendentals=0),
        interpret=spec.interpret,
    )(*args)


def _bwd_call(spec, x, e, idxs, params_flat, dpred):
    args = _prep_args(spec, x, e, idxs, params_flat)
    wc = params_flat[3]
    L, _, H = wc.shape
    F, Fe = x.shape[1], e.shape[1]
    tn, te, tb, dps, dpm, dpi, dnp_ = _dims(x, e, idxs, wc, spec.p)
    vm = pltpu.VMEM
    fixed = lambda *shape: pl.BlockSpec(shape, (lambda i: (0,) * len(shape)),
                                        memory_space=vm)
    out_shapes = (
        jax.ShapeDtypeStruct((F, H), jnp.float32),    # dwx
        jax.ShapeDtypeStruct((Fe, H), jnp.float32),   # dwe
        jax.ShapeDtypeStruct((1, H), jnp.float32),    # dbe
        jax.ShapeDtypeStruct((L, H, H), jnp.float32), # dwc
        jax.ShapeDtypeStruct((L, H), jnp.float32),    # dbc
        jax.ShapeDtypeStruct((1, L), jnp.float32),    # dskips
        jax.ShapeDtypeStruct((H, H), jnp.float32),    # dws
        jax.ShapeDtypeStruct((F, H), jnp.float32),    # dwxn
        jax.ShapeDtypeStruct((1, H), jnp.float32),    # dben
        jax.ShapeDtypeStruct((H, 1), jnp.float32),    # dwffn
        jax.ShapeDtypeStruct((1, 1), jnp.float32),    # dbffn
    )
    out_specs = (fixed(F, H), fixed(Fe, H), fixed(1, H), fixed(L, H, H),
                 fixed(L, H), fixed(1, L), fixed(H, H), fixed(F, H),
                 fixed(1, H), fixed(H, 1), fixed(1, 1))
    in_specs = _in_specs(spec, dpm, dps, dpi, dnp_, te, tn, tb, F, Fe, H, L)
    in_specs.append(pl.BlockSpec((spec.q * tb, 1), lambda i: (i, 0),
                                 memory_space=vm))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, spec=spec),
        grid=(spec.p // spec.q,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=6 * spec.p * te * spec.depth * (te + H) * H,
            bytes_accessed=spec.p * (tn * F + te * Fe) * 4,
            transcendentals=0),
        interpret=spec.interpret,
    )(*args, dpred)


def fused_model_train(spec: ModelKernelSpec, x, e, idxs, params_flat,
                      labels, mask):
    """One-kernel training compute: returns (sse, grads_flat) where
    grads_flat = (dwx, dwe, dbe, dwc, dbc, dskips, dws, dwxn, dben, dwffn,
    dbffn).  No autodiff involved — the kernel replays the forward and
    derives the loss cotangent from labels/mask internally."""
    args = _prep_args(spec, x, e, idxs, params_flat)
    wc = params_flat[3]
    L, _, H = wc.shape
    F, Fe = x.shape[1], e.shape[1]
    tn, te, tb, dps, dpm, dpi, dnp_ = _dims(x, e, idxs, wc, spec.p)
    vm = pltpu.VMEM
    fixed = lambda *shape: pl.BlockSpec(shape, (lambda i: (0,) * len(shape)),
                                        memory_space=vm)
    out_shapes = (
        jax.ShapeDtypeStruct((1, 1), jnp.float32),    # sse
        jax.ShapeDtypeStruct((F, H), jnp.float32),    # dwx
        jax.ShapeDtypeStruct((Fe, H), jnp.float32),   # dwe
        jax.ShapeDtypeStruct((1, H), jnp.float32),    # dbe
        jax.ShapeDtypeStruct((L, H, H), jnp.float32), # dwc
        jax.ShapeDtypeStruct((L, H), jnp.float32),    # dbc
        jax.ShapeDtypeStruct((1, L), jnp.float32),    # dskips
        jax.ShapeDtypeStruct((H, H), jnp.float32),    # dws
        jax.ShapeDtypeStruct((F, H), jnp.float32),    # dwxn
        jax.ShapeDtypeStruct((1, H), jnp.float32),    # dben
        jax.ShapeDtypeStruct((H, 1), jnp.float32),    # dwffn
        jax.ShapeDtypeStruct((1, 1), jnp.float32),    # dbffn
    )
    out_specs = (fixed(1, 1), fixed(F, H), fixed(Fe, H), fixed(1, H),
                 fixed(L, H, H), fixed(L, H), fixed(1, L), fixed(H, H),
                 fixed(F, H), fixed(1, H), fixed(H, 1), fixed(1, 1))
    in_specs = _in_specs(spec, dpm, dps, dpi, dnp_, te, tn, tb, F, Fe, H, L)
    per_tb = pl.BlockSpec((spec.q * tb, 1), lambda i: (i, 0),
                          memory_space=vm)
    in_specs += [per_tb, per_tb]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, spec=spec, with_loss=True),
        grid=(spec.p // spec.q,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=6 * spec.p * te * spec.depth * (te + H) * H,
            bytes_accessed=spec.p * (tn * F + te * Fe) * 4,
            transcendentals=0),
        interpret=spec.interpret,
    )(*args, labels[:, None].astype(jnp.float32),
      mask[:, None].astype(jnp.float32))
    return outs[0].reshape(()), outs[1:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_model(spec: ModelKernelSpec, x, e, idx_send, idx_msg, idx_inc,
                idx_pool, wx, we, be, wc, bc, skips, ws, wxn, ben, wffn,
                bffn, seeds):
    """Whole-model forward -> per-graph predictions [p*TB]."""
    idxs = (idx_send, idx_msg, idx_inc, idx_pool)
    pf = (wx, we, be, wc, bc, skips, ws, wxn, ben, wffn, bffn, seeds)
    return _fwd_call(spec, x, e, idxs, pf)[:, 0]


def _fm_fwd(spec, x, e, idx_send, idx_msg, idx_inc, idx_pool, wx, we, be,
            wc, bc, skips, ws, wxn, ben, wffn, bffn, seeds):
    idxs = (idx_send, idx_msg, idx_inc, idx_pool)
    pf = (wx, we, be, wc, bc, skips, ws, wxn, ben, wffn, bffn, seeds)
    out = _fwd_call(spec, x, e, idxs, pf)[:, 0]
    return out, (x, e, idxs, pf)


def _fm_bwd(spec, res, g):
    x, e, idxs, pf = res
    (wx, we, be, wc, bc, skips, ws, wxn, ben, wffn, bffn, seeds) = pf
    grads = _bwd_call(spec, x, e, idxs, pf, g[:, None].astype(jnp.float32))
    (dwx, dwe, dbe, dwc, dbc, dskips, dws, dwxn, dben, dwffn, dbffn) = grads
    return (None, None, None, None, None, None,
            dwx.astype(wx.dtype), dwe.astype(we.dtype),
            dbe.reshape(be.shape).astype(be.dtype),
            dwc.astype(wc.dtype), dbc.astype(bc.dtype),
            dskips.reshape(skips.shape).astype(skips.dtype),
            dws.astype(ws.dtype), dwxn.astype(wxn.dtype),
            dben.reshape(ben.shape).astype(ben.dtype),
            dwffn.astype(wffn.dtype),
            dbffn.reshape(bffn.shape).astype(bffn.dtype), None)


fused_model.defvjp(_fm_fwd, _fm_bwd)
