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

ReLU + aggr='add' only (the reference's defaults); other configs use the
3-kernel path in models/cgr_mpnn.py, and capture mode uses per-layer
kernels.  Loss/optimizer remain outside (tiny).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fused import _build_mt, _hash_bits

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

    def keep(self, l):
        return 1.0 - self.dropout_ps[l]

    def use_dropout(self, l):
        return self.train and self.dropout_ps[l] > 0.0


def _build_g(idx_ref, base, c_tile, d_nbr, dtype):
    """Unsigned one-hot gather matrix [C, R] from transposed index rows."""
    il = idx_ref[:] - base
    r_tile = idx_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (c_tile, r_tile), 0)
    g = jnp.zeros((c_tile, r_tile), dtype)
    for d in range(d_nbr):
        g = g + (rows == il[d:d + 1, :]).astype(dtype)
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


def _replay_forward(spec, p, refs):
    """Common forward computation in VMEM; returns all needed states."""
    (idx_send, idx_msg, idx_inc, idx_pool, x_ref, e_ref, wx, we, be, wc, bc,
     skips, ws, wxn, ben, wffn, bffn, seeds) = refs
    md = spec.mat_dtype
    tn = x_ref.shape[0]
    te = e_ref.shape[0]
    tb = idx_pool.shape[1]

    g_send = _build_g(idx_send, p * tn, tn, 1, md)          # [TN, TE]
    x_src = _dot0(g_send, x_ref[:], md)                     # [TE, F]
    pre0 = _mm(x_src, wx[:], md) + _mm(e_ref[:], we[:], md) \
        + be[:].astype(jnp.float32)
    h0 = jnp.maximum(pre0, 0.0)

    mt = _build_mt(idx_msg, p * te, te, spec.d_nbr, md)     # [TE, TE]
    states = [h0]
    h = h0
    for l in range(spec.depth):
        t = _dot0(mt, h, md)
        pre = _mm(t, wc[l], md) + bc[l:l + 1, :].astype(jnp.float32) \
            + skips[0, l] * h0
        out = jnp.maximum(pre, 0.0)
        if spec.use_dropout(l):
            bits = _hash_bits(out.shape, seeds[0, l], p)
            thr = jnp.uint32(min(int(spec.dropout_ps[l] * 2**32),
                                 2**32 - 1))
            out = jnp.where(bits >= thr, out * (1.0 / spec.keep(l)), 0.0)
        states.append(out)
        h = out

    g_inc = _build_g(idx_inc, p * te, te, spec.d_nbr, md)   # [TE, TN]
    s = _dot0(g_inc, h, md)                                 # [TN, H]
    pre_n = _mm(s, ws[:], md) + _mm(x_ref[:], wxn[:], md) \
        + ben[:].astype(jnp.float32)
    hn = jnp.maximum(pre_n, 0.0)                            # [TN, H]

    g_pool = _build_g(idx_pool, p * tn, tn, spec.dn_pool, md)  # [TN, TB]
    pooled = _dot0(g_pool, hn, md)                          # [TB, H]
    preds = _mm(pooled, wffn[:], md) + bffn[:].astype(jnp.float32)  # [TB, 1]
    return (g_send, x_src, mt, states, g_inc, s, hn, g_pool, pooled, preds)


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

    (g_send, x_src, mt, states, g_inc, s, hn, g_pool, pooled, preds) = \
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
    dpooled = _mmT(dpred, wffn[:], md)                      # [TB, H]
    # pooling
    dhn = _mm(g_pool.astype(md), dpooled, md)               # [TN, H]
    # readout
    dpre_n = jnp.where(hn > 0.0, dhn, 0.0)
    dws_ref[:] += _outerT(s, dpre_n, md)
    dwxn_ref[:] += _outerT(x_ref[:], dpre_n, md)
    dben_ref[:] += jnp.sum(dpre_n, axis=0, keepdims=True)
    ds = _mmT(dpre_n, ws[:], md)                            # [TN, H]
    g_h = _mm(g_inc.astype(md), ds, md)                     # [TE, H]
    # conv stack (reverse replay)
    h0 = states[0]
    dh0 = jnp.zeros_like(g_h)
    g_cur = g_h
    for l in reversed(range(spec.depth)):
        out_l = states[l + 1]
        scale = (1.0 / spec.keep(l)) if spec.use_dropout(l) else 1.0
        dpre = jnp.where(out_l > 0.0, g_cur * scale, 0.0)
        t = _dot0(mt, states[l], md)
        dwc_ref[l] += _outerT(t, dpre, md)
        dbc_ref[l:l + 1, :] += jnp.sum(dpre, axis=0, keepdims=True)
        dskip_ref[0:1, l:l + 1] += jnp.sum(dpre * h0).reshape(1, 1)
        dh0 = dh0 + skips[0, l] * dpre
        dt = _mmT(dpre, wc[l], md)
        g_cur = _mm(mt.astype(md), dt, md)
    dh0 = dh0 + g_cur
    # edge_init
    dpre0 = jnp.where(h0 > 0.0, dh0, 0.0)
    dwx_ref[:] += _outerT(x_src, dpre0, md)
    dwe_ref[:] += _outerT(e_ref[:], dpre0, md)
    dbe_ref[:] += jnp.sum(dpre0, axis=0, keepdims=True)


def _in_specs(spec, d_pad_msg, d_pad_send, d_pad_inc, dn_pad, te, tn, tb,
              F, Fe, H, L):
    vm = pltpu.VMEM
    fixed = lambda *shape: pl.BlockSpec(shape, (lambda i: (0,) * len(shape)),
                                        memory_space=vm)
    per = lambda shape: pl.BlockSpec(shape, lambda i: (i,) + (0,) *
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
        grid=(spec.p,),
        in_specs=_in_specs(spec, dpm, dps, dpi, dnp_, te, tn, tb, F, Fe, H, L),
        out_specs=pl.BlockSpec((tb, 1), lambda i: (i, 0),
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
    in_specs.append(pl.BlockSpec((tb, 1), lambda i: (i, 0),
                                 memory_space=vm))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, spec=spec),
        grid=(spec.p,),
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
    per_tb = pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=vm)
    in_specs += [per_tb, per_tb]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, spec=spec, with_loss=True),
        grid=(spec.p,),
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
