"""Fused gather-linear Pallas kernel:  out = relu((G @ xa) @ Wa + xb @ Wb + b)

Covers the two remaining HBM-heavy stages around the conv stack
(GNN.py:52-55/84-87 edge_init and GNN.py:63-65/105-107 edge_to_node):

    stage        G (one-hot)              xa        xb    out rows
    edge_init    senders   [TN -> TE]     node_x    e     TE   (h0)
    readout      node_inc  [TE -> TN]     h_final   x     TN   (h_node)

The reference computes these as Linear([gathered ++ other]) — here the
concat is split into two matmuls and everything (gather matrix build, both
matmuls, bias, ReLU) runs in one VMEM pass per pack.  The backward reuses
the in-VMEM G for its transpose contraction (dxa = G @ (dpre @ Wa^T)) and
accumulates dWa/dWb/db across packs, so no reverse index arrays are needed.

Activation-general (spec.act) and aggregation-general: the readout
instance reuses the conv's aggregation (GNN.py:105), so spec.aggr='mean'
applies the 1/in-degree column scale to its incoming-sum one-hot.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fused import k_act, k_dact, mean_colscale

__all__ = ["GatherLinearSpec", "fused_gather_linear",
           "fused_gather_linear_r", "fused_gather_linear_pool"]


@dataclass(frozen=True)
class GatherLinearSpec:
    p: int
    d_nbr: int                  # neighbor rows in idx_t (no sign row)
    mat_dtype: object = jnp.bfloat16
    out_dtype: object = jnp.bfloat16
    interpret: bool = False
    gp: int = 0                 # pool groups per pack (fused_gather_linear_pool)
    act: str = "relu"           # relu | silu | gelu (exact/erf)
    aggr: str = "add"           # add | mean: the readout instance reuses the
                                # conv's aggregation (GNN.py:105), so its
                                # incoming-sum matrix gets the 1/deg column
                                # scale too; edge_init stays 'add' (a pure
                                # gather, each column has exactly one entry)

    @property
    def mean(self) -> bool:
        return self.aggr == "mean"


def _build_g(idx_ref, base, c_tile, d_nbr, dtype, mean: bool = False):
    il = idx_ref[:] - base
    r_tile = idx_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (c_tile, r_tile), 0)
    g = jnp.zeros((c_tile, r_tile), dtype)
    for d in range(d_nbr):
        g = g + (rows == il[d:d + 1, :]).astype(dtype)
    if mean:
        g = mean_colscale(g, dtype)
    return g


def _fwd_kernel(idx_ref, xa_ref, xb_ref, wa_ref, wb_ref, b_ref, out_ref,
                *, spec: GatherLinearSpec, ca: int):
    p = pl.program_id(0)
    md = spec.mat_dtype
    g = _build_g(idx_ref, p * ca, ca, spec.d_nbr, md, spec.mean)
    t1 = jax.lax.dot_general(g, xa_ref[:].astype(md),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    pre = jax.lax.dot_general(t1.astype(md), wa_ref[:].astype(md),
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    pre = pre + jax.lax.dot_general(
        xb_ref[:].astype(md), wb_ref[:].astype(md),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    pre = pre + b_ref[:].astype(jnp.float32)
    out_ref[:] = k_act(spec.act, pre).astype(out_ref.dtype)


def _dpre_general(spec, t1, xb_ref, wa_ref, wb_ref, b_ref, out_ref, g_ref):
    """dpre for any activation: ReLU folds from the stored out; other
    activations recompute pre from the (already-recomputed) t1."""
    if spec.act == "relu":
        return jnp.where(out_ref[:].astype(jnp.float32) > 0.0,
                         g_ref[:].astype(jnp.float32), 0.0)
    md = spec.mat_dtype
    pre = jax.lax.dot_general(t1.astype(md), wa_ref[:].astype(md),
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    pre = pre + jax.lax.dot_general(
        xb_ref[:].astype(md), wb_ref[:].astype(md),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    pre = pre + b_ref[:].astype(jnp.float32)
    return g_ref[:].astype(jnp.float32) * k_dact(spec.act, pre)


def _bwd_kernel(idx_ref, xa_ref, xb_ref, wa_ref, wb_ref, b_ref, out_ref,
                g_ref, dxa_ref, dxb_ref, dwa_ref, dwb_ref, db_ref,
                *, spec: GatherLinearSpec, ca: int):
    p = pl.program_id(0)
    md = spec.mat_dtype
    gmat = _build_g(idx_ref, p * ca, ca, spec.d_nbr, md, spec.mean)
    t1 = jax.lax.dot_general(gmat, xa_ref[:].astype(md),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dpre = _dpre_general(spec, t1, xb_ref, wa_ref, wb_ref, b_ref, out_ref,
                         g_ref)

    # dxa = G @ (dpre @ Wa^T)
    dt = jax.lax.dot_general(dpre.astype(md), wa_ref[:].astype(md),
                             dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dxa_ref[:] = jax.lax.dot_general(
        gmat, dt.astype(md), dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dxa_ref.dtype)
    # dxb = dpre @ Wb^T
    dxb_ref[:] = jax.lax.dot_general(
        dpre.astype(md), wb_ref[:].astype(md),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dxb_ref.dtype)

    dwa_p = jax.lax.dot_general(t1.astype(md), dpre.astype(md),
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dwb_p = jax.lax.dot_general(xb_ref[:].astype(md), dpre.astype(md),
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    db_p = jnp.sum(dpre, axis=0, keepdims=True)

    @pl.when(p == 0)
    def _():
        dwa_ref[:] = jnp.zeros_like(dwa_ref)
        dwb_ref[:] = jnp.zeros_like(dwb_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dwa_ref[:] += dwa_p
    dwb_ref[:] += dwb_p
    db_ref[:] += db_p


def _specs(spec, d_pad, r, ca, fa, fb, h):
    return [
        pl.BlockSpec((d_pad, r), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((ca, fa), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((r, fb), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((fa, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((fb, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]


def _fwd_call(spec, idx_t, xa, xb, wa, wb, b):
    PD, R = idx_t.shape
    d_pad = PD // spec.p
    CA, FA = xa.shape
    ca = CA // spec.p
    FB = xb.shape[1]
    H = wa.shape[1]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, spec=spec, ca=ca),
        grid=(spec.p,),
        in_specs=_specs(spec, d_pad, R, ca, FA, FB, H) + [
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((spec.p * R, H), spec.out_dtype),
        interpret=spec.interpret,
    )(idx_t, xa, xb, wa, wb, b.reshape(1, H))


def _bwd_call(spec, idx_t, xa, xb, wa, wb, b, out, g):
    PD, R = idx_t.shape
    d_pad = PD // spec.p
    CA, FA = xa.shape
    ca = CA // spec.p
    FB = xb.shape[1]
    H = wa.shape[1]
    per_r = lambda w_: pl.BlockSpec((R, w_), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
    fixed = lambda a_, b_: pl.BlockSpec((a_, b_), lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((CA, FA), spec.out_dtype),     # dxa
        jax.ShapeDtypeStruct((spec.p * R, FB), spec.out_dtype),  # dxb
        jax.ShapeDtypeStruct((FA, H), jnp.float32),         # dWa
        jax.ShapeDtypeStruct((FB, H), jnp.float32),         # dWb
        jax.ShapeDtypeStruct((1, H), jnp.float32),          # db
    )
    out_specs = (
        pl.BlockSpec((ca, FA), lambda i: (i, 0), memory_space=pltpu.VMEM),
        per_r(FB), fixed(FA, H), fixed(FB, H), fixed(1, H),
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, spec=spec, ca=ca),
        grid=(spec.p,),
        in_specs=_specs(spec, d_pad, R, ca, FA, FB, H) + [
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            per_r(H), per_r(H)],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=spec.interpret,
    )(idx_t, xa, xb, wa, wb, b.reshape(1, H), out, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_gather_linear(spec: GatherLinearSpec, xa, xb, idx_t, wa, wb, b):
    """relu((G @ xa) @ wa + xb @ wb + b) with G built from idx_t rows."""
    return _fwd_call(spec, idx_t, xa, xb, wa, wb, b)


def _fgl_fwd(spec, xa, xb, idx_t, wa, wb, b):
    out = _fwd_call(spec, idx_t, xa, xb, wa, wb, b)
    return out, (xa, xb, idx_t, wa, wb, b, out)


def _fgl_bwd(spec, res, g):
    xa, xb, idx_t, wa, wb, b, out = res
    dxa, dxb, dwa, dwb, db = _bwd_call(spec, idx_t, xa, xb, wa, wb, b, out,
                                       g)
    return (dxa.astype(xa.dtype), dxb.astype(xb.dtype), None,
            dwa.astype(wa.dtype), dwb.astype(wb.dtype),
            db.reshape(-1).astype(wa.dtype))


fused_gather_linear.defvjp(_fgl_fwd, _fgl_bwd)


# ---------------------------------------------------------------------------
# edge-partitioned variant: out = relu((G @ xa + xr) @ wa + xb @ wb + b)
# xr rows align with the out rows — the EP readout's boundary correction
# (received remote incoming-sum partials on owned slots, ep_pack.py)
# ---------------------------------------------------------------------------

def _fwd_kernel_r(idx_ref, xa_ref, xr_ref, xb_ref, wa_ref, wb_ref, b_ref,
                  out_ref, *, spec: GatherLinearSpec, ca: int):
    p = pl.program_id(0)
    md = spec.mat_dtype
    g = _build_g(idx_ref, p * ca, ca, spec.d_nbr, md, spec.mean)
    t1 = jax.lax.dot_general(g, xa_ref[:].astype(md),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    t1 = t1 + xr_ref[:].astype(jnp.float32)
    pre = jax.lax.dot_general(t1.astype(md), wa_ref[:].astype(md),
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    pre = pre + jax.lax.dot_general(
        xb_ref[:].astype(md), wb_ref[:].astype(md),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    pre = pre + b_ref[:].astype(jnp.float32)
    out_ref[:] = k_act(spec.act, pre).astype(out_ref.dtype)


def _bwd_kernel_r(idx_ref, xa_ref, xr_ref, xb_ref, wa_ref, wb_ref, b_ref,
                  out_ref, g_ref, dxa_ref, dxr_ref, dxb_ref, dwa_ref,
                  dwb_ref, db_ref, *, spec: GatherLinearSpec, ca: int):
    p = pl.program_id(0)
    md = spec.mat_dtype
    gmat = _build_g(idx_ref, p * ca, ca, spec.d_nbr, md, spec.mean)
    t1 = jax.lax.dot_general(gmat, xa_ref[:].astype(md),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    t1 = t1 + xr_ref[:].astype(jnp.float32)
    dpre = _dpre_general(spec, t1, xb_ref, wa_ref, wb_ref, b_ref, out_ref,
                         g_ref)

    dt = jax.lax.dot_general(dpre.astype(md), wa_ref[:].astype(md),
                             dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dxr_ref[:] = dt.astype(dxr_ref.dtype)
    dxa_ref[:] = jax.lax.dot_general(
        gmat, dt.astype(md), dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dxa_ref.dtype)
    dxb_ref[:] = jax.lax.dot_general(
        dpre.astype(md), wb_ref[:].astype(md),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dxb_ref.dtype)

    dwa_p = jax.lax.dot_general(t1.astype(md), dpre.astype(md),
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dwb_p = jax.lax.dot_general(xb_ref[:].astype(md), dpre.astype(md),
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    db_p = jnp.sum(dpre, axis=0, keepdims=True)

    @pl.when(p == 0)
    def _():
        dwa_ref[:] = jnp.zeros_like(dwa_ref)
        dwb_ref[:] = jnp.zeros_like(dwb_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dwa_ref[:] += dwa_p
    dwb_ref[:] += dwb_p
    db_ref[:] += db_p


def _fwd_call_r(spec, idx_t, xa, xr, xb, wa, wb, b):
    PD, R = idx_t.shape
    d_pad = PD // spec.p
    CA, FA = xa.shape
    ca = CA // spec.p
    FB = xb.shape[1]
    H = wa.shape[1]
    per_r = lambda w_: pl.BlockSpec((R, w_), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
    base = _specs(spec, d_pad, R, ca, FA, FB, H)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_r, spec=spec, ca=ca),
        grid=(spec.p,),
        in_specs=base[:2] + [per_r(H)] + base[2:] + [
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=per_r(H),
        out_shape=jax.ShapeDtypeStruct((spec.p * R, H), spec.out_dtype),
        interpret=spec.interpret,
    )(idx_t, xa, xr, xb, wa, wb, b.reshape(1, H))


def _bwd_call_r(spec, idx_t, xa, xr, xb, wa, wb, b, out, g):
    PD, R = idx_t.shape
    d_pad = PD // spec.p
    CA, FA = xa.shape
    ca = CA // spec.p
    FB = xb.shape[1]
    H = wa.shape[1]
    per_r = lambda w_: pl.BlockSpec((R, w_), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
    fixed = lambda a_, b_: pl.BlockSpec((a_, b_), lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((CA, FA), spec.out_dtype),          # dxa
        jax.ShapeDtypeStruct((spec.p * R, H), jnp.float32),      # dxr
        jax.ShapeDtypeStruct((spec.p * R, FB), spec.out_dtype),  # dxb
        jax.ShapeDtypeStruct((FA, H), jnp.float32),              # dWa
        jax.ShapeDtypeStruct((FB, H), jnp.float32),              # dWb
        jax.ShapeDtypeStruct((1, H), jnp.float32),               # db
    )
    out_specs = (
        pl.BlockSpec((ca, FA), lambda i: (i, 0), memory_space=pltpu.VMEM),
        per_r(H), per_r(FB), fixed(FA, H), fixed(FB, H), fixed(1, H),
    )
    base = _specs(spec, d_pad, R, ca, FA, FB, H)
    return pl.pallas_call(
        functools.partial(_bwd_kernel_r, spec=spec, ca=ca),
        grid=(spec.p,),
        in_specs=base[:2] + [per_r(H)] + base[2:] + [
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            per_r(H), per_r(H)],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=spec.interpret,
    )(idx_t, xa, xr, xb, wa, wb, b.reshape(1, H), out, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_gather_linear_r(spec: GatherLinearSpec, xa, xr, xb, idx_t, wa, wb,
                          b):
    """relu((G @ xa + xr) @ wa + xb @ wb + b); xr aligned with out rows."""
    return _fwd_call_r(spec, idx_t, xa, xr, xb, wa, wb, b)


def _fglr_fwd(spec, xa, xr, xb, idx_t, wa, wb, b):
    out = _fwd_call_r(spec, idx_t, xa, xr, xb, wa, wb, b)
    return out, (xa, xr, xb, idx_t, wa, wb, b, out)


def _fglr_bwd(spec, res, g):
    xa, xr, xb, idx_t, wa, wb, b, out = res
    dxa, dxr, dxb, dwa, dwb, db = _bwd_call_r(spec, idx_t, xa, xr, xb, wa,
                                              wb, b, out, g)
    return (dxa.astype(xa.dtype), dxr.astype(xr.dtype), dxb.astype(xb.dtype),
            None, dwa.astype(wa.dtype), dwb.astype(wb.dtype),
            db.reshape(-1).astype(wa.dtype))


fused_gather_linear_r.defvjp(_fglr_fwd, _fglr_bwd)


# ---------------------------------------------------------------------------
# readout + POOL in one kernel (edge-partitioned path):
#   hn   = relu((G @ xa + xr) @ wa + xb @ wb + b)          [R, H] per pack
#   pool = Gp @ hn                                          [GP, H] per pack
# Gp is the pack-local pool one-hot (node_group rows: pack*GP+group on owned
# slots, sentinel elsewhere) — graphs' fragment partials are combined across
# packs by a tiny [B, KG] ELL outside (parallel/ep_pack.py), replacing the
# [B, DN]-over-nodes XLA gather that dominated the EP step's glue time.
# ---------------------------------------------------------------------------

def _build_gp(ng_ref, base, gp, dtype):
    il = ng_ref[:] - base                        # [8, R]; row 0 = values
    r_tile = ng_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (gp, r_tile), 0)
    return (rows == il[0:1, :]).astype(dtype)


def _fwd_kernel_pool(idx_ref, ng_ref, xa_ref, xr_ref, xb_ref, wa_ref,
                     wb_ref, b_ref, out_ref, pool_ref,
                     *, spec: GatherLinearSpec, ca: int):
    p = pl.program_id(0)
    md = spec.mat_dtype
    g = _build_g(idx_ref, p * ca, ca, spec.d_nbr, md, spec.mean)
    t1 = jax.lax.dot_general(g, xa_ref[:].astype(md),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    t1 = t1 + xr_ref[:].astype(jnp.float32)
    pre = jax.lax.dot_general(t1.astype(md), wa_ref[:].astype(md),
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    pre = pre + jax.lax.dot_general(
        xb_ref[:].astype(md), wb_ref[:].astype(md),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    pre = pre + b_ref[:].astype(jnp.float32)
    hn = k_act(spec.act, pre)
    out_ref[:] = hn.astype(out_ref.dtype)
    gpm = _build_gp(ng_ref, p * spec.gp, spec.gp, md)
    pool_ref[:] = jax.lax.dot_general(
        gpm, hn.astype(md), dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(pool_ref.dtype)


def _bwd_kernel_pool(idx_ref, ng_ref, xa_ref, xr_ref, xb_ref, wa_ref,
                     wb_ref, b_ref, out_ref, g_ref, gpool_ref,
                     dxa_ref, dxr_ref, dxb_ref, dwa_ref, dwb_ref, db_ref,
                     *, spec: GatherLinearSpec, ca: int):
    p = pl.program_id(0)
    md = spec.mat_dtype
    gpm = _build_gp(ng_ref, p * spec.gp, spec.gp, md)
    # dhn = g_hn + Gp^T @ g_pool
    dhn = g_ref[:].astype(jnp.float32) + jax.lax.dot_general(
        gpm, gpool_ref[:].astype(md),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    gmat = _build_g(idx_ref, p * ca, ca, spec.d_nbr, md, spec.mean)
    t1 = jax.lax.dot_general(gmat, xa_ref[:].astype(md),
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    t1 = t1 + xr_ref[:].astype(jnp.float32)
    if spec.act == "relu":
        dpre = jnp.where(out_ref[:].astype(jnp.float32) > 0.0, dhn, 0.0)
    else:
        pre = jax.lax.dot_general(t1.astype(md), wa_ref[:].astype(md),
                                  dimension_numbers=(((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        pre = pre + jax.lax.dot_general(
            xb_ref[:].astype(md), wb_ref[:].astype(md),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        pre = pre + b_ref[:].astype(jnp.float32)
        dpre = dhn * k_dact(spec.act, pre)

    dt = jax.lax.dot_general(dpre.astype(md), wa_ref[:].astype(md),
                             dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dxr_ref[:] = dt.astype(dxr_ref.dtype)
    dxa_ref[:] = jax.lax.dot_general(
        gmat, dt.astype(md), dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dxa_ref.dtype)
    dxb_ref[:] = jax.lax.dot_general(
        dpre.astype(md), wb_ref[:].astype(md),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dxb_ref.dtype)

    dwa_p = jax.lax.dot_general(t1.astype(md), dpre.astype(md),
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dwb_p = jax.lax.dot_general(xb_ref[:].astype(md), dpre.astype(md),
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    db_p = jnp.sum(dpre, axis=0, keepdims=True)

    @pl.when(p == 0)
    def _():
        dwa_ref[:] = jnp.zeros_like(dwa_ref)
        dwb_ref[:] = jnp.zeros_like(dwb_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dwa_ref[:] += dwa_p
    dwb_ref[:] += dwb_p
    db_ref[:] += db_p


def _fwd_call_pool(spec, idx_t, ng, xa, xr, xb, wa, wb, b):
    PD, R = idx_t.shape
    d_pad = PD // spec.p
    CA, FA = xa.shape
    ca = CA // spec.p
    FB = xb.shape[1]
    H = wa.shape[1]
    per_r = lambda w_: pl.BlockSpec((R, w_), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
    base = _specs(spec, d_pad, R, ca, FA, FB, H)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_pool, spec=spec, ca=ca),
        grid=(spec.p,),
        in_specs=[base[0],
                  pl.BlockSpec((8, R), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  base[1], per_r(H)] + base[2:] + [
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=(per_r(H),
                   pl.BlockSpec((spec.gp, H), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((spec.p * R, H), spec.out_dtype),
                   jax.ShapeDtypeStruct((spec.p * spec.gp, H), jnp.float32)),
        interpret=spec.interpret,
    )(idx_t, ng, xa, xr, xb, wa, wb, b.reshape(1, H))


def _bwd_call_pool(spec, idx_t, ng, xa, xr, xb, wa, wb, b, out, g, gpool):
    PD, R = idx_t.shape
    d_pad = PD // spec.p
    CA, FA = xa.shape
    ca = CA // spec.p
    FB = xb.shape[1]
    H = wa.shape[1]
    per_r = lambda w_: pl.BlockSpec((R, w_), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
    fixed = lambda a_, b_: pl.BlockSpec((a_, b_), lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((CA, FA), spec.out_dtype),          # dxa
        jax.ShapeDtypeStruct((spec.p * R, H), jnp.float32),      # dxr
        jax.ShapeDtypeStruct((spec.p * R, FB), spec.out_dtype),  # dxb
        jax.ShapeDtypeStruct((FA, H), jnp.float32),              # dWa
        jax.ShapeDtypeStruct((FB, H), jnp.float32),              # dWb
        jax.ShapeDtypeStruct((1, H), jnp.float32),               # db
    )
    out_specs = (
        pl.BlockSpec((ca, FA), lambda i: (i, 0), memory_space=pltpu.VMEM),
        per_r(H), per_r(FB), fixed(FA, H), fixed(FB, H), fixed(1, H),
    )
    base = _specs(spec, d_pad, R, ca, FA, FB, H)
    return pl.pallas_call(
        functools.partial(_bwd_kernel_pool, spec=spec, ca=ca),
        grid=(spec.p,),
        in_specs=[base[0],
                  pl.BlockSpec((8, R), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  base[1], per_r(H)] + base[2:] + [
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            per_r(H), per_r(H),
            pl.BlockSpec((spec.gp, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=spec.interpret,
    )(idx_t, ng, xa, xr, xb, wa, wb, b.reshape(1, H), out, g, gpool)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_gather_linear_pool(spec: GatherLinearSpec, xa, xr, xb, idx_t, ng,
                             wa, wb, b):
    """(hn, pool): hn = relu((G@xa + xr)@wa + xb@wb + b); pool = Gp @ hn.

    ``ng`` [p*8, R] carries pack*GP+group per out row in row 0 of each
    8-row block, sentinel elsewhere (Mosaic's sublane-divisibility rule —
    same layout as the transposed index tables);
    ``pool`` is [p*GP, H] per-pack fragment partial sums."""
    return _fwd_call_pool(spec, idx_t, ng, xa, xr, xb, wa, wb, b)


def _fglp_fwd(spec, xa, xr, xb, idx_t, ng, wa, wb, b):
    out, pool = _fwd_call_pool(spec, idx_t, ng, xa, xr, xb, wa, wb, b)
    return (out, pool), (xa, xr, xb, idx_t, ng, wa, wb, b, out)


def _fglp_bwd(spec, res, g):
    xa, xr, xb, idx_t, ng, wa, wb, b, out = res
    g_hn, g_pool = g
    dxa, dxr, dxb, dwa, dwb, db = _bwd_call_pool(
        spec, idx_t, ng, xa, xr, xb, wa, wb, b, out, g_hn, g_pool)
    return (dxa.astype(xa.dtype), dxr.astype(xr.dtype), dxb.astype(xb.dtype),
            None, None, dwa.astype(wa.dtype), dwb.astype(wb.dtype),
            db.reshape(-1).astype(wa.dtype))


fused_gather_linear_pool.defvjp(_fglp_fwd, _fglp_bwd)
