"""Whole-depth D-MPNN conv stack as two Pallas kernels (flash-MPNN).

The per-layer fused kernel (ops/pallas_fused.py) is HBM-bandwidth-bound on
the edge-state reads/writes between layers.  This kernel keeps the edge
state **in VMEM for the entire depth**:

  forward  (per pack):  read h0, idx; unroll all L layers in VMEM; write
                        ONLY the final edge state.           [1 read, 1 write]
  backward (per pack):  read h0, g, idx; REPLAY the forward in VMEM
                        (gradient checkpointing), then walk the layers in
                        reverse accumulating dW/db/dskip (over packs too) and
                        the total dh0 cotangent.             [2 reads, 1 write]

versus 4x(2 reads + 1 write) forward and ~4x(4 reads + 2 writes) backward
for the per-layer kernel — about 6x less conv traffic, which is the step's
dominant cost (measured: a plain [E,H]x[H,H] matmul costs 1.27 ms at this
device's effective ~137 GB/s; the per-layer fused kernel 1.69 ms).

Because the stack starts at h == h0 (GNN.py:87 ``h = h_0``) and h0 feeds
every layer's skip, the ONLY input cotangent is dh0; per-layer dropout masks
are regenerated from the hash (ops/pallas_fused._hash_bits), so no masks are
stored.  Activation- and aggregation-general, like the per-layer kernel.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fused import _build_mt, _hash_bits, k_act, k_dact, \
    k_dropout_mask

__all__ = ["ConvStackSpec", "fused_conv_stack"]


@dataclass(frozen=True)
class ConvStackSpec:
    p: int
    d_nbr: int
    depth: int
    dropout_ps: tuple[float, ...] = ()
    train: bool = False
    learnable_skip: bool = False
    mat_dtype: object = jnp.bfloat16
    out_dtype: object = jnp.bfloat16
    interpret: bool = False
    act: str = "relu"           # relu | silu | gelu (exact/erf)
    aggr: str = "add"           # add | mean (DMPNNConv aggr, GNN.py:120)

    @property
    def mean(self) -> bool:
        return self.aggr == "mean"

    def keep(self, l: int) -> float:
        return 1.0 - self.dropout_ps[l]

    def use_dropout(self, l: int) -> bool:
        return self.train and self.dropout_ps[l] > 0.0


def _layer_fwd(spec, l, mt, h, h0, w_ref, b_ref, skips_ref, seeds_ref, p):
    md = spec.mat_dtype
    t = jax.lax.dot_general(mt, h.astype(md),
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    pre = jax.lax.dot_general(t.astype(md), w_ref[l].astype(md),
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    pre = pre + b_ref[l:l + 1, :].astype(jnp.float32)
    pre = pre + skips_ref[0, l] * h0.astype(jnp.float32)
    out = k_act(spec.act, pre)
    if spec.use_dropout(l):
        bits = _hash_bits(out.shape, seeds_ref[0, l], p)
        thr = jnp.uint32(min(int(spec.dropout_ps[l] * 2**32), 2**32 - 1))
        out = jnp.where(bits >= thr, out * (1.0 / spec.keep(l)), 0.0)
    return out, pre


def _fwd_kernel(idx_ref, h0_ref, w_ref, b_ref, skips_ref, seeds_ref,
                out_ref, *, spec: ConvStackSpec, te: int):
    p = pl.program_id(0)
    mt = _build_mt(idx_ref, p * te, te, spec.d_nbr, spec.mat_dtype,
                   spec.mean)
    h = h0_ref[:]
    for l in range(spec.depth):
        h, _ = _layer_fwd(spec, l, mt, h, h0_ref[:], w_ref, b_ref,
                          skips_ref, seeds_ref, p)
    out_ref[:] = h.astype(out_ref.dtype)


def _bwd_kernel(idx_ref, h0_ref, w_ref, b_ref, skips_ref, seeds_ref, g_ref,
                dh0_ref, dw_ref, db_ref, dskip_ref,
                *, spec: ConvStackSpec, te: int):
    p = pl.program_id(0)
    md = spec.mat_dtype
    mt = _build_mt(idx_ref, p * te, te, spec.d_nbr, md, spec.mean)
    h0 = h0_ref[:]

    # replay forward, keeping every layer state in VMEM (registers/stack);
    # non-ReLU activations also keep the pre-activations for act'(pre)
    keep_pre = spec.act != "relu"
    states = [h0]
    pres = []
    h = h0
    for l in range(spec.depth):
        h, pre = _layer_fwd(spec, l, mt, h, h0, w_ref, b_ref, skips_ref,
                            seeds_ref, p)
        states.append(h)
        pres.append(pre if keep_pre else None)

    @pl.when(p == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dskip_ref[:] = jnp.zeros_like(dskip_ref)

    g = g_ref[:].astype(jnp.float32)
    dh0 = jnp.zeros_like(g)
    for l in reversed(range(spec.depth)):
        out_l = states[l + 1]
        scale = (1.0 / spec.keep(l)) if spec.use_dropout(l) else 1.0
        if spec.act == "relu":
            # ReLU+dropout fold: out>0 iff kept & pre>0
            dpre = jnp.where(out_l.astype(jnp.float32) > 0.0, g * scale,
                             0.0)
        else:
            gg = g
            if spec.use_dropout(l):
                gg = gg * scale * k_dropout_mask(gg.shape, seeds_ref[0, l],
                                                 p, spec.keep(l))
            dpre = gg * k_dact(spec.act, pres[l])
        # t_l recomputed for dW
        t = jax.lax.dot_general(mt, states[l].astype(md),
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        dw_ref[l] += jax.lax.dot_general(
            t.astype(md), dpre.astype(md),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db_ref[l:l + 1, :] += jnp.sum(dpre, axis=0, keepdims=True)
        dskip_ref[0:1, l:l + 1] += jnp.sum(
            dpre * h0.astype(jnp.float32)).reshape(1, 1)
        dh0 = dh0 + skips_ref[0, l] * dpre
        # cotangent into the layer's input state
        dt = jax.lax.dot_general(dpre.astype(md), w_ref[l].astype(md),
                                 dimension_numbers=(((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        g = jax.lax.dot_general(mt, dt.astype(md),
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    # the stack's initial state IS h0
    dh0_ref[:] = (dh0 + g).astype(dh0_ref.dtype)


def _common_specs(spec, d_pad, te, Hh, H):
    per_pack = lambda w: pl.BlockSpec((te, w), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
    return [
        pl.BlockSpec((d_pad, te), lambda i: (i, 0), memory_space=pltpu.VMEM),
        per_pack(Hh),                                         # h0
        pl.BlockSpec((spec.depth, Hh, H), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),                # W stack
        pl.BlockSpec((spec.depth, H), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),                # b stack
        pl.BlockSpec((1, spec.depth), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),                # skips
        pl.BlockSpec((1, spec.depth), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),                # seeds
    ]


def _fwd_call(spec, idx_t, h0, w, b, skips, seeds):
    PD, te = idx_t.shape
    d_pad = PD // spec.p
    L, Hh, H = w.shape
    per_pack = lambda width: pl.BlockSpec((te, width), lambda i: (i, 0),
                                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, spec=spec, te=te),
        grid=(spec.p,),
        in_specs=_common_specs(spec, d_pad, te, Hh, H),
        out_specs=per_pack(H),
        out_shape=jax.ShapeDtypeStruct((spec.p * te, H), spec.out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * spec.p * te * spec.depth * (te * Hh + Hh * H),
            bytes_accessed=spec.p * te * 2 * H * 4,
            transcendentals=0),
        interpret=spec.interpret,
    )(idx_t, h0, w, b, skips.reshape(1, L), seeds.reshape(1, L))


def _bwd_call(spec, idx_t, h0, w, b, skips, seeds, g):
    PD, te = idx_t.shape
    d_pad = PD // spec.p
    L, Hh, H = w.shape
    per_pack = lambda width: pl.BlockSpec((te, width), lambda i: (i, 0),
                                          memory_space=pltpu.VMEM)
    fixed = lambda shape: pl.BlockSpec(shape, (lambda i: (0,) * len(shape)),
                                       memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((spec.p * te, Hh), spec.out_dtype),  # dh0
        jax.ShapeDtypeStruct((L, Hh, H), jnp.float32),            # dW
        jax.ShapeDtypeStruct((L, H), jnp.float32),                # db
        jax.ShapeDtypeStruct((1, L), jnp.float32),                # dskip
    )
    out_specs = (per_pack(Hh), fixed((L, Hh, H)), fixed((L, H)),
                 fixed((1, L)))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, spec=spec, te=te),
        grid=(spec.p,),
        in_specs=_common_specs(spec, d_pad, te, Hh, H) + [per_pack(H)],
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=6 * spec.p * te * spec.depth * (te * Hh + Hh * H),
            bytes_accessed=spec.p * te * 3 * H * 4,
            transcendentals=0),
        interpret=spec.interpret,
    )(idx_t, h0, w, b, skips.reshape(1, L), seeds.reshape(1, L), g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_conv_stack(spec: ConvStackSpec, h0, idx_t, w, b, skips, seeds):
    """Run the whole depth-L D-MPNN conv stack; returns the final edge state.

    w: [L, H, H] stacked conv weights; b: [L, H]; skips: [L] (ones when not
    learnable); seeds: [L] int32 dropout seeds.
    """
    return _fwd_call(spec, idx_t, h0, w, b, skips, seeds)


def _fcs_fwd(spec, h0, idx_t, w, b, skips, seeds):
    out = _fwd_call(spec, idx_t, h0, w, b, skips, seeds)
    return out, (h0, idx_t, w, b, skips, seeds)


def _fcs_bwd(spec, res, g):
    h0, idx_t, w, b, skips, seeds = res
    dh0, dw, db, dskip = _bwd_call(spec, idx_t, h0, w, b, skips, seeds, g)
    return (dh0.astype(h0.dtype), None, dw.astype(w.dtype),
            db.astype(b.dtype), dskip.reshape(skips.shape).astype(skips.dtype),
            None)


fused_conv_stack.defvjp(_fcs_fwd, _fcs_bwd)
