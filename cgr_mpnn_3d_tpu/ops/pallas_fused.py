"""Fully-fused D-MPNN conv layer as Pallas TPU kernels.

One forward kernel per pack computes the *entire* reference layer
(GNN.py:90-102):

    t    = M @ h                    one-hot message matrix (in VMEM)
    pre  = t @ W + b + skip * h0    conv linear + skip
    out  = dropout(relu(pre))       in-kernel PRNG dropout

without materializing ``t`` or ``pre`` to HBM — the unfused path writes and
re-reads two [E, H] intermediates per layer, which made the step
HBM-bandwidth-bound (bench: 2.7 Medge/s unfused).

The backward kernel reuses the same VMEM-resident M for its transpose
contraction (dot_general over dim 0), so no reverse index arrays are needed:

    dpre = g * [out > 0] / keep     (ReLU+dropout fold: out>0 iff kept & pre>0)
    dh   = M^T @ (dpre @ W^T)
    dh0  = skip * dpre
    dW  += t^T @ dpre               (t recomputed in VMEM; accumulated over packs)
    db  += sum_e dpre
    dskip += sum dpre*h0            (learnable-skip grad)

Restriction: ReLU activation only (the reference's default and headline
config); other activations fall back to the semi-fused path.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["FusedConvSpec", "fused_conv_layer"]


@dataclass(frozen=True)
class FusedConvSpec:
    p: int                      # packs
    dropout_p: float = 0.0
    train: bool = False
    learnable_skip: bool = False
    mat_dtype: object = jnp.bfloat16
    out_dtype: object = jnp.float32
    interpret: bool = False

    @property
    def keep(self) -> float:
        return 1.0 - self.dropout_p

    @property
    def use_dropout(self) -> bool:
        return self.train and self.dropout_p > 0.0


def _build_m(nbr_ref, rev_ref, base, c_tile, dtype):
    idx_local = nbr_ref[:] - base
    cols = jax.lax.broadcasted_iota(jnp.int32,
                                    (nbr_ref.shape[0], c_tile), 1)
    m = jnp.zeros((nbr_ref.shape[0], c_tile), dtype)
    for d in range(nbr_ref.shape[1]):
        # 2-D slice keeps the sublane-major layout — indexing with
        # [:, d][:, None] would force a lane->sublane relayout per d
        m = m + (cols == idx_local[:, d:d + 1]).astype(dtype)
    m = m - (cols == (rev_ref[:] - base)).astype(dtype)
    return m


def _fwd_kernel(nbr_ref, rev_ref, h_ref, h0_ref, w_ref, b_ref,
                skip_ref, seed_ref, out_ref, *, spec: FusedConvSpec, te: int):
    p = pl.program_id(0)
    md = spec.mat_dtype
    m = _build_m(nbr_ref, rev_ref, p * te, te, md)
    t = jax.lax.dot_general(m, h_ref[:].astype(md),
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    pre = jax.lax.dot_general(t.astype(md), w_ref[:].astype(md),
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    pre = pre + b_ref[:].astype(jnp.float32)
    pre = pre + skip_ref[0, 0] * h0_ref[:].astype(jnp.float32)
    out = jnp.maximum(pre, 0.0)
    if spec.use_dropout:
        # Counter-based hash dropout (murmur3 finalizer): deterministic
        # across backends/replays (resume-reproducible), no hardware PRNG.
        bits = _hash_bits(out.shape, seed_ref[0, 0], p)
        thresh = jnp.uint32(min(int(spec.dropout_p * 2**32), 2**32 - 1))
        out = jnp.where(bits >= thresh, out * (1.0 / spec.keep), 0.0)
    out_ref[:] = out.astype(out_ref.dtype)


def _hash_bits(shape, seed, pack_id):
    row = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    col = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = (row * jnp.uint32(65537) + col
         + seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
         + jnp.uint32(pack_id) * jnp.uint32(0x85EBCA6B))
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _bwd_kernel(nbr_ref, rev_ref, h_ref, h0_ref, w_ref, out_ref, g_ref,
                skip_ref, dh_ref, dh0_ref, dw_ref, db_ref, dskip_ref,
                *, spec: FusedConvSpec, te: int):
    p = pl.program_id(0)
    md = spec.mat_dtype
    scale = (1.0 / spec.keep) if spec.use_dropout else 1.0
    # compare in f32: Mosaic (v5e) rejects packed-bf16 cmpf vectors
    dpre = jnp.where(out_ref[:].astype(jnp.float32) > 0.0,
                     g_ref[:].astype(jnp.float32) * scale, 0.0)

    m = _build_m(nbr_ref, rev_ref, p * te, te, md)
    # dt = dpre @ W^T
    dt = jax.lax.dot_general(dpre.astype(md), w_ref[:].astype(md),
                             dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # dh = M^T @ dt  (contract edge dim of both)
    dh_ref[:] = jax.lax.dot_general(
        m, dt.astype(md), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dh_ref.dtype)
    dh0_ref[:] = (skip_ref[0, 0] * dpre).astype(dh0_ref.dtype)

    # t recomputed for dW
    t = jax.lax.dot_general(m, h_ref[:].astype(md),
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    dw_p = jax.lax.dot_general(t.astype(md), dpre.astype(md),
                               dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    db_p = jnp.sum(dpre, axis=0, keepdims=True)
    dskip_p = jnp.sum(dpre * h0_ref[:].astype(jnp.float32))

    @pl.when(p == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dskip_ref[:] = jnp.zeros_like(dskip_ref)

    dw_ref[:] += dw_p.astype(dw_ref.dtype)
    db_ref[:] += db_p.astype(db_ref.dtype)
    dskip_ref[:] += dskip_p.astype(dskip_ref.dtype)


def _fwd_call(spec: FusedConvSpec, nbr, rev, h, h0, w, b, skip, seed):
    PR, D = nbr.shape
    te = PR // spec.p
    H = w.shape[1]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, spec=spec, te=te),
        grid=(spec.p,),
        in_specs=[
            pl.BlockSpec((te, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((te, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((te, h.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((te, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w.shape[0], H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((te, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((PR, H), spec.out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * PR * te * h.shape[1] + 2 * PR * h.shape[1] * H,
            bytes_accessed=PR * (h.shape[1] + 2 * H) * 4,
            transcendentals=0),
        interpret=spec.interpret,
    )(nbr, rev.reshape(PR, 1), h, h0, w, b.reshape(1, H),
      skip.reshape(1, 1), seed.reshape(1, 1).astype(jnp.int32))


def _bwd_call(spec: FusedConvSpec, nbr, rev, h, h0, w, skip, out, g):
    PR, D = nbr.shape
    te = PR // spec.p
    H = w.shape[1]
    Hin = w.shape[0]
    blk = lambda shape, imap: pl.BlockSpec(shape, imap,
                                           memory_space=pltpu.VMEM)
    per_pack = lambda width: blk((te, width), lambda i: (i, 0))
    fixed = lambda r, c: blk((r, c), lambda i: (0, 0))

    out_shapes = (
        jax.ShapeDtypeStruct((PR, Hin), spec.out_dtype),   # dh
        jax.ShapeDtypeStruct((PR, H), spec.out_dtype),     # dh0
        jax.ShapeDtypeStruct((Hin, H), jnp.float32),       # dW
        jax.ShapeDtypeStruct((1, H), jnp.float32),         # db
        jax.ShapeDtypeStruct((1, 1), jnp.float32),         # dskip
    )
    out_specs = (per_pack(Hin), per_pack(H), fixed(Hin, H), fixed(1, H),
                 fixed(1, 1))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, spec=spec, te=te),
        grid=(spec.p,),
        in_specs=[
            per_pack(D), per_pack(1), per_pack(Hin), per_pack(H),
            fixed(Hin, H), per_pack(H), per_pack(H),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=6 * PR * te * H + 4 * PR * H * Hin,
            bytes_accessed=PR * 6 * H * 4,
            transcendentals=0),
        interpret=spec.interpret,
    )(nbr, rev.reshape(PR, 1), h, h0, w, out, g, skip.reshape(1, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_conv_layer(spec: FusedConvSpec, h, h0, nbr, rev, w, b, skip, seed):
    """h_next = dropout(relu((M @ h) @ w + b + skip * h0)).

    ``skip`` is a scalar array (1.0 when not learnable); ``seed`` an int32
    scalar array for the in-kernel dropout PRNG."""
    return _fwd_call(spec, nbr, rev, h, h0, w, b, skip, seed)


def _fcl_fwd(spec, h, h0, nbr, rev, w, b, skip, seed):
    out = _fwd_call(spec, nbr, rev, h, h0, w, b, skip, seed)
    return out, (h, h0, nbr, rev, w, skip, out)


def _fcl_bwd(spec, res, g):
    h, h0, nbr, rev, w, skip, out = res
    dh, dh0, dw, db, dskip = _bwd_call(
        spec, nbr, rev, h, h0, w, skip, out, g)
    return (dh.astype(h.dtype), dh0.astype(h0.dtype), None, None,
            dw.astype(w.dtype), db.reshape(-1).astype(w.dtype),
            dskip.astype(skip.dtype).reshape(skip.shape), None)


fused_conv_layer.defvjp(_fcl_fwd, _fcl_bwd)
