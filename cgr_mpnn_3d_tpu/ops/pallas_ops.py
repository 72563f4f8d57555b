"""Pallas TPU kernels: block-dense one-hot SpMM for packed graph batches.

The XLA gather path (ops/segment.py) reaches ~2% of the v5e MXU roofline —
row gathers are irregular-memory ops the TPU hates.  This kernel exploits the
packer's locality invariant (data/batch.py: a graph never spans packs, all
indices are pack-local) to re-express every gather-sum as a *dense matmul*:

    out[r] = sum_d src[idx[r, d]] - src[sign_idx[r]]
           = M @ src        with  M[r, c] = |{d : idx[r,d] == c}| - [sign==c]

M is built in-VMEM from the int32 index tiles with D+1 vectorized iota
comparisons (VPU, cheap) and immediately contracted on the MXU against the
pack's dense [C, H] tile.  One grid step per pack; no irregular DMA at all.

Every op in the model (fwd AND bwd) is an instance of this kernel:

    op                       R tile   C tile   D        sign
    dmpnn_messages fwd       TE       TE       max-deg  rev
    dmpnn_messages bwd       TE       TE       max-deg  rev
    node_incoming fwd        TN       TE       max-deg  -
    node_incoming bwd        TE       TN       1        -
    gather_nodes fwd         TE       TN       1        -
    gather_nodes bwd         TN       TE       max-deg  -
    pool fwd                 TB       TN       max-graph -
    pool bwd                 TN       TB       1        -

Sentinel indices (== total row count) fall outside every pack's local column
range and contribute zero automatically.

See /opt/skills/guides/pallas_guide.md for the programming model; reference
hot loop being replaced: GNN.py:134 (torch_scatter CUDA scatter-add).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["onehot_spmm", "onehot_spmm_ref"]


def _kernel(idx_ref, sign_ref, src_ref, out_ref, *, c_tile: int,
            acc_dtype, mat_dtype):
    p = pl.program_id(0)
    base = p * c_tile
    idx_local = idx_ref[:] - base                       # [R, D]
    cols = jax.lax.broadcasted_iota(jnp.int32, (idx_ref.shape[0], c_tile), 1)

    m = jnp.zeros((idx_ref.shape[0], c_tile), mat_dtype)
    for d in range(idx_ref.shape[1]):
        # 2-D slice avoids a per-d lane->sublane relayout (see pallas_fused)
        m = m + (cols == idx_local[:, d:d + 1]).astype(mat_dtype)
    if sign_ref is not None:
        sign_local = sign_ref[:] - base                 # [R, 1]
        m = m - (cols == sign_local).astype(mat_dtype)

    out_ref[:] = jax.lax.dot_general(
        m, src_ref[:].astype(mat_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc_dtype,
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("p", "mat_dtype", "interpret"))
def onehot_spmm(idx: jax.Array, sign: jax.Array | None, src: jax.Array,
                p: int, mat_dtype=jnp.bfloat16,
                interpret: bool = False) -> jax.Array:
    """out[r] = sum_d src[idx[r,d]] (- src[sign[r]]), blocked into ``p`` packs.

    idx:  [p*R, D] int32 global row ids into src (sentinel = p*C)
    sign: [p*R] int32 or None
    src:  [p*C, H]
    ->    [p*R, H] float32
    """
    PR, D = idx.shape
    PC, H = src.shape
    if PR % p or PC % p:
        raise ValueError(f"shapes {idx.shape}/{src.shape} not divisible by "
                         f"p={p}")
    R, C = PR // p, PC // p

    kernel = functools.partial(_kernel, c_tile=C, acc_dtype=jnp.float32,
                               mat_dtype=mat_dtype)
    in_specs = [
        pl.BlockSpec((R, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    args = [idx]
    if sign is not None:
        in_specs.append(pl.BlockSpec((R, 1), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(sign.reshape(PR, 1))
    else:
        kernel = functools.partial(_kernel_nosign, c_tile=C,
                                   acc_dtype=jnp.float32,
                                   mat_dtype=mat_dtype)
    in_specs.append(pl.BlockSpec((C, H), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))
    args.append(src)

    flops = 2 * PR * C * H + PR * C * (D + 1)
    return pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((PR, H), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(PR * D + PR + PC * H + PR * H) * 4,
            transcendentals=0),
        interpret=interpret,
    )(*args)


def _kernel_nosign(idx_ref, src_ref, out_ref, *, c_tile: int, acc_dtype,
                   mat_dtype):
    _kernel(idx_ref, None, src_ref, out_ref, c_tile=c_tile,
            acc_dtype=acc_dtype, mat_dtype=mat_dtype)


def onehot_spmm_ref(idx, sign, src, p=None, **_kw):
    """Pure-jnp reference (gather path) for testing."""
    ext = jnp.concatenate([src, jnp.zeros((1, src.shape[1]), src.dtype)], 0)
    out = jnp.take(ext, idx, axis=0, mode="clip").sum(axis=1)
    if sign is not None:
        out = out - jnp.take(ext, sign, axis=0, mode="clip")
    return out.astype(jnp.float32)
