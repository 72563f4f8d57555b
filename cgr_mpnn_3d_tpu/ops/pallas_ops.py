"""Pallas TPU kernels: block-dense one-hot SpMM for packed graph batches.

The XLA gather path (ops/segment.py) reaches ~2% of the v5e MXU roofline —
row gathers are irregular-memory ops the TPU hates.  This kernel exploits the
packer's locality invariant (data/batch.py: a graph never spans packs, all
indices are pack-local) to re-express every gather-sum as a *dense matmul*:

    out[r] = sum_d src[idx[r, d]] - src[sign_idx[r]]
           = M @ src     with  M[r, c] = |{d : idx[r,d] == c}| - [sign==c]

M is built in-VMEM from int32 index tiles with iota comparisons (VPU) and
immediately contracted on the MXU against the pack's dense [C, H] tile.

Layout is everything: the kernel consumes indices in **transposed [D, R]
rows** and builds M transposed ([C, R], contracted over dim 0), so each
comparison broadcasts an index **row** across sublanes.  The naive [R, D]
orientation forces a lane-broadcast per (d, pack) which Mosaic lowers ~300x
slower (measured on v5e: 28.6 ms vs 0.087 ms for the same op).

Every op in the model (fwd AND bwd) is an instance of this kernel — see
ops/dispatch.py for the mapping and ops/pallas_fused.py for the fully-fused
conv layer.  Sentinel indices fall outside every pack's local column range
and contribute zero automatically.

Reference hot loop being replaced: GNN.py:134 (torch_scatter CUDA
scatter-add); see /opt/skills/guides/pallas_guide.md for the programming
model.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["build_idx_t", "onehot_spmm_t", "onehot_spmm_ref", "PAD_SENTINEL"]

# never matches any pack-local column after base subtraction
PAD_SENTINEL = 1 << 30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def build_idx_t(idx: jax.Array, sign: jax.Array | None, p: int) -> jax.Array:
    """[p*R, D] (+ optional sign column) -> transposed [p*D_pad, R] rows.

    Row layout per pack: rows 0..D-1 are the summed indices, row D (when
    ``sign`` is given) is the subtracted index, remaining rows up to the
    8-aligned D_pad are PAD_SENTINEL.  Pure jnp — runs once per step under
    jit and is reused by every layer.
    """
    PR, D = idx.shape
    R = PR // p
    parts = [idx.reshape(p, R, D)]
    d_tot = D
    if sign is not None:
        parts.append(sign.reshape(p, R, 1))
        d_tot += 1
    arr = jnp.concatenate(parts, axis=2) if len(parts) > 1 else parts[0]
    d_pad = _round_up(d_tot, 8)
    if d_pad != d_tot:
        pad = jnp.full((p, R, d_pad - d_tot), PAD_SENTINEL, jnp.int32)
        arr = jnp.concatenate([arr, pad], axis=2)
    return arr.transpose(0, 2, 1).reshape(p * d_pad, R)


def _kernel_t(idx_ref, src_ref, out_ref, *, c_tile: int, d_nbr: int,
              has_sign: bool, mat_dtype):
    p = pl.program_id(0)
    il = idx_ref[:] - p * c_tile                     # [D_pad, R]
    r_tile = idx_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (c_tile, r_tile), 0)
    mt = jnp.zeros((c_tile, r_tile), mat_dtype)
    for d in range(d_nbr):
        mt = mt + (rows == il[d:d + 1, :]).astype(mat_dtype)
    if has_sign:
        mt = mt - (rows == il[d_nbr:d_nbr + 1, :]).astype(mat_dtype)
    out_ref[:] = jax.lax.dot_general(
        mt, src_ref[:].astype(mat_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("p", "d_nbr", "has_sign",
                                             "mat_dtype", "out_dtype",
                                             "interpret"))
def onehot_spmm_t(idx_t: jax.Array, src: jax.Array, p: int, d_nbr: int,
                  has_sign: bool, mat_dtype=jnp.bfloat16,
                  out_dtype=jnp.float32,
                  interpret: bool = False) -> jax.Array:
    """out[r] = sum_d src[idx[d, r]] (- src[sign row]), blocked by pack.

    idx_t: [p*D_pad, R] int32 from :func:`build_idx_t`
    src:   [p*C, H]
    ->     [p*R, H] in ``out_dtype``
    """
    PD, R = idx_t.shape
    D_pad = PD // p
    PC, H = src.shape
    C = PC // p

    kernel = functools.partial(_kernel_t, c_tile=C, d_nbr=d_nbr,
                               has_sign=has_sign, mat_dtype=mat_dtype)
    flops = 2 * p * C * R * H + p * C * R * (d_nbr + 1)
    return pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=[
            pl.BlockSpec((D_pad, R), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p * R, H), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(PD * R + PC * H + p * R * H) * 4,
            transcendentals=0),
        interpret=interpret,
    )(idx_t, src)


def onehot_spmm_ref(idx, sign, src, p=None, **_kw):
    """Pure-jnp gather reference (untransposed [R, D] indices) for testing."""
    ext = jnp.concatenate([src, jnp.zeros((1, src.shape[1]), src.dtype)], 0)
    idx = jnp.minimum(idx, src.shape[0])
    out = jnp.take(ext, idx, axis=0, mode="clip").sum(axis=1)
    if sign is not None:
        out = out - jnp.take(ext, jnp.minimum(sign, src.shape[0]), axis=0,
                             mode="clip")
    return out.astype(jnp.float32)
