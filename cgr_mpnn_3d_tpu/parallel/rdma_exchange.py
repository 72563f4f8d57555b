"""Pallas async-remote-copy boundary exchange for edge partitioning.

Alternative to the XLA ``ppermute`` ring in :mod:`.ep_pack` (the default —
see ``_ring_exchange`` there): one Pallas kernel pushes EVERY hop block as a
concurrent inter-chip RDMA (``pltpu.make_async_remote_copy``), each hop with
its own buffer slice and semaphore pair, so all boundary traffic is in
flight simultaneously instead of as ``n_ep - 1`` sequential XLA collectives.
This is the SNIPPETS [1][2] right-permute pattern generalized to the
hop-aligned wire layout (hop ``h`` owns the static rows
``[off_h, off_h + S_h)`` of the ``[TW, H]`` wire buffer and moves them
``k -> (k ± h) % n_ep``); the per-hop semaphores are the double-buffering
analog for a static hop set.

Semantics are IDENTICAL to ``_ring_exchange``: this is a pure (blockwise)
permutation over the 'ep' axis, so its autodiff transpose is the inverse
exchange (custom VJP below), and the EP math (ep_pack.ep_pack_forward) is
unchanged — assert-equal tests run both paths in TPU-interpret mode on the
CPU mesh (tests/test_rdma_exchange.py).

Selected with ``CGRMPNNConfig.ep_rdma_exchange=True`` (CLI ``--ep_rdma``);
requires TPU hardware (or ``pallas_interpret``) — the first multi-chip
allocation can profile it against the ppermute ring immediately
(VERDICT r2 #5).

Reference capability: the reference has no distribution at all (SURVEY.md
§2 parallelism checklist); this is TPU-native machinery for the
BASELINE.json north star.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ring_exchange_rdma"]

# distinct from any other collective kernel in the package (barrier
# semaphores are shared per collective_id)
_COLLECTIVE_ID = 11


def _active_hops(caps: tuple[int, ...]) -> list[tuple[int, int, int]]:
    """[(hop, row_offset, rows)] for hops with a non-empty block."""
    out, off = [], 0
    for h, s_h in enumerate(caps, start=1):
        if s_h > 0:
            out.append((h, off, s_h))
        off += s_h
    return out


def _exchange_kernel(buf_ref, out_ref, send_sem, recv_sem, *,
                     active: tuple[tuple[int, int, int], ...],
                     axis: str, inverse: bool):
    n = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)

    # MESH device id as {axis: peer}: other mesh coordinates stay our own
    def peer(h):
        return {axis: (me - h) % n if inverse else (me + h) % n}

    # barrier with every peer this exchange touches — BOTH directions per
    # hop: the device we will write to (it must have entered the kernel
    # before our RDMA lands in its out_ref) AND the device that writes to
    # us (it must not proceed until we are in).  Signaling only the write
    # destination would let a writer race a destination that is still in
    # the previous layer when hops are asymmetric (e.g. caps=(8,0,...)).
    barrier = pltpu.get_barrier_semaphore()
    for h, _, _ in active:
        dst = (me - h) % n if inverse else (me + h) % n
        src = (me + h) % n if inverse else (me - h) % n
        pltpu.semaphore_signal(barrier, inc=1, device_id={axis: dst},
                               device_id_type=pltpu.DeviceIdType.MESH)
        pltpu.semaphore_signal(barrier, inc=1, device_id={axis: src},
                               device_id_type=pltpu.DeviceIdType.MESH)
    pltpu.semaphore_wait(barrier, 2 * len(active))

    # start every hop's RDMA before waiting on any: all boundary traffic is
    # on the wire concurrently (per-hop semaphore slots)
    rdmas = []
    for i, (h, off, s_h) in enumerate(active):
        rdma = pltpu.make_async_remote_copy(
            src_ref=buf_ref.at[pl.ds(off, s_h)],
            dst_ref=out_ref.at[pl.ds(off, s_h)],
            send_sem=send_sem.at[i],
            recv_sem=recv_sem.at[i],
            device_id=peer(h),
            device_id_type=pltpu.DeviceIdType.MESH)
        rdma.start()
        rdmas.append(rdma)
    for rdma in rdmas:
        rdma.wait()


def _exchange_call(buf: jax.Array, caps: tuple[int, ...], axis: str,
                   inverse: bool, interpret: bool) -> jax.Array:
    active = tuple(_active_hops(caps))
    tw = int(sum(caps))
    if not active or tw == 0:
        return buf
    assert buf.shape[0] == tw, (buf.shape, caps)
    kern = functools.partial(_exchange_kernel, active=active, axis=axis,
                             inverse=inverse)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(buf.shape, buf.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((len(active),)),
                        pltpu.SemaphoreType.DMA((len(active),))],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=_COLLECTIVE_ID),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(buf)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def ring_exchange_rdma(buf: jax.Array, caps: tuple[int, ...], axis: str,
                       inverse: bool = False,
                       interpret: bool = False) -> jax.Array:
    """Exchange hop-aligned wire rows over ``axis`` via concurrent RDMAs.

    Drop-in for ``ep_pack._ring_exchange`` (same block semantics: hop ``h``
    rows move ``k -> (k+h) % n``, or back when ``inverse``).  MESH device
    ids address peers as ``{axis: k±h}``, so any other mesh axes ('dp')
    keep our own coordinates.
    """
    return _exchange_call(buf, caps, axis, inverse, interpret)


def _rer_fwd(buf, caps, axis, inverse, interpret):
    return _exchange_call(buf, caps, axis, inverse, interpret), None


def _rer_bwd(caps, axis, inverse, interpret, _res, g):
    # transpose of a permutation = its inverse permutation
    return (_exchange_call(g, caps, axis, not inverse, interpret),)


ring_exchange_rdma.defvjp(_rer_fwd, _rer_bwd)
