"""Data parallelism over the 'dp' mesh axis via shard_map.

Each device processes its own :class:`PackedGraphBatch` (stacked on a leading
device axis); the per-device sum-of-squared-errors loss and the gradients are
psum'd over the mesh, so the update equals single-device training on the
concatenated batch (verified in tests/test_parallel.py).

shard_map rather than GSPMD sharding because the packed batch's index arrays
are device-local — logically-global sharded indices would make XLA insert
all-gathers around every gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding

from ..data.batch import PackedGraphBatch, PackSpec
from ..models.cgr_mpnn import (CGRMPNNConfig, apply,
                               fused_train_value_and_grad,
                               supports_fused_train)
from ..train.trainer import TrainState
from .mesh import P

__all__ = ["stack_batches", "shard_stacked_batch", "make_dp_train_step",
           "make_dp_eval_step"]


def stack_batches(batches: list[PackedGraphBatch]) -> PackedGraphBatch:
    """Stack per-device batches on a new leading axis [n_dev, ...]."""
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *batches)


def shard_stacked_batch(stacked: PackedGraphBatch, mesh: Mesh
                        ) -> PackedGraphBatch:
    """Place a stacked batch with axis 0 sharded over ('dp','ep')."""
    sharding = NamedSharding(mesh, P(("dp", "ep")))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), stacked)


def make_dp_train_step(optimizer: optax.GradientTransformation,
                       cfg: CGRMPNNConfig, mesh: Mesh,
                       spec: PackSpec | None = None):
    """Returns jitted ``step(state, stacked_batch) -> (state, sum_loss,
    grad_norm)``.

    ``stacked_batch`` leaves have leading axis n_dp*n_ep (both mesh axes are
    used as flat data parallelism here; use edge_partition for genuine ep).
    With ``spec`` and a Pallas-capable config, each device runs the
    one-kernel training step (ops/pallas_model.fused_model_train).
    """
    axes = ("dp", "ep")
    use_fused = spec is not None and supports_fused_train(cfg)

    def per_device(state: TrainState, batch: PackedGraphBatch):
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)  # unstack
        rng = jax.random.fold_in(state.rng, jax.lax.axis_index("dp") *
                                 jax.lax.axis_size("ep") +
                                 jax.lax.axis_index("ep"))
        rng_next, sub = jax.random.split(rng)

        def loss_fn(params):
            preds = apply(params, batch, cfg, spec, train=True, rng=sub)
            err = (preds - batch.labels) * batch.graph_mask
            return jnp.sum(err * err)

        if use_fused:
            loss, grads = fused_train_value_and_grad(state.params, batch,
                                                     cfg, spec, sub)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(state.params)
        loss = jax.lax.psum(loss, axes)
        grads = jax.lax.psum(grads, axes)
        gnorm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_rng, _ = jax.random.split(state.rng)
        return (TrainState(params, opt_state, state.step + 1, new_rng),
                loss, gnorm)

    batch_spec = jax.tree_util.tree_map(
        lambda _: P(("dp", "ep")), PackedGraphBatch(*[0] * 14))
    smapped = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), batch_spec),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    # NO buffer donation: the trainer's NaN guard rolls back to the state it
    # passed into the failing step — donating would delete those buffers
    return jax.jit(smapped)


def make_dp_epoch_scan(optimizer: optax.GradientTransformation,
                       cfg: CGRMPNNConfig, mesh: Mesh,
                       spec: PackSpec | None = None):
    """Device-resident-epoch variant of :func:`make_dp_train_step`: returns
    jitted ``run(state, stacked_epoch, perm) -> (state, losses[S], gnorm)``
    where ``stacked_epoch`` leaves are [S, n_dp*n_ep, ...] sharded
    P(None, ('dp','ep')) — the whole epoch lives on the mesh and one
    dispatch scans over the ``perm`` group order (trainer --device_epoch).

    The per-step math (rng folding, psum placement, optimizer update) is
    the exact body of make_dp_train_step's per_device, so a scanned epoch
    reproduces the host-looped path step for step."""
    axes = ("dp", "ep")
    use_fused = spec is not None and supports_fused_train(cfg)

    def per_device(state: TrainState, epoch_leaves, perm):
        def body(st: TrainState, idx):
            batch = jax.tree_util.tree_map(
                lambda v: jax.lax.dynamic_index_in_dim(
                    v, idx, 0, keepdims=False), epoch_leaves)
            batch = jax.tree_util.tree_map(lambda x: x[0], batch)
            rng = jax.random.fold_in(st.rng, jax.lax.axis_index("dp") *
                                     jax.lax.axis_size("ep") +
                                     jax.lax.axis_index("ep"))
            _, sub = jax.random.split(rng)

            def loss_fn(params):
                preds = apply(params, batch, cfg, spec, train=True, rng=sub)
                err = (preds - batch.labels) * batch.graph_mask
                return jnp.sum(err * err)

            if use_fused:
                loss, grads = fused_train_value_and_grad(
                    st.params, batch, cfg, spec, sub)
            else:
                loss, grads = jax.value_and_grad(loss_fn)(st.params)
            loss = jax.lax.psum(loss, axes)
            grads = jax.lax.psum(grads, axes)
            gnorm = optax.global_norm(grads)
            updates, opt_state = optimizer.update(grads, st.opt_state,
                                                  st.params)
            params = optax.apply_updates(st.params, updates)
            new_rng, _ = jax.random.split(st.rng)
            return (TrainState(params, opt_state, st.step + 1, new_rng),
                    (loss, gnorm))

        state, (losses, gnorms) = jax.lax.scan(body, state, perm)
        return state, losses, gnorms[-1]

    epoch_spec = jax.tree_util.tree_map(
        lambda _: P(None, ("dp", "ep")), PackedGraphBatch(*[0] * 14))
    smapped = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), epoch_spec, P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(smapped)


def make_dp_eval_step(cfg: CGRMPNNConfig, mesh: Mesh,
                      spec: PackSpec | None = None):
    def per_device(params, batch: PackedGraphBatch):
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        preds = apply(params, batch, cfg, spec, train=False)
        err = (preds - batch.labels) * batch.graph_mask
        return jax.lax.psum(jnp.sum(err * err), ("dp", "ep"))

    batch_spec = jax.tree_util.tree_map(
        lambda _: P(("dp", "ep")), PackedGraphBatch(*[0] * 14))
    smapped = jax.shard_map(per_device, mesh=mesh,
                            in_specs=(P(), batch_spec), out_specs=P(),
                            check_vma=False)
    return jax.jit(smapped)
