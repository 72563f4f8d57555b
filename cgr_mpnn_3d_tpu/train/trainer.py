"""Training loop: jit-compiled steps, reference-parity optimization recipe.

Reproduces trainer.py:43-217 (RxnGraphTrainer) semantics on the packed
pipeline:

* optimizer   Adam(amsgrad=True) + optional L2-into-gradient weight decay
              (train.py:117-119 ``torch.optim.Adam(weight_decay=...,
              amsgrad=True)``) == optax.chain(add_decayed_weights, amsgrad);
* schedule    ExponentialLR stepped per epoch (trainer.py:212) ==
              optax.exponential_decay(staircase, transition=steps/epoch);
* loss        MSELoss(reduction='sum') over real graphs (train.py:120);
* metric      epoch RMSE = sqrt(sum_sse / len(dataset)) (trainer.py:149,177);
* validation  every ``val_frequency`` epochs + final (trainer.py:200);
* best-val checkpoint (trainer.py:205-211) — here a resumable npz of
  params+opt state instead of a pickled module.

TPU-first deltas: one compiled train step reused for every batch (static
shapes), donated state buffers, device-side loss accumulation, background
host prefetch.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.batch import PackedGraphBatch, PackSpec
from ..data.dataset import ChemDataset
from ..data.loader import PackedLoader
from ..models.cgr_mpnn import (CGRMPNNConfig, apply,
                               fused_train_value_and_grad, init_params,
                               supports_fused_train)
from .checkpoint import save_checkpoint, load_checkpoint, restore_into
from .metrics import MetricsLogger
from .profiler import StepTimer

__all__ = ["TrainState", "RxnGraphTrainer", "make_optimizer", "sse_loss",
           "set_epoch_lr", "scale_by_torch_amsgrad"]


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array
    rng: jax.Array


class ScaleByTorchAmsgradState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any
    nu_max: Any


def scale_by_torch_amsgrad(b1: float = 0.9, b2: float = 0.999,
                           eps: float = 1e-8
                           ) -> optax.GradientTransformation:
    """Bit-exact torch.optim.Adam(amsgrad=True) rescaling.

    NOT optax.scale_by_amsgrad: optax maxes the *bias-corrected* second
    moment (``nu_max = max(nu_max, nu/bc2_t)``), so the step-1 correction
    1/(1-b2) ~ 1000x inflates nu_max for the rest of training and shrinks
    every subsequent step.  torch (torch/optim/adam.py `_single_tensor_adam`)
    maxes the RAW second moment and divides by the *current* bias
    correction at use time:

        m      = b1 m + (1-b1) g
        v      = b2 v + (1-b2) g^2
        vmax   = max(vmax, v)
        update = (m / bc1_t) / (sqrt(vmax) / sqrt(bc2_t) + eps)

    Verified against live torch in tests/test_optimizer_parity.py."""

    def init_fn(params):
        z = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return ScaleByTorchAmsgradState(jnp.zeros((), jnp.int32),
                                        z(), z(), z())

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree_util.tree_map(
            lambda g, m: b1 * m + (1.0 - b1) * g, updates, state.mu)
        nu = jax.tree_util.tree_map(
            lambda g, v: b2 * v + (1.0 - b2) * (g * g), updates, state.nu)
        count = state.count + 1
        nu_max = jax.tree_util.tree_map(jnp.maximum, state.nu_max, nu)
        t = count.astype(jnp.float32)
        bc1 = 1.0 - jnp.power(jnp.float32(b1), t)
        rbc2 = jnp.sqrt(1.0 - jnp.power(jnp.float32(b2), t))
        out = jax.tree_util.tree_map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v) / rbc2 + eps), mu, nu_max)
        return out, ScaleByTorchAmsgradState(count, mu, nu, nu_max)

    return optax.GradientTransformation(init_fn, update_fn)


def _torch_adam_amsgrad(learning_rate: float) -> optax.GradientTransformation:
    return optax.chain(scale_by_torch_amsgrad(),
                       optax.scale_by_learning_rate(learning_rate))


def make_optimizer(lr: float, weight_decay: float, gamma: float = 1.0,
                   steps_per_epoch: int | None = None
                   ) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, weight_decay, amsgrad=True).

    The reference's per-epoch ExponentialLR (trainer.py:212) is applied by
    ``set_epoch_lr`` from the *epoch index*, not from an optimizer step
    count: the loader can emit a variable number of batches per epoch
    (overflow windows) and NaN-guard rollbacks skip steps, so a
    steps-per-epoch staircase would drift from true epoch boundaries.
    ``gamma``/``steps_per_epoch`` are accepted for call-site compatibility
    but decay is external."""
    del gamma, steps_per_epoch
    txs = []
    if weight_decay:
        # torch Adam adds wd*param to the gradient before the moment update
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(optax.inject_hyperparams(_torch_adam_amsgrad)(
        learning_rate=lr))
    return optax.chain(*txs)


def set_epoch_lr(opt_state, lr: float, gamma: float, epoch: int):
    """Return ``opt_state`` with learning_rate = lr * gamma**epoch — exact
    parity with torch ExponentialLR stepped at each epoch end."""
    new = []
    for s in opt_state:
        hp = getattr(s, "hyperparams", None)
        if hp is not None and "learning_rate" in hp:
            hp = dict(hp)
            hp["learning_rate"] = jnp.asarray(
                lr * (gamma ** epoch), dtype=jnp.float32)
            s = s._replace(hyperparams=hp)
        new.append(s)
    return tuple(new)


def sse_loss(params, batch: PackedGraphBatch, cfg: CGRMPNNConfig,
             train: bool, rng, spec: PackSpec | None = None) -> jax.Array:
    preds = apply(params, batch, cfg, spec, train=train, rng=rng)
    err = (preds - batch.labels) * batch.graph_mask
    return jnp.sum(err * err)


@dataclass
class RxnGraphTrainer:
    """Orchestrates train/val epochs (reference RxnGraphTrainer parity)."""
    name: str
    cfg: CGRMPNNConfig
    train_data: ChemDataset
    val_data: ChemDataset
    spec: PackSpec
    lr: float = 1e-3
    weight_decay: float = 0.0
    gamma: float = 1.0
    num_epochs: int = 30
    batch_size: int = 32
    val_frequency: int = 5
    model_save_dir: str = "saved_models"
    seed: int = 0
    logger: MetricsLogger | None = None
    resume_from: str | None = None
    log_param_norms: bool = False
    # wandb watch(log='all') equivalent (wandb_logger.py:41-49): per-layer
    # downsampled histograms of params AND gradients, once per epoch
    # (grads sampled from the epoch's first batch; params-only on the ep
    # mesh and multi-process runs, where a host-side sample batch is not
    # addressable)
    log_histograms: bool = False
    # failure detection: after this many consecutive non-finite losses the
    # run aborts; single spikes roll back to the last saved state
    max_bad_steps: int = 3
    # batches executed per device dispatch (lax.scan): amortizes host
    # round-trip latency; >1 coarsens the NaN-guard rollback to chunk level
    steps_per_call: int = 1
    # data parallelism across local devices: each of n_dp devices processes
    # batch_size/n_dp graphs per step; gradients psum (parallel/
    # data_parallel.py).  Forces steps_per_call=1.
    n_dp: int = 1
    # edge partitioning (parallel/ep_pack.py): every batch's edge arrays are
    # sharded over n_ep chips in pack-local layout (one-hot SpMM kernels +
    # cut-bounded ring boundary exchange); composes with n_dp as a
    # ('dp','ep') mesh.  Forces steps_per_call=1.
    n_ep: int = 1
    # EP pack tile (edge/node slots per pack); auto-grows for giant graphs
    ep_te: int = 128
    ep_tn: int = 72
    # preemption safety: save {name}.latest.npz every N successful train
    # steps WITHIN an epoch (0 = per-epoch only).  Resuming such a
    # checkpoint fast-forwards the (deterministic) loader to the exact step
    # and continues bit-identically — the reference cannot resume at all
    # (SURVEY.md §5 checkpoint row).
    ckpt_every_steps: int = 0
    # host input pipeline: parallel packing width + cross-epoch pack reuse
    # (data/loader.py PackedLoader fields of the same names)
    loader_workers: int = 1
    reuse_packs: bool = False
    # device-resident epochs: stack the reused pack cache ONCE into device
    # arrays [S, ...] (dp/ep meshes: [S, n_dp(, n_ep), ...] sharded) and
    # run each training epoch as a SINGLE jitted lax.scan over an
    # epoch-shuffled permutation — one dispatch per epoch, zero per-step
    # host->device transfers.  The remedy for dispatch-latency-bound
    # training (measured: a tunneled chip spends ~30-50 ms of host/
    # dispatch overhead per step vs ~1 ms of compute at bs=64).  Requires
    # reuse_packs; works on the single-device, dp, and ep paths.  The NaN
    # guard coarsens to epoch granularity: a non-finite loss aborts with
    # the state rolled back to epoch start (a deterministic retry would
    # reproduce the same NaN, so there is no in-epoch rollback), and
    # --ckpt_every_steps / steps_per_call / mid-epoch resume are rejected
    # (there are no host-visible steps inside a scanned epoch).
    device_epoch: bool = False

    def __post_init__(self):
        q = max(1, self.cfg.pallas_sub_packs)
        self.n_dp = max(1, self.n_dp)
        self.n_ep = max(1, self.n_ep)
        ndev = self.n_dp * self.n_ep
        # multi-host: jax.distributed was initialized by the caller
        # (cli/train.py multihost.initialize()); every process runs this
        # same trainer, packs batches only for its local mesh cells, and
        # the shard_map'd steps psum across processes (DCN on real pods).
        self._nproc = jax.process_count()
        if self._nproc > 1:
            if ndev <= 1:
                raise ValueError(
                    f"{self._nproc}-process run needs a multi-device mesh: "
                    f"pass --dp/--ep so dp*ep covers all "
                    f"{len(jax.devices())} global devices")
            covered = {d.process_index for d in jax.devices()[:ndev]}
            if len(covered) < self._nproc:
                raise ValueError(
                    f"mesh dp={self.n_dp} x ep={self.n_ep} uses only the "
                    f"first {ndev} of {len(jax.devices())} global devices "
                    f"and leaves some process(es) with no mesh cells "
                    f"(covered process ids: {sorted(covered)} of "
                    f"{self._nproc}); size dp*ep to the full device count")
            # every process must walk the SAME deterministic batch
            # sequence (seed, dataset, shapes) — a mismatch would not
            # crash, it would silently diverge the loaders and deadlock
            # the collectives.  Catch it at construction with one
            # allgather of the config fingerprint.
            from jax.experimental import multihost_utils
            # f64 holds every int field exactly AND the float hyperparams;
            # val_frequency/ckpt_every_steps/resume matter too — they gate
            # whether a process enters eval/save collectives at an epoch
            # boundary, so a mismatch desyncs the collective SEQUENCE
            probe = np.asarray(
                [self.seed, len(self.train_data), len(self.val_data),
                 self.batch_size, self.n_dp, self.n_ep, self.num_epochs,
                 int(self.reuse_packs), int(self.device_epoch),
                 self.spec.te, self.spec.tn, self.spec.tb,
                 self.val_frequency, self.ckpt_every_steps,
                 int(bool(self.resume_from)), self.steps_per_call,
                 self.max_bad_steps, self.lr, self.weight_decay,
                 self.gamma], np.float64)
            gathered = np.asarray(multihost_utils.process_allgather(probe))
            # compare the gathered ROWS to each other (allgather runs in
            # f32 under default-x64-off jax, so comparing against the
            # local f64 probe would false-positive on e.g. lr=1e-3)
            if not (gathered == gathered[0:1]).all():
                raise ValueError(
                    "multi-process config mismatch: every process must "
                    "run the identical trainer config (seed, dataset "
                    "sizes, batch size, mesh, epochs, pack spec) — "
                    f"fingerprints:\n{gathered}")
            # --device_epoch composes with multi-process meshes: staging
            # goes through multihost.globalize_epoch (each process
            # device_puts only its local cells' epoch columns) instead of
            # a host-global device_put
        if ndev > 1:
            if len(jax.devices()) < ndev:
                raise ValueError(f"mesh dp={self.n_dp} x ep={self.n_ep} "
                                 f"needs {ndev} devices, have "
                                 f"{len(jax.devices())}")
            if self.steps_per_call > 1:
                raise ValueError("steps_per_call > 1 is single-device only")
        if self.device_epoch:
            if not self.reuse_packs:
                raise ValueError("--device_epoch requires --reuse_packs "
                                 "(the epoch cache is what gets staged on "
                                 "device)")

            if self.ckpt_every_steps:
                raise ValueError("--device_epoch has no host-visible steps; "
                                 "--ckpt_every_steps cannot fire inside a "
                                 "scanned epoch")
            if self.steps_per_call > 1:
                raise ValueError("--device_epoch scans the whole epoch in "
                                 "one dispatch; --steps_per_call would be "
                                 "silently ignored — drop one of the two")
        per_dev_bs = -(-self.batch_size // self.n_dp)
        if self.n_ep > 1:
            from ..parallel import EPPackLoader
            self.train_loader = EPPackLoader(self.train_data, self.n_ep,
                                             batch_size=per_dev_bs,
                                             n_dp=self.n_dp, shuffle=True,
                                             seed=self.seed,
                                             te=self.ep_te, tn=self.ep_tn,
                                             reuse_packs=self.reuse_packs,
                                             workers=self.loader_workers)
            self.val_loader = EPPackLoader(self.val_data, self.n_ep,
                                           batch_size=per_dev_bs,
                                           n_dp=self.n_dp, shuffle=False,
                                           te=self.ep_te, tn=self.ep_tn,
                                           reuse_packs=self.reuse_packs,
                                           workers=self.loader_workers)
        else:
            self.train_loader = PackedLoader(self.train_data, self.spec,
                                             batch_size=per_dev_bs,
                                             shuffle=True, seed=self.seed,
                                             round_packs_to=q,
                                             workers=self.loader_workers,
                                             reuse_packs=self.reuse_packs)
            self.val_loader = PackedLoader(self.val_data, self.spec,
                                           batch_size=per_dev_bs,
                                           shuffle=False, round_packs_to=q,
                                           workers=self.loader_workers,
                                           reuse_packs=self.reuse_packs)
        steps_per_epoch = len(self.train_loader)
        self.optimizer = make_optimizer(self.lr, self.weight_decay,
                                        self.gamma, steps_per_epoch)
        key = jax.random.PRNGKey(self.seed)
        pkey, self._rng = jax.random.split(key)
        params = init_params(pkey, self.cfg)
        opt_state = self.optimizer.init(params)
        self.state = TrainState(params, opt_state, jnp.zeros((), jnp.int32),
                                self._rng)
        self.best_val_loss = float("inf")
        self.start_epoch = 0
        self._skip_steps = 0
        self._timer = StepTimer()
        if self.resume_from:
            self._resume(self.resume_from)
            if self.device_epoch and self._skip_steps:
                raise ValueError(
                    "--device_epoch cannot fast-forward into a MID-epoch "
                    "checkpoint (the scanned epoch has no host-visible "
                    "steps, and the checkpoint's batch order came from a "
                    "host-looped run); resume this checkpoint without "
                    "--device_epoch, or resume an epoch-boundary "
                    "checkpoint")

        cfg = self.cfg
        optimizer = self.optimizer

        self._hist_grads = None   # per-layer grad histograms (see below)

        if self.n_ep > 1:
            from ..parallel import (make_ep_pack_eval_step,
                                    make_ep_pack_train_step, make_mesh)
            mesh = make_mesh(n_dp=self.n_dp, n_ep=self.n_ep,
                             devices=jax.devices()[:ndev])
            self._mesh = mesh
            # the EP steps are keyed on the loader's (static) EPPackSpec;
            # pin growth mid-run changes the spec -> rebuild (the shapes
            # changed anyway, so the recompile is already being paid)
            steps: dict = {}

            def ep_step(state, item):
                spec, batch = item      # EPPackLoader yields (spec, batch)
                if ("t", spec) not in steps:
                    steps[("t", spec)] = make_ep_pack_train_step(
                        optimizer, cfg, mesh, spec)
                return steps[("t", spec)](state, batch)

            def ep_eval(params, item):
                spec, batch = item
                if ("e", spec) not in steps:
                    steps[("e", spec)] = make_ep_pack_eval_step(
                        cfg, mesh, spec)
                return steps[("e", spec)](params, batch)

            self._train_step = ep_step
            self._train_chunk = None
            self._eval_step = ep_eval
            if self.device_epoch:
                # the epoch scan is keyed on the loader's final spec, which
                # is only known after the reuse cache stabilizes -> built
                # lazily in _stage_epoch_on_device
                self._ep_de_ctx = (optimizer, cfg, mesh)
                self._epoch_scan = None
                self._epoch_dev = None
            return

        # the loader fixes the pack count; the model needs it for Pallas
        step_spec = self.train_loader.spec

        if self.log_histograms:
            # eval-mode grads of one sampled batch (dropout off: the
            # histogram should show the loss surface, not one mask draw)
            self._hist_grads = jax.jit(lambda p, bb: jax.value_and_grad(
                sse_loss)(p, bb, cfg, False, None, step_spec)[1])

        if self.n_dp > 1:
            from ..parallel import (make_dp_eval_step, make_dp_train_step,
                                    make_mesh)
            mesh = make_mesh(n_dp=self.n_dp, n_ep=1,
                             devices=jax.devices()[:self.n_dp])
            self._mesh = mesh
            dp_step = make_dp_train_step(optimizer, cfg, mesh,
                                         spec=step_spec)
            dp_eval = make_dp_eval_step(cfg, mesh, spec=step_spec)
            self._train_step = dp_step
            self._train_chunk = None
            self._eval_step = lambda params, stacked: (dp_eval(params,
                                                               stacked),
                                                       None)
            if self.device_epoch:
                from ..parallel import make_dp_epoch_scan
                self._epoch_scan = make_dp_epoch_scan(optimizer, cfg, mesh,
                                                      spec=step_spec)
                self._epoch_dev = None
            return

        use_fused_train = supports_fused_train(cfg)

        @jax.jit
        def _train_step(state: TrainState, batch: PackedGraphBatch):
            rng, sub = jax.random.split(state.rng)
            if use_fused_train:
                # one-kernel loss+grads (ops/pallas_model.fused_model_train)
                loss, grads = fused_train_value_and_grad(
                    state.params, batch, cfg, step_spec, sub)
            else:
                loss, grads = jax.value_and_grad(sse_loss)(
                    state.params, batch, cfg, True, sub, step_spec)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            params = optax.apply_updates(state.params, updates)
            gnorm = optax.global_norm(grads)
            return TrainState(params, opt_state, state.step + 1, rng), \
                loss, gnorm

        @jax.jit
        def _eval_step(params, batch: PackedGraphBatch):
            preds = apply(params, batch, cfg, step_spec, train=False)
            err = (preds - batch.labels) * batch.graph_mask
            return jnp.sum(err * err), preds

        @jax.jit
        def _train_chunk(state: TrainState, stacked: PackedGraphBatch):
            def body(s, b):
                s2, loss, gnorm = _train_step(s, b)
                return s2, (loss, gnorm)
            state, (losses, gnorms) = jax.lax.scan(body, state, stacked)
            return state, losses, gnorms[-1]

        @jax.jit
        def _epoch_scan(state: TrainState, stacked: PackedGraphBatch,
                        perm: jax.Array):
            """One whole epoch: scan over an index permutation into the
            device-resident stacked epoch (leaves [S, ...])."""
            def body(st, idx):
                b = jax.tree_util.tree_map(
                    lambda v: jax.lax.dynamic_index_in_dim(
                        v, idx, 0, keepdims=False), stacked)
                s2, loss, gnorm = _train_step(st, b)
                return s2, (loss, gnorm)
            state, (losses, gnorms) = jax.lax.scan(body, state, perm)
            return state, losses, gnorms[-1]

        self._train_step = _train_step
        self._train_chunk = _train_chunk
        self._epoch_scan = _epoch_scan
        self._eval_step = _eval_step
        self._epoch_dev = None        # device-staged stacked epoch cache

    # -- checkpointing ----------------------------------------------------
    def _ckpt_meta(self) -> dict:
        return {
            "name": self.name,
            "model": {
                "num_node_features": self.cfg.num_node_features,
                "num_edge_features": self.cfg.num_edge_features,
                "depth": self.cfg.depth,
                "hidden_sizes": list(self.cfg.hidden_sizes),
                "dropout_ps": list(self.cfg.dropout_ps),
                "activation": self.cfg.activation,
                "aggr": self.cfg.aggr,
                "pooling": self.cfg.pooling,
                "use_learnable_skip": self.cfg.use_learnable_skip,
            },
            "best_val_loss": self.best_val_loss,
            "epoch": self._epoch_done,
        }

    def save(self, path: str | Path, mid_epoch: tuple | None = None) -> Path:
        meta = self._ckpt_meta()
        if mid_epoch is not None:
            # (epoch in progress, successful steps completed within it)
            meta["mid_epoch"] = {"epoch": mid_epoch[0],
                                 "steps_done": mid_epoch[1]}
        if self._nproc > 1:
            # every process holds the same replicated state; only the
            # primary writes, and the barrier guarantees a complete file
            # before any process proceeds (e.g. to resume or eval it)
            from ..parallel import multihost
            if multihost.is_primary():
                save_checkpoint(path, self.state, meta)
            multihost.sync_global_devices("ckpt")
            return Path(path)
        return save_checkpoint(path, self.state, meta)

    def _resume(self, path: str) -> None:
        leaves, meta = load_checkpoint(path)
        self.state = restore_into(self.state, leaves)
        self.best_val_loss = float(meta.get("best_val_loss", np.inf))
        self.start_epoch = int(meta.get("epoch", -1)) + 1
        mid = meta.get("mid_epoch")
        if mid:
            # re-enter the interrupted epoch; _train_epoch fast-forwards
            # the (deterministic) loader past the completed steps
            self.start_epoch = int(mid["epoch"])
            self._skip_steps = int(mid["steps_done"])

    # -- epochs -----------------------------------------------------------
    def _dp_group(self, it, spec):
        """Group per-device batches into stacked n_dp-step batches; a short
        final group pads with all-masked empty batches."""
        from ..data.batch import empty_batch
        from ..parallel import stack_batches
        group = []
        for b in it:
            group.append(b)
            if len(group) == self.n_dp:
                yield stack_batches(group)
                group = []
        if group:
            filler = empty_batch(spec, self.train_data.num_node_features,
                                 self.train_data.num_edge_features)
            group += [filler] * (self.n_dp - len(group))
            yield stack_batches(group)

    def _mh_stream(self, loader):
        """Multi-process batch stream: every process walks the SAME
        deterministic global batch sequence (same data, same seed) but
        packs and device_puts ONLY the sub-batches its local mesh cells
        own; ``multihost.globalize_group`` assembles them into the global
        jax.Array the shard_map'd step expects, so a multi-host run
        computes exactly the single-process update (asserted by
        tests/test_multiprocess.py driving this trainer across 2 OS
        processes).

        * dp (``n_ep == 1``): window-granular host sharding — every
          process computes the identical window/carry plan with the
          placement-only probe (``PackedLoader.plan_windows``: the exact
          shrink-and-carry semantics of serial iteration at probe cost,
          no packing), then packs only the windows mapped to its dp
          positions.  With ``reuse_packs`` the per-epoch batch-order
          reshuffle migrates cached batches across hosts, so the cache
          is built host-global (one redundant epoch of packing per host,
          amortized over the run) and only local cells ship each step.
        * ep: the edge-partition plan is a global decision
          (pack_shard_edges assigns whole graphs to shards and learns the
          pinned spec) — each process computes the full group identically
          and ships its local (dp, ep) cells.
        """
        from ..data.batch import empty_batch
        from ..parallel import multihost
        local = multihost.local_mesh_cells(self._mesh)
        if self.n_ep > 1:
            for spec, stacked in loader.prefetch():
                cells = {c: jax.tree_util.tree_map(
                    lambda v, c=c: v[c[0], c[1]], stacked) for c in local}
                yield spec, multihost.globalize_group(self._mesh, cells)
            return
        local_pos = [i for (i, _j) in local]
        if loader.reuse_packs:
            for stacked in self._dp_group(loader.prefetch(), loader.spec):
                cells = {(i, 0): jax.tree_util.tree_map(
                    lambda v, i=i: v[i], stacked) for i in local_pos}
                yield multihost.globalize_group(self._mesh, cells,
                                                joint_dp_ep=True)
            return
        # every process computes the identical window/carry plan with the
        # placement-only probe (overflow shrink included — at bs-64 with
        # te=128 tiles shrinking is the NORM), then packs only its own
        # windows
        plan = loader.plan_windows(loader._order())
        n_groups = int(np.ceil(len(plan) / self.n_dp))
        filler = None
        for g in range(n_groups):
            cells = {}
            for i in local_pos:
                w = g * self.n_dp + i
                if w < len(plan):
                    b, used = loader._pack_window(list(plan[w]))
                    if used != len(plan[w]):
                        # must stay loud under python -O: a short pack on
                        # ONE host silently drops rows and diverges the
                        # processes' training data
                        raise RuntimeError(
                            f"window plan disagrees with the packer "
                            f"(planned {len(plan[w])} rows, packed "
                            f"{used}) — probe/packer drift")
                else:
                    if filler is None:
                        filler = empty_batch(
                            loader.spec,
                            loader.dataset.num_node_features,
                            loader.dataset.num_edge_features)
                    b = filler
                cells[(i, 0)] = b
            yield multihost.globalize_group(self._mesh, cells,
                                            joint_dp_ep=True)

    def _stage_epoch_on_device(self):
        """Stack the loader's (reuse_packs) epoch cache into device arrays
        [S, ...] (dp: [S, n_dp, ...] sharded over the mesh) — built once,
        reused by every scanned epoch."""
        if self._epoch_dev is None:
            self.train_loader.set_epoch(0)
            if self.n_dp == 1 and self.n_ep == 1:
                # single-device: stage in RAW cache order — the scan
                # applies each epoch's permutation itself, so staging a
                # shuffled iteration would compose two permutations and
                # diverge from the host-looped path.  (dp/ep stage the
                # epoch-0 iteration instead: their groups must match the
                # host path's epoch-0 grouping, and epoch 0 then runs an
                # identity permutation — see _train_epoch_device.)
                # One next() builds the cache with the loader's own
                # shuffle settings (composition must match the host path);
                # the full read then happens in cache order.
                next(iter(self.train_loader), None)
                sav_shuffle = self.train_loader.shuffle
                self.train_loader.shuffle = False
                try:
                    batches = list(self.train_loader)
                finally:
                    self.train_loader.shuffle = sav_shuffle
            else:
                batches = list(self.train_loader)  # builds/reuses cache
            if self.n_ep > 1:
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P

                from ..parallel.ep_pack import make_ep_pack_epoch_scan
                spec0 = batches[0][0]
                assert all(sp == spec0 for sp, _ in batches), \
                    "reuse_packs cache must have stabilized to one spec"
                stacked = jax.tree_util.tree_map(
                    lambda *xs: np.stack([np.asarray(x) for x in xs], 0),
                    *[b for _, b in batches])
                opt, cfg_, mesh_ = self._ep_de_ctx
                self._epoch_scan = make_ep_pack_epoch_scan(opt, cfg_,
                                                           mesh_, spec0)
                if self._nproc > 1:
                    from ..parallel import multihost
                    dev = multihost.globalize_epoch(self._mesh, stacked)
                else:
                    sh = NamedSharding(self._mesh, P(None, "dp", "ep"))
                    dev = jax.device_put(stacked, sh)
                self._epoch_dev = (dev, len(batches))
            elif self.n_dp > 1:
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P
                groups = list(self._dp_group(iter(batches),
                                             self.train_loader.spec))
                stacked = jax.tree_util.tree_map(
                    lambda *xs: np.stack([np.asarray(x) for x in xs], 0),
                    *groups)
                if self._nproc > 1:
                    from ..parallel import multihost
                    dev = multihost.globalize_epoch(self._mesh, stacked,
                                                    joint_dp_ep=True)
                else:
                    sh = NamedSharding(self._mesh, P(None, ("dp", "ep")))
                    dev = jax.device_put(stacked, sh)
                self._epoch_dev = (dev, len(groups))
            else:
                stacked = jax.tree_util.tree_map(
                    lambda *xs: np.stack([np.asarray(x) for x in xs], 0),
                    *batches)
                self._epoch_dev = (jax.device_put(stacked), len(batches))
        return self._epoch_dev

    def _train_epoch_device(self, epoch_idx: int) -> float:
        """device_epoch path: ONE dispatch for the whole epoch."""
        import time as _time
        stacked, S = self._stage_epoch_on_device()
        # identical batch order to the loader's reuse-epoch shuffle; on the
        # dp/ep meshes the STAGED order already is the epoch-0 iteration
        # (groups must match the host path's epoch-0 grouping), so epoch 0
        # runs the identity and later epochs shuffle group order
        order = np.arange(S)
        mesh_mode = self.n_dp > 1 or self.n_ep > 1
        if self.train_loader.shuffle and not (mesh_mode and epoch_idx == 0):
            rng = np.random.default_rng(self.train_loader.seed + epoch_idx)
            rng.shuffle(order)
        t0 = _time.perf_counter()
        new_state, losses, gnorm = self._epoch_scan(
            self.state, stacked, jnp.asarray(order, jnp.int32))
        losses = np.asarray(losses)
        elapsed = _time.perf_counter() - t0
        if not np.isfinite(losses).all():
            # epoch-granular NaN guard: the new state is discarded (the
            # whole epoch rolls back).  No retry: the scan is
            # deterministic, so re-running would reproduce the same NaN —
            # unlike the host path, whose per-step rollback continues on
            # DIFFERENT subsequent batches.
            msg = {"event": "non_finite_loss", "epoch": epoch_idx,
                   "scope": "device_epoch (epoch rolled back)"}
            (self.logger.log(msg) if self.logger else print(msg))
            raise FloatingPointError(
                f"non-finite loss inside scanned epoch {epoch_idx}; "
                f"state rolled back to epoch start (checkpoint intact)")
        self.state = new_state
        self._timer.reset_epoch()
        self._timer.tick_many(S, elapsed)
        total = float(losses.sum())
        rmse = float(np.sqrt(total / len(self.train_data)))
        if self.logger:
            rec = {"train_loss": rmse, "epoch": epoch_idx,
                   **self._timer.stats()}
            if self.log_param_norms:
                rec["param_norm"] = float(
                    optax.global_norm(self.state.params))
                rec["grad_norm"] = float(gnorm)
            self.logger.log(rec)
        if self.log_histograms and self.logger:
            sample = None
            if self._hist_grads is not None and self._nproc == 1:
                b0 = jax.tree_util.tree_map(lambda v: v[0], stacked)
                if self.n_dp > 1 and self.n_ep == 1:
                    b0 = jax.tree_util.tree_map(lambda v: v[0], b0)
                sample = b0
            self._emit_histograms(epoch_idx, sample)
        return rmse

    def _train_epoch(self, epoch_idx: int) -> float:
        if self.device_epoch:
            return self._train_epoch_device(epoch_idx)
        state = self.state
        total = 0.0
        self.train_loader.set_epoch(epoch_idx)
        self._timer.reset_epoch()
        bad = 0
        last_good = state
        gnorm = None

        def batch_stream():
            """Yield (stacked_chunk_or_batch, n_steps, sum_loss_fn)."""
            K = max(1, self.steps_per_call)
            if self._nproc > 1:
                for b in self._mh_stream(self.train_loader):
                    yield b, 1
                return
            src = self.train_loader.prefetch()
            if self.n_dp > 1 and self.n_ep == 1:
                src = self._dp_group(src, self.train_loader.spec)
            pend: list[PackedGraphBatch] = []
            for b in src:
                if K == 1:
                    yield b, 1
                    continue
                pend.append(b)
                if len(pend) == K:
                    yield jax.tree_util.tree_map(
                        lambda *xs: np.stack(xs, 0), *pend), K
                    pend = []
            for b in pend:       # remainder: single steps
                yield b, 1

        skip = self._skip_steps if epoch_idx == self.start_epoch else 0
        if skip:
            msg = {"event": "resume_mid_epoch", "epoch": epoch_idx,
                   "skipping_steps": skip}
            (self.logger.log(msg) if self.logger else print(msg))
        steps_done = 0
        hist_sample = None
        for batch, n_steps in batch_stream():
            if steps_done + n_steps <= skip:
                # fast-forward the deterministic loader past steps already
                # trained before the mid-epoch checkpoint
                steps_done += n_steps
                continue
            if (self.log_histograms and hist_sample is None
                    and self.n_ep == 1 and self._nproc == 1):
                b0 = batch
                if n_steps > 1:
                    b0 = jax.tree_util.tree_map(lambda v: v[0], b0)
                if self.n_dp > 1:
                    b0 = jax.tree_util.tree_map(lambda v: v[0], b0)
                hist_sample = b0
            if n_steps > 1:
                new_state, losses, gnorm = self._train_chunk(state, batch)
                loss = jnp.sum(losses)
            else:
                new_state, loss, gnorm = self._train_step(state, batch)
            loss_f = float(loss)
            if not np.isfinite(loss_f):
                # NaN/inf guard (reference has none, SURVEY.md §5): drop the
                # poisoned update, roll back, count consecutive failures
                bad += 1
                msg = {"event": "non_finite_loss", "epoch": epoch_idx,
                       "consecutive": bad}
                (self.logger.log(msg) if self.logger else print(msg))
                if bad >= self.max_bad_steps:
                    raise FloatingPointError(
                        f"{bad} consecutive non-finite losses at epoch "
                        f"{epoch_idx}; aborting (last checkpoint is intact)")
                state = last_good
                continue
            bad = 0
            state, last_good = new_state, new_state
            total += loss_f
            self._timer.tick()
            steps_done += n_steps
            if self.ckpt_every_steps and (
                    steps_done // self.ckpt_every_steps
                    > (steps_done - n_steps) // self.ckpt_every_steps):
                self.state = state
                self.save(Path(self.model_save_dir)
                          / f"{self.name}.latest.npz",
                          mid_epoch=(epoch_idx, steps_done))
        self._skip_steps = 0
        self.state = state
        rmse = float(np.sqrt(total / len(self.train_data)))
        if self.logger:
            rec = {"train_loss": rmse, "epoch": epoch_idx,
                   **self._timer.stats()}
            if self.log_param_norms:
                rec["param_norm"] = float(optax.global_norm(state.params))
                if gnorm is not None:
                    rec["grad_norm"] = float(gnorm)
            self.logger.log(rec)
        else:
            print(f"\n______epoch {epoch_idx}\nTrain loss, RMSE: {rmse:.4f}")
        if self.log_histograms and self.logger:
            self._emit_histograms(epoch_idx, hist_sample)
        return rmse

    def _emit_histograms(self, epoch_idx: int, sample_batch) -> None:
        """wandb watch(log='all') parity (wandb_logger.py:41-49): per-layer
        param histograms every epoch, plus gradient histograms from one
        sampled batch (eval-mode) when a host-addressable sample exists."""
        self.logger.log_histograms("params", self.state.params, epoch_idx)
        if sample_batch is not None and self._hist_grads is not None:
            grads = self._hist_grads(self.state.params, sample_batch)
            self.logger.log_histograms("grads", grads, epoch_idx)

    def _val_epoch(self, epoch_idx: int) -> float:
        total = 0.0
        if self._nproc > 1:
            batches = self._mh_stream(self.val_loader)
        else:
            batches = self.val_loader.prefetch()
            if self.n_dp > 1 and self.n_ep == 1:
                batches = self._dp_group(batches, self.val_loader.spec)
        for batch in batches:
            sse, _ = self._eval_step(self.state.params, batch)
            total += float(sse)
        rmse = float(np.sqrt(total / len(self.val_data)))
        if self.logger:
            self.logger.log({"val_loss": rmse, "epoch": epoch_idx})
        else:
            print(f"Val loss, RMSE: {rmse:.4f}\n")
        return rmse

    def train(self) -> dict:
        """Full loop; returns {'train_losses': [...], 'val_losses': [...]}
        (trainer.py:185-217)."""
        out = {"train_losses": [], "val_losses": []}
        save_dir = Path(self.model_save_dir)
        save_dir.mkdir(parents=True, exist_ok=True)
        self._epoch_done = self.start_epoch - 1
        t0 = time.time()
        for epoch in range(self.start_epoch, self.num_epochs):
            # per-epoch ExponentialLR parity (reference trainer.py:212)
            self.state = self.state._replace(opt_state=set_epoch_lr(
                self.state.opt_state, self.lr, self.gamma, epoch))
            out["train_losses"].append(self._train_epoch(epoch))
            self._epoch_done = epoch
            if epoch % self.val_frequency == 0 or epoch == self.num_epochs - 1:
                val = self._val_epoch(epoch)
                out["val_losses"].append(val)
                if val < self.best_val_loss:
                    self.best_val_loss = val
                    path = self.save(save_dir / f"{self.name}.npz")
                    if self._nproc == 1 or jax.process_index() == 0:
                        print(f"New best model with validation loss RMSE: "
                              f"{self.best_val_loss:.4f} located at {path}")
            # latest state for resume
            self.save(save_dir / f"{self.name}.latest.npz")
        out["train_time_s"] = time.time() - t0
        if self.logger:
            self.logger.finish()
        return out
