"""Train CLI — mirrors the reference's train.py:143-320 flag surface.

Usage:
  python -m cgr_mpnn_3d_tpu.cli.train --name CGR -d 4 --hidden_sizes 400 400 400 400 \\
      --dropout_ps 0.1 0.1 0.1 0.1 -af ReLU -lr 1e-4 -ne 50 --weight_decay 1e-5 \\
      -bs 64 -g 0.9 --data_path datasets

Dispatch on the model name (CGR = 2D only, CGR-MPNN-3D = +MACE npz) matches
train.py:78-96; after training the model is evaluated on the test split and
results are merged into hyperparameter_study/<name>_hyperparameter_study.json
(train.py:311-320).  Bugs in the reference CLI are fixed, not replicated:
``--learnable_skip`` actually works (train.py:248 compared a bool to 'True')
and ``--use_logger`` absent no longer crashes the metadata print
(train.py:281 NameError).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def build_arg_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        description="CLI tool for training the CGR MPNN 3D Graph Neural "
                    "Network (TPU-native).")
    ap.add_argument("-n", "--name", default="CGR",
                    choices=["CGR", "CGR-MPNN-3D"],
                    help="Type of the model to be trained")
    ap.add_argument("-d", "--depth", default=3, type=int)
    ap.add_argument("--hidden_sizes", default=None, nargs="+", type=int)
    ap.add_argument("--dropout_ps", default=None, nargs="+", type=float)
    ap.add_argument("-af", "--activation_fn", default="ReLU",
                    choices=["ReLU", "SiLU", "GELU"])
    ap.add_argument("--aggr", default="add", choices=["add", "mean"],
                    help="D-MPNN aggregation (GNN.py DMPNNConv aggr)")
    ap.add_argument("--pooling", default="add", choices=["add", "mean"],
                    help="graph pooling (GNN.py pooling_fn: "
                         "global_add_pool / global_mean_pool)")
    ap.add_argument("--save_path", default="saved_models")
    ap.add_argument("--learnable_skip", action="store_true")
    ap.add_argument("-lr", "--learning_rate", default=1e-3, type=float)
    ap.add_argument("-ne", "--num_epochs", default=30, type=int)
    ap.add_argument("--weight_decay", default=0.0, type=float)
    ap.add_argument("-bs", "--batch_size", default=32, type=int)
    ap.add_argument("-g", "--gamma", default=1.0, type=float)
    ap.add_argument("--data_path", default="datasets")
    ap.add_argument("--seed", default=0, type=int)
    ap.add_argument("--val_frequency", default=5, type=int)
    ap.add_argument("--resume", default=None,
                    help="checkpoint to resume from (upgrade over reference)")
    ap.add_argument("--use_logger", action="store_true",
                    help="log to wandb if available (JSONL always written)")
    ap.add_argument("--log_histograms", action="store_true",
                    help="wandb watch(log='all') equivalent "
                         "(wandb_logger.py:41-49): per-layer param + "
                         "sampled-gradient histograms once per epoch, to "
                         "JSONL (and wandb Histogram when attached)")
    ap.add_argument("--compute_dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--pack_te", default=256, type=int)
    ap.add_argument("--pack_tn", default=128, type=int)
    ap.add_argument("--pack_tb", default=16, type=int)
    ap.add_argument("--pack_q", default=1, type=int,
                    help="sub-packs fused per Pallas grid step (te=128/q=4 "
                         "is ~16%% faster than te=256/q=1 on v5e; pack "
                         "count rounds up to a q multiple)")
    ap.add_argument("--skip_test", action="store_true")
    ap.add_argument("--num_workers", default=None, type=int,
                    help="featurization threads (reference trainer.py:99 "
                         "default: half the CPUs)")
    ap.add_argument("--dp", default=1, type=int,
                    help="data-parallel devices: each processes "
                         "batch_size/dp graphs per step, gradients psum "
                         "over the mesh (ICI on a slice, DCN across hosts "
                         "with jax.distributed)")
    ap.add_argument("--ep", default=1, type=int,
                    help="edge-partition devices: each batch's edge arrays "
                         "are sharded over ep chips in pack-local layout "
                         "(one-hot SpMM kernels + cut-bounded ring boundary "
                         "exchange over ICI — the graph analog of context "
                         "parallelism); composes with --dp as a "
                         "('dp','ep') mesh of dp*ep devices")
    ap.add_argument("--ep_te", default=128, type=int,
                    help="EP pack tile: edge slots per pack (auto-grows "
                         "when a shard-local graph fragment exceeds it)")
    ap.add_argument("--ckpt_every_steps", default=0, type=int,
                    help="preemption safety: save {name}.latest.npz every "
                         "N successful train steps within an epoch; "
                         "--resume fast-forwards the deterministic loader "
                         "and continues bit-identically (0 = per-epoch)")
    ap.add_argument("--ep_rdma", action="store_true",
                    help="--ep boundary exchange as one Pallas kernel of "
                         "concurrent inter-chip RDMAs instead of the "
                         "ppermute ring (TPU only; "
                         "parallel/rdma_exchange.py)")
    ap.add_argument("--ep_overlap", action="store_true",
                    help="--ep wired layers overlap the ring boundary "
                         "exchange with the main conv kernel (the "
                         "cut-bounded correction is applied after, in "
                         "XLA); wireless batches are unaffected (they "
                         "already run the one-kernel step)")
    ap.add_argument("--ep_tn", default=72, type=int,
                    help="EP pack tile: node slots per pack")
    ap.add_argument("--loader_workers", default=1, type=int,
                    help="parallel packing threads in the host input "
                         "pipeline (~1 per 2 host vCPUs)")
    ap.add_argument("--reuse_packs", action="store_true",
                    help="pack each epoch once and reuse across epochs "
                         "(batch-order shuffle; kills host packing cost "
                         "from epoch 2 on)")
    ap.add_argument("--device_epoch", action="store_true",
                    help="stage the reused pack cache on the chip and run "
                         "each epoch as ONE jitted lax.scan (zero per-step "
                         "host dispatch; requires --reuse_packs). On "
                         "--dp/--ep meshes the epoch-0 batch-to-group "
                         "assignment is frozen and later epochs shuffle "
                         "GROUP order only (coarser than the host-looped "
                         "path's batch-order reshuffle+regroup); epoch 0 "
                         "is bit-exact, later epochs are statistically "
                         "equivalent")
    ap.add_argument("--steps_per_call", default=1, type=int,
                    help="train steps per device dispatch (lax.scan); >1 "
                         "amortizes host round-trip latency BUT coarsens "
                         "the NaN guard to chunk granularity (a bad batch "
                         "rolls back the whole K-step chunk)")
    return ap


def run_name(args) -> str:
    """Config-encoding run name (train.py:241-255)."""
    return "_".join([
        args.name,
        f"d-{args.depth}",
        "h-" + "-".join(str(i) for i in args.hidden_sizes),
        "p-" + "-".join(str(i) for i in args.dropout_ps),
        args.activation_fn,
        f"s-{'t' if args.learnable_skip else 'f'}",
        f"l-{args.learning_rate}",
        f"e-{args.num_epochs}",
        f"w-{args.weight_decay}",
        f"b-{args.batch_size}",
        f"g-{args.gamma}",
    ])


def train(args) -> dict:
    # multi-host: no-op single-process; on a pod slice every host runs
    # this same CLI and the coordinator comes from the standard env vars
    # (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) or
    # TPU metadata.  Must run before any device query.
    from ..parallel import multihost
    multihost.initialize()

    import jax.numpy as jnp

    from ..data import ChemDataset, plan_spec
    from ..models import CGRMPNNConfig
    from ..train import MetricsLogger, RxnGraphTrainer

    data_path = Path(args.data_path)
    train_csv = data_path / "train.csv"
    val_csv = data_path / "val.csv"
    missing = [s for s, p in [("train", train_csv), ("val", val_csv)]
               if not p.exists()]
    if missing:
        from ..data.preprocess import PreProcessTransition1x
        PreProcessTransition1x(
            fpath_processed=str(data_path)).start_data_acquisition(missing)

    if args.name == "CGR":
        train_data = ChemDataset(str(train_csv))
        val_data = ChemDataset(str(val_csv))
    else:  # CGR-MPNN-3D
        train_data = ChemDataset(str(train_csv),
                                 data_npz_path=str(data_path / "train.npz"))
        val_data = ChemDataset(str(val_csv),
                               data_npz_path=str(data_path / "val.npz"))

    from ..utils.platform import maybe_enable_pallas
    cfg = CGRMPNNConfig(
        num_node_features=train_data.num_node_features,
        num_edge_features=train_data.num_edge_features,
        depth=args.depth,
        hidden_sizes=tuple(args.hidden_sizes),
        dropout_ps=tuple(args.dropout_ps),
        activation=args.activation_fn,
        aggr=args.aggr,
        pooling=args.pooling,
        use_learnable_skip=args.learnable_skip,
        compute_dtype=jnp.bfloat16 if args.compute_dtype == "bfloat16"
        else jnp.float32,
        pallas_sub_packs=args.pack_q,
        ep_rdma_exchange=bool(args.ep_rdma),
        ep_overlap=bool(args.ep_overlap),
    )
    cfg = maybe_enable_pallas(cfg)  # TPU: one-hot SpMM kernels
    if args.ep_rdma:
        from ..utils.platform import is_tpu
        if not is_tpu():
            # the RDMA kernel needs real ICI (or the TPU interpreter, which
            # the tests drive); off-TPU runs keep the ppermute ring
            print("--ep_rdma ignored off-TPU (ppermute ring used)")
            from dataclasses import replace
            cfg = replace(cfg, ep_rdma_exchange=False)

    import os as _os
    workers = args.num_workers if args.num_workers is not None \
        else max(1, (_os.cpu_count() or 2) // 2)
    print(f"Featurizing training set ({workers} workers)...")
    train_data.prefeaturize(num_workers=workers, cache=True)
    val_data.prefeaturize(num_workers=workers, cache=True)
    graphs = [train_data.graph(i) for i in range(len(train_data))]
    spec = plan_spec(graphs, te=args.pack_te, tn=args.pack_tn,
                     tb=args.pack_tb)

    name = run_name(args)
    # metrics (JSONL + wandb) are written by the primary process only —
    # every process computes identical replicated losses, so non-primary
    # logs would be duplicates
    logger = (MetricsLogger(name, config=vars_config(args),
                            use_wandb=args.use_logger)
              if multihost.is_primary() else None)
    trainer = RxnGraphTrainer(
        name=name, cfg=cfg, train_data=train_data, val_data=val_data,
        spec=spec, lr=args.learning_rate, weight_decay=args.weight_decay,
        gamma=args.gamma, num_epochs=args.num_epochs,
        batch_size=args.batch_size, val_frequency=args.val_frequency,
        model_save_dir=args.save_path, seed=args.seed, logger=logger,
        log_histograms=args.log_histograms,
        resume_from=args.resume, steps_per_call=args.steps_per_call,
        loader_workers=args.loader_workers, reuse_packs=args.reuse_packs,
        device_epoch=args.device_epoch,
        n_dp=args.dp, n_ep=args.ep, ep_te=args.ep_te,
        ep_tn=args.ep_tn, ckpt_every_steps=args.ckpt_every_steps)
    return trainer.train()


def vars_config(args) -> dict:
    return {
        "depth": args.depth, "hidden_sizes": args.hidden_sizes,
        "dropout_ps": args.dropout_ps, "activation_fn": args.activation_fn,
        "learnable_skip": args.learnable_skip, "lr": args.learning_rate,
        "num_epochs": args.num_epochs, "weight_decay": args.weight_decay,
        "batch_size": args.batch_size, "gamma": args.gamma,
    }


def main(argv=None) -> None:
    args = build_arg_parser().parse_args(argv)
    if args.hidden_sizes is None:
        args.hidden_sizes = [300] * args.depth
    if args.dropout_ps is None:
        args.dropout_ps = [0.02] * args.depth
    if len(args.hidden_sizes) == 1:
        args.hidden_sizes = args.hidden_sizes * args.depth
    if len(args.dropout_ps) == 1:
        args.dropout_ps = args.dropout_ps * args.depth

    name = run_name(args)
    meta = {name: {"metadata": vars_config(args)}}
    print("Metadata of the training:")
    for k, v in vars_config(args).items():
        print(f"{k}: {v}")

    train_result = train(args)
    meta[name].update(**{k: v for k, v in train_result.items()})

    from ..parallel import multihost
    if not multihost.is_primary():
        return  # test/eval + result persistence are primary-only

    if not args.skip_test:
        from .test import test
        test_result = test(args.name, f"{args.save_path}/{name}.npz",
                           data_path=args.data_path, plot_results=False)
        meta[name].update(**{k: float(v) for k, v in test_result.items()
                             if np.isscalar(v)})

    from ..utils import json_dumper
    out_dir = Path("hyperparameter_study")
    out_dir.mkdir(parents=True, exist_ok=True)
    json_dumper(str(out_dir / f"{args.name}_hyperparameter_study.json"), meta)
    print(json.dumps({k: v for k, v in meta[name].items()
                      if k != "metadata"}, default=str, indent=2))


if __name__ == "__main__":
    main()
