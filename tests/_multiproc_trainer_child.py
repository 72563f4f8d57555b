"""Child program for the 2-process SHIPPED-TRAINER test (test_multiprocess).

Unlike _multiproc_child.py (which hand-drives the shard_map steps), this
child runs ``RxnGraphTrainer`` itself — the exact object cli/train.py
constructs — across 2 OS processes x 2 local devices, in seven phases:

  dp       n_dp=4 flat data parallelism, window-granular host sharding
  dpreuse  n_dp=4 + reuse_packs (host-global cache, local cells shipped)
  dpep     n_dp=2 x n_ep=2 composed mesh through EPPackLoader
  dpde     n_dp=4 + reuse_packs + device_epoch (globalize_epoch staging)
  dpepde   composed mesh + device_epoch
  dpresume resume from the dp phase's primary-written checkpoint
  dpcarry  TIGHT spec: the window plan's shrink-and-carry across hosts

Each phase prints TRAIN/VAL loss lists and a final-param checksum; the
parent asserts equality across processes AND against the single-process
trainer on the same data/seed.
"""

import json
import os
import sys

proc_id = int(sys.argv[1])
port = sys.argv[2]
data_dir = sys.argv[3]
out_dir = sys.argv[4]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from cgr_mpnn_3d_tpu.parallel import multihost  # noqa: E402

multihost.initialize(coordinator_address=f"localhost:{port}",
                     num_processes=2, process_id=proc_id)
assert jax.process_count() == 2
assert jax.device_count() == 4 and len(jax.local_devices()) == 2

import jax.numpy as jnp  # noqa: E402  (after distributed init)

from cgr_mpnn_3d_tpu.data import ChemDataset, plan_spec  # noqa: E402
from cgr_mpnn_3d_tpu.models import CGRMPNNConfig  # noqa: E402
from cgr_mpnn_3d_tpu.train import RxnGraphTrainer  # noqa: E402


def checksum(params) -> float:
    return float(sum(float(jnp.sum(jnp.abs(leaf)))
                     for leaf in jax.tree_util.tree_leaves(params)))


def run_phase(phase: str) -> dict:
    train_data = ChemDataset(os.path.join(data_dir, "train.csv"))
    val_data = ChemDataset(os.path.join(data_dir, "val.csv"))
    cfg = CGRMPNNConfig(num_node_features=78, num_edge_features=14,
                        depth=2, hidden_sizes=(16, 16),
                        dropout_ps=(0.0, 0.0))
    graphs = [train_data.graph(i) for i in range(len(train_data))]
    if phase == "dpcarry":
        # deliberately TIGHT spec: windows overflow, shrink and carry —
        # the multi-host window plan must reproduce the single-process
        # carry exactly (trainer._mh_stream via plan_windows)
        spec = plan_spec(graphs, te=8, tn=8, tb=2)
    else:
        spec = plan_spec(graphs, te=64, tn=48, tb=2)
    kw = dict(name=f"mh-{phase}", cfg=cfg, train_data=train_data,
              val_data=val_data, spec=spec, lr=1e-3, num_epochs=2,
              val_frequency=1, seed=0,
              model_save_dir=os.path.join(out_dir, phase))
    if phase == "dp":
        kw.update(n_dp=4, batch_size=8)
    elif phase == "dpreuse":
        kw.update(n_dp=4, batch_size=8, reuse_packs=True, num_epochs=3)
    elif phase == "dpep":
        kw.update(n_dp=2, n_ep=2, batch_size=4, ep_te=64, ep_tn=48)
    elif phase == "dpde":
        # --device_epoch across processes: the staged epoch goes through
        # multihost.globalize_epoch (joint dp layout)
        kw.update(n_dp=4, batch_size=8, reuse_packs=True,
                  device_epoch=True, num_epochs=2)
    elif phase == "dpepde":
        # composed dp x ep mesh + device_epoch + 2 OS processes
        kw.update(n_dp=2, n_ep=2, batch_size=4, ep_te=64, ep_tn=48,
                  reuse_packs=True, device_epoch=True, num_epochs=2)
    elif phase == "dpresume":
        # resume across processes: the primary-written checkpoint of the
        # dp phase (barrier-synced) restores identically on EVERY process
        # and training continues to single-process equality
        kw.update(n_dp=4, batch_size=8, num_epochs=3,
                  resume_from=os.path.join(out_dir, "dp",
                                           "mh-dp.latest.npz"))
    elif phase == "dpcarry":
        kw.update(n_dp=4, batch_size=8)
    else:
        raise ValueError(phase)
    tr = RxnGraphTrainer(**kw)
    out = tr.train()
    return {"train": out["train_losses"], "val": out["val_losses"],
            "checksum": checksum(tr.state.params)}


results = {ph: run_phase(ph)
           for ph in ("dp", "dpreuse", "dpep", "dpde", "dpepde",
                      "dpresume", "dpcarry")}
multihost.sync_global_devices("done")
print("RESULT " + json.dumps(results))
print(f"PRIMARY {multihost.is_primary()}")
