"""Child for the multi-process CONFIG-MISMATCH guard test: process 0 and
process 1 construct RxnGraphTrainer with DIFFERENT seeds; the trainer's
construction-time fingerprint allgather must raise on both processes
(silent loader divergence would otherwise deadlock collectives mid-run).
"""

import os
import sys

proc_id = int(sys.argv[1])
port = sys.argv[2]
data_dir = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from cgr_mpnn_3d_tpu.parallel import multihost  # noqa: E402

multihost.initialize(coordinator_address=f"localhost:{port}",
                     num_processes=2, process_id=proc_id)

from cgr_mpnn_3d_tpu.data import ChemDataset, plan_spec  # noqa: E402
from cgr_mpnn_3d_tpu.models import CGRMPNNConfig  # noqa: E402
from cgr_mpnn_3d_tpu.train import RxnGraphTrainer  # noqa: E402

train_data = ChemDataset(os.path.join(data_dir, "train.csv"))
val_data = ChemDataset(os.path.join(data_dir, "val.csv"))
cfg = CGRMPNNConfig(num_node_features=78, num_edge_features=14,
                    depth=2, hidden_sizes=(16, 16), dropout_ps=(0.0, 0.0))
graphs = [train_data.graph(i) for i in range(len(train_data))]
spec = plan_spec(graphs, te=64, tn=48, tb=2)
try:
    RxnGraphTrainer(name="mismatch", cfg=cfg, train_data=train_data,
                    val_data=val_data, spec=spec, num_epochs=1,
                    batch_size=8, n_dp=4, seed=proc_id)  # <- DIFFERENT seed
    print("GUARD missed")
except ValueError as e:
    assert "config mismatch" in str(e), e
    print("GUARD caught")
