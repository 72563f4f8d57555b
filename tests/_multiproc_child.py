"""Child program for the 2-process jax.distributed test (test_multiprocess).

Each process: 2 virtual CPU devices -> a 4-device global 'dp' mesh across
2 OS processes.  Exercises the real multi-host path end to end:
multihost.initialize (coordinator handshake), host_shard (disjoint rows),
make_array_from_process_local_data (host-local -> global batch), the
shard_map'd dp train step (gradient psum crosses the process boundary), and
sync_global_devices.  Prints LOSS/CHECKSUM lines the parent asserts on.
"""

import os
import sys

proc_id = int(sys.argv[1])
port = sys.argv[2]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from cgr_mpnn_3d_tpu.chem import RxnGraph  # noqa: E402
from cgr_mpnn_3d_tpu.data import pack_graphs, plan_spec  # noqa: E402
from cgr_mpnn_3d_tpu.models import CGRMPNNConfig, init_params  # noqa: E402
from cgr_mpnn_3d_tpu.parallel import (P, make_dp_train_step,  # noqa: E402
                                      make_mesh, multihost, stack_batches)
from cgr_mpnn_3d_tpu.train import TrainState, make_optimizer  # noqa: E402

SMILES = ["CCO>>CC=O", "CC(=O)N>>CC(=O)N", "C=CC=C>>C=CC=C",
          "[N:1]([H:2])([H:3])[H:4]>>[N:1]([H:2])[H:3].[H:4]",
          "CCO>C>CCO", "O>C>CO", "N>C>CN", "CC>>CC"]
LABELS = [float(i + 1) for i in range(len(SMILES))]


def main():
    multihost.initialize(coordinator_address=f"localhost:{port}",
                         num_processes=2, process_id=proc_id)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4 and len(jax.local_devices()) == 2

    cfg = CGRMPNNConfig(num_node_features=78, num_edge_features=14,
                        depth=2, hidden_sizes=(16, 16),
                        dropout_ps=(0.0, 0.0))
    graphs = {i: RxnGraph(s).arrays for i, s in enumerate(SMILES)}
    spec = plan_spec(list(graphs.values()), te=64, tn=32, tb=2).with_packs(1)

    # disjoint per-host rows -> one 2-graph sub-batch per local device
    rows = multihost.host_shard(len(SMILES))
    assert len(rows) == 4
    subbatches = [pack_graphs([graphs[r] for r in rows[2 * i:2 * i + 2]],
                              [LABELS[r] for r in rows[2 * i:2 * i + 2]],
                              spec)
                  for i in range(2)]
    local_stack = stack_batches(subbatches)       # [2 local devices, ...]

    mesh = make_mesh(n_dp=4, n_ep=1, devices=jax.devices())
    sharding = NamedSharding(mesh, P(("dp", "ep")))
    global_batch = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_stack)

    opt = make_optimizer(1e-3, 0.0, 1.0, 1)
    params = init_params(jax.random.PRNGKey(0), cfg)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32),
                       jax.random.PRNGKey(1))
    step = make_dp_train_step(opt, cfg, mesh)
    new_state, loss, _gnorm = step(state, global_batch)
    jax.block_until_ready(loss)

    checksum = float(sum(float(jnp.sum(jnp.abs(leaf)))
                         for leaf in jax.tree_util.tree_leaves(
                             new_state.params)))

    # ---- EP phase: the ring boundary exchange crosses the process
    # boundary (mesh (dp=1, ep=2) pairing one device from EACH process;
    # a striped giant chain guarantees a non-empty cut) ----
    from jax.sharding import Mesh
    from cgr_mpnn_3d_tpu.chem.featurize import GraphArrays
    from cgr_mpnn_3d_tpu.parallel import (make_ep_pack_train_step,
                                          pack_shard_edges)

    def chain(n):
        nb = n - 1
        send = np.empty(2 * nb, np.int32)
        recv = np.empty(2 * nb, np.int32)
        send[0::2] = np.arange(nb)
        recv[0::2] = np.arange(1, n)
        send[1::2] = np.arange(1, n)
        recv[1::2] = np.arange(nb)
        rng = np.random.default_rng(5)
        return GraphArrays(rng.normal(size=(n, 78)).astype(np.float32),
                           rng.normal(size=(2 * nb, 14)).astype(np.float32),
                           send, recv,
                           np.arange(2 * nb, dtype=np.int32) ^ 1)

    ep_graphs = [chain(100)] + [graphs[i] for i in range(4)]
    ep_labels = [2.0] + LABELS[:4]
    eb, espec = pack_shard_edges(ep_graphs, ep_labels, 2, te=64, tn=32)
    assert any(c > 0 for c in espec.caps), espec.caps
    ep_mesh = Mesh(np.asarray(jax.devices())[[0, 2]].reshape(1, 2),
                   ("dp", "ep"))
    ep_sharding = NamedSharding(ep_mesh, P("dp", "ep"))
    my_col = 0 if proc_id == 0 else 1
    local = jax.tree_util.tree_map(
        lambda v: v[None][:, my_col:my_col + 1], eb)
    ep_batch = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(ep_sharding, x),
        local)
    ep_step = make_ep_pack_train_step(opt, cfg, ep_mesh, espec)
    ep_state = TrainState(params, opt.init(params),
                          jnp.zeros((), jnp.int32), jax.random.PRNGKey(1))
    ep_new, ep_loss, _ = ep_step(ep_state, ep_batch)
    jax.block_until_ready(ep_loss)
    ep_checksum = float(sum(float(jnp.sum(jnp.abs(leaf)))
                            for leaf in jax.tree_util.tree_leaves(
                                ep_new.params)))

    multihost.sync_global_devices("done")
    print(f"LOSS {float(loss):.6f}")
    print(f"CHECKSUM {checksum:.6f}")
    print(f"EPLOSS {float(ep_loss):.6f}")
    print(f"EPCHECKSUM {ep_checksum:.6f}")
    print(f"PRIMARY {multihost.is_primary()}")


if __name__ == "__main__":
    main()
