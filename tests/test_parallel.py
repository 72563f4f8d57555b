"""Multi-device tests on the 8-virtual-CPU mesh: data-parallel and
edge-partitioned training must match single-device training exactly
(same total loss, same parameter update)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgr_mpnn_3d_tpu.chem import RxnGraph
from cgr_mpnn_3d_tpu.data import pack_graphs, plan_spec
from cgr_mpnn_3d_tpu.models import CGRMPNNConfig, apply, init_params
from cgr_mpnn_3d_tpu.parallel import (EdgeShardedBatch, ep_forward,
                                      make_dp_train_step, make_ep_train_step,
                                      make_mesh, shard_edges, stack_batches)
from cgr_mpnn_3d_tpu.train import TrainState, make_optimizer, sse_loss

SMILES = ["CCO>>CC=O", "CC(=O)N>>CC(=O)N", "C=CC=C>>C=CC=C",
          "[N:1]([H:2])([H:3])[H:4]>>[N:1]([H:2])[H:3].[H:4]",
          "CCO>C>CCO", "O>C>CO", "N>C>CN", "CC>>CC"]
LABELS = [float(i + 1) for i in range(len(SMILES))]


@pytest.fixture(scope="module")
def graphs():
    return [RxnGraph(s).arrays for s in SMILES]


@pytest.fixture(scope="module")
def cfg():
    return CGRMPNNConfig(num_node_features=78, num_edge_features=14,
                         depth=2, hidden_sizes=(16, 16),
                         dropout_ps=(0.0, 0.0))


def _single_device_update(graphs, cfg, params):
    spec = plan_spec(graphs, te=128, tn=64, tb=8).with_packs(1)
    batch = pack_graphs(graphs, LABELS, spec)
    opt = make_optimizer(1e-3, 0.0, 1.0, 1)
    opt_state = opt.init(params)
    loss, grads = jax.value_and_grad(
        lambda p: sse_loss(p, batch, cfg, False, None))(params)
    updates, _ = opt.update(grads, opt_state, params)
    import optax
    return float(loss), optax.apply_updates(params, updates), grads


class TestDataParallel:
    def test_dp_matches_single_device(self, graphs, cfg):
        params = init_params(jax.random.PRNGKey(0), cfg)
        loss_ref, params_ref, grads_ref = _single_device_update(
            graphs, cfg, params)

        mesh = make_mesh(n_dp=4, n_ep=1, devices=jax.devices()[:4])
        spec = plan_spec(graphs, te=64, tn=32, tb=2).with_packs(1)
        subbatches = [pack_graphs(graphs[2 * i:2 * i + 2],
                                  LABELS[2 * i:2 * i + 2], spec)
                      for i in range(4)]
        stacked = stack_batches(subbatches)

        opt = make_optimizer(1e-3, 0.0, 1.0, 1)
        # dropout 0 => train rng irrelevant
        cfg_nodrop = cfg
        step = make_dp_train_step(opt, cfg_nodrop, mesh)
        state = TrainState(params, opt.init(params),
                           jnp.zeros((), jnp.int32), jax.random.PRNGKey(1))
        new_state, loss, gnorm = step(state, stacked)
        assert float(gnorm) > 0
        np.testing.assert_allclose(float(loss), loss_ref, rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                        jax.tree_util.tree_leaves(params_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


class TestEdgePartition:
    def test_shard_edges_structure(self, graphs):
        b = shard_edges(graphs, LABELS, n_ep=4)
        assert b.edge_attr.shape[0] == 4
        NKH = b.node_x.shape[1]
        # all real edges present exactly once across shards
        total_real = sum(int((b.src_idx[k] < NKH).sum()) for k in range(4))
        assert total_real == sum(g.num_edges for g in graphs)
        # rev stays shard-local and is an involution
        for k in range(4):
            EK = b.rev.shape[1]
            real = np.nonzero(b.rev[k] < EK)[0]
            np.testing.assert_array_equal(b.rev[k][b.rev[k][real]], real)

    def test_node_state_not_replicated(self, graphs):
        """The r1 design replicated all NT nodes per shard; the r2 design
        holds NT/n_ep owned nodes + a boundary halo only."""
        NT = sum(g.num_nodes for g in graphs)
        b = shard_edges(graphs, LABELS, n_ep=4)
        NK = b.own_recv_inc.shape[1]
        NKH = b.node_x.shape[1]
        assert NK < NT / 2            # owned block ~ NT/4 (padded)
        # comm buffers track the boundary, not the node count
        T = NKH - NK
        assert T <= 4 * 16

    def test_ep_forward_matches_single_device(self, graphs, cfg):
        params = init_params(jax.random.PRNGKey(0), cfg)
        # single-device predictions (graph order == global graph index)
        spec = plan_spec(graphs, te=128, tn=64, tb=8).with_packs(1)
        batch = pack_graphs(graphs, LABELS, spec)
        preds_ref = np.asarray(apply(params, batch, cfg))
        mask = np.asarray(batch.graph_mask) > 0
        by_label_ref = dict(zip(np.asarray(batch.labels)[mask],
                                preds_ref[mask]))

        mesh = make_mesh(n_dp=1, n_ep=4, devices=jax.devices()[:4])
        eb = shard_edges(graphs, LABELS, n_ep=4)

        from jax.sharding import PartitionSpec as P
        batch_spec = jax.tree_util.tree_map(lambda _: P("ep"),
                                            EdgeShardedBatch(*[0] * 14))

        def fwd(b):
            local = jax.tree_util.tree_map(lambda v: v[0], b)
            sse, preds = ep_forward(params, local, cfg, axis="ep")
            return sse, preds  # identical on every ep member

        sse, preds = jax.jit(jax.shard_map(
            fwd, mesh=mesh, in_specs=(batch_spec,),
            out_specs=(P(), P()), check_vma=False))(eb)

        preds = np.asarray(preds)
        for g, lbl in enumerate(LABELS):
            np.testing.assert_allclose(preds[g], by_label_ref[lbl],
                                       rtol=1e-4, atol=1e-4)
        sse_ref = sum((by_label_ref[l] - l) ** 2 for l in by_label_ref)
        np.testing.assert_allclose(float(sse), sse_ref, rtol=1e-4)

    def test_ep_train_step_matches_single_device(self, graphs, cfg):
        params = init_params(jax.random.PRNGKey(0), cfg)
        loss_ref, params_ref, _ = _single_device_update(graphs, cfg, params)

        mesh = make_mesh(n_dp=2, n_ep=4, devices=jax.devices())
        # dp shard 0 gets first half of graphs, shard 1 the rest; padded
        # sizes pinned so both dp groups stack to one shape
        pins = dict(n_ep=4, d=8, d_out=8, d_recv=8, nk=16, ek=64,
                    s_max=8, dn=16)
        eb0 = shard_edges(graphs[:4], LABELS[:4], **pins)
        eb1 = shard_edges(graphs[4:], LABELS[4:], **pins)
        stacked = jax.tree_util.tree_map(
            lambda a, b: np.stack([a, b], axis=0), eb0, eb1)

        opt = make_optimizer(1e-3, 0.0, 1.0, 1)
        step = make_ep_train_step(opt, cfg, mesh)
        state = TrainState(params, opt.init(params),
                           jnp.zeros((), jnp.int32), jax.random.PRNGKey(1))
        new_state, loss = step(state, stacked)
        np.testing.assert_allclose(float(loss), loss_ref, rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                        jax.tree_util.tree_leaves(params_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

    def test_shard_edges_vectorized_speed(self):
        """~100k directed edges must shard in about a second (the r1
        per-edge Python loop took minutes at this scale).  Best-of-3 so a
        cold numpy allocator / suite memory pressure can't flake the
        assertion; warm standalone runs measure ~85 ms, so the generous
        1.0 s bound only catches order-of-magnitude regressions without
        flaking a functional suite on a loaded CI host (ADVICE r2)."""
        import time
        from cgr_mpnn_3d_tpu.data.synthetic import synthetic_graphs
        rng = np.random.default_rng(0)
        graphs = synthetic_graphs(2500, rng)
        E = sum(g.num_edges for g in graphs)
        assert E > 90_000
        dt = float("inf")
        for _ in range(3):
            t0 = time.time()
            b = shard_edges(graphs, [0.0] * len(graphs), n_ep=8)
            dt = min(dt, time.time() - t0)
        NKH = b.node_x.shape[1]
        total_real = sum(int((b.src_idx[k] < NKH).sum()) for k in range(8))
        assert total_real == E
        assert dt < 1.0, f"shard_edges took {dt:.2f}s at {E} edges"


class TestDataParallelFused:
    def test_dp_fused_kernel_matches_single_device(self, graphs, cfg):
        """DP step with the one-kernel Pallas path (interpret mode) must
        match single-device training exactly."""
        from dataclasses import replace
        cfg_p = replace(cfg, use_pallas=True, pallas_interpret=True)
        params = init_params(jax.random.PRNGKey(0), cfg)
        loss_ref, params_ref, _ = _single_device_update(graphs, cfg, params)

        mesh = make_mesh(n_dp=4, n_ep=1, devices=jax.devices()[:4])
        spec = plan_spec(graphs, te=64, tn=32, tb=2).with_packs(1)
        subbatches = [pack_graphs(graphs[2 * i:2 * i + 2],
                                  LABELS[2 * i:2 * i + 2], spec)
                      for i in range(4)]
        stacked = stack_batches(subbatches)

        opt = make_optimizer(1e-3, 0.0, 1.0, 1)
        step = make_dp_train_step(opt, cfg_p, mesh, spec=spec)
        state = TrainState(params, opt.init(params),
                           jnp.zeros((), jnp.int32), jax.random.PRNGKey(1))
        new_state, loss, _ = step(state, stacked)
        np.testing.assert_allclose(float(loss), loss_ref, rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                        jax.tree_util.tree_leaves(params_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-5)


class TestGiantGraph:
    def test_ep_handles_graph_larger_than_any_tile(self):
        """The edge-partition axis exists so one batched graph can exceed a
        single device's tile: a 480-atom chain (958 directed edges) sharded
        over 8 'ep' devices must match the single-device packed model."""
        from cgr_mpnn_3d_tpu.data.synthetic import synthetic_graphs
        rng = np.random.default_rng(0)
        g = synthetic_graphs(1, rng, min_atoms=480, max_atoms=480,
                             max_degree=3)[0]
        cfg = CGRMPNNConfig(num_node_features=78, num_edge_features=14,
                            depth=2, hidden_sizes=(16, 16),
                            dropout_ps=(0.0, 0.0))
        params = init_params(jax.random.PRNGKey(0), cfg)

        # single-device reference needs a tile big enough for the graph
        spec = plan_spec([g], te=1024, tn=512, tb=2).with_packs(1)
        batch = pack_graphs([g], [1.0], spec)
        ref = np.asarray(apply(params, batch, cfg))[
            np.asarray(batch.graph_mask) > 0][0]

        mesh = make_mesh(n_dp=1, n_ep=8, devices=jax.devices())
        eb = shard_edges([g], [1.0], n_ep=8)
        # each shard holds only ~1/8 of the edges AND ~1/8 of the nodes
        assert eb.edge_attr.shape[1] < g.num_edges // 3
        assert eb.node_x.shape[1] < g.num_nodes // 2

        from jax.sharding import PartitionSpec as P
        bspec = jax.tree_util.tree_map(lambda _: P("ep"),
                                       EdgeShardedBatch(*[0] * 14))

        def fwd(b):
            local = jax.tree_util.tree_map(lambda v: v[0], b)
            _, preds = ep_forward(params, local, cfg, axis="ep")
            return preds

        preds = np.asarray(jax.jit(jax.shard_map(
            fwd, mesh=mesh, in_specs=(bspec,), out_specs=P(),
            check_vma=False))(eb))
        np.testing.assert_allclose(preds[0], ref, rtol=1e-3, atol=1e-3)


class TestEdgePartitionMean:
    def test_ep_mean_aggr_matches_single_device(self, graphs):
        """aggr='mean' on the EP path (r2: in-degrees are static per batch,
        so the normalization is a host-precomputed owned-node scale)."""
        cfg = CGRMPNNConfig(num_node_features=78, num_edge_features=14,
                            depth=2, hidden_sizes=(16, 16),
                            dropout_ps=(0.0, 0.0), aggr="mean")
        params = init_params(jax.random.PRNGKey(3), cfg)
        spec = plan_spec(graphs, te=128, tn=64, tb=8).with_packs(1)
        batch = pack_graphs(graphs, LABELS, spec)
        preds_ref = np.asarray(apply(params, batch, cfg))
        mask = np.asarray(batch.graph_mask) > 0
        by_label = dict(zip(np.asarray(batch.labels)[mask], preds_ref[mask]))

        mesh = make_mesh(n_dp=1, n_ep=4, devices=jax.devices()[:4])
        eb = shard_edges(graphs, LABELS, n_ep=4)
        from jax.sharding import PartitionSpec as P
        bspec = jax.tree_util.tree_map(lambda _: P("ep"),
                                       EdgeShardedBatch(*[0] * 14))

        def fwd(b):
            local = jax.tree_util.tree_map(lambda v: v[0], b)
            _, preds = ep_forward(params, local, cfg, axis="ep")
            return preds

        preds = np.asarray(jax.jit(jax.shard_map(
            fwd, mesh=mesh, in_specs=(bspec,), out_specs=P(),
            check_vma=False))(eb))
        for g, lbl in enumerate(LABELS):
            np.testing.assert_allclose(preds[g], by_label[lbl],
                                       rtol=1e-4, atol=1e-4)


class TestEPTrainerCLI:
    """--ep path: EPLoader + make_ep_eval_step + trainer n_ep integration."""

    @pytest.fixture(scope="class")
    def demo_ds(self):
        from pathlib import Path
        from cgr_mpnn_3d_tpu.data import ChemDataset
        demo = Path(__file__).resolve().parent.parent / "examples" / "demo.csv"
        ds = ChemDataset(str(demo))
        ds.prefeaturize()
        return ds

    def test_ep_loader_shapes_and_masking(self, demo_ds):
        from cgr_mpnn_3d_tpu.parallel import EPLoader, empty_ep_batch_like
        ld = EPLoader(demo_ds, n_ep=2, batch_size=8, n_dp=2, shuffle=False)
        groups = list(ld)
        # 10 graphs / bs 8 -> 2 batches -> 1 dp-group of 2
        assert len(groups) == len(ld) == 1
        g = groups[0]
        assert g.node_x.shape[:2] == (2, 2)          # [n_dp, n_ep, ...]
        # second dp member holds the short batch: 2 real + 6 dummies
        assert float(g.graph_mask[1].sum()) == 2 * 2  # per-ep copies
        assert float(g.graph_mask[0].sum()) == 8 * 2
        # shapes shared across the group (one compilation)
        filler = empty_ep_batch_like(
            jax.tree_util.tree_map(lambda v: v[0], g))
        for a, b in zip(jax.tree_util.tree_leaves(filler),
                        jax.tree_util.tree_leaves(
                            jax.tree_util.tree_map(lambda v: v[0], g))):
            assert a.shape == b.shape

    def test_ep_loader_pin_growth(self):
        """A batch bigger than the prescan sample must grow pins, not fail."""
        from cgr_mpnn_3d_tpu.data.synthetic import synthetic_graphs
        from cgr_mpnn_3d_tpu.parallel.ep_loader import natural_ep_pins
        from cgr_mpnn_3d_tpu.parallel import shard_edges
        rng = np.random.default_rng(3)
        small = synthetic_graphs(12, rng)
        big = synthetic_graphs(4, rng, min_atoms=60, max_atoms=80)
        nat_small = natural_ep_pins(
            shard_edges(small[:4], [0.0] * 4, n_ep=2))
        nat_big = natural_ep_pins(shard_edges(big, [0.0] * 4, n_ep=2))
        assert nat_big["nk"] > nat_small["nk"]  # growth actually exercised

        class _DS:  # minimal ChemDataset stand-in over raw graphs
            use_npz = False
            num_edge_features = 14
            def __init__(self, gs):
                self.gs = gs
                self.labels = np.arange(len(gs), dtype=np.float32)
            def __len__(self):
                return len(self.gs)
            def graph(self, i):
                return self.gs[i]
            def extra_feats(self, i):
                return None

        from cgr_mpnn_3d_tpu.parallel import EPLoader
        ld = EPLoader(_DS(small + big), n_ep=2, batch_size=4, n_dp=1,
                      shuffle=False, prescan_batches=1)
        pins0 = dict(ld.pins)
        groups = list(ld)
        assert len(groups) == 4
        assert ld.pins["nk"] > pins0["nk"]
        # every yielded group uses the shapes current at its yield time;
        # real edges survive sharding
        total_real = 0
        for g in groups:
            NKH = g.node_x.shape[2]
            total_real += int((g.src_idx < NKH).sum())
        assert total_real == sum(x.num_edges for x in small + big)

    def test_ep_trainer_invariant_to_shard_count(self, demo_ds, tmp_path):
        """The full trainer path must be numerically invariant to n_ep
        (EPLoader windows don't depend on the shard count, and the
        boundary exchange is exact) — n_ep=2 and n_ep=4 runs must agree.
        Step-level equivalence vs single-device is proven separately in
        TestEdgePartition; trajectory parity vs the packed trainer is NOT
        expected (PackedLoader's overflow windows batch differently)."""
        from cgr_mpnn_3d_tpu.data import plan_spec
        from cgr_mpnn_3d_tpu.train import RxnGraphTrainer
        gs = [demo_ds.graph(i) for i in range(len(demo_ds))]
        spec = plan_spec(gs, te=128, tn=64, tb=8)
        cfg = CGRMPNNConfig(num_node_features=demo_ds.num_node_features,
                            num_edge_features=demo_ds.num_edge_features,
                            depth=2, hidden_sizes=(24, 24),
                            dropout_ps=(0.0, 0.0))
        common = dict(name="ep-test", cfg=cfg, train_data=demo_ds,
                      val_data=demo_ds, spec=spec, lr=3e-3, num_epochs=2,
                      batch_size=8, val_frequency=1, seed=0)
        a = RxnGraphTrainer(model_save_dir=str(tmp_path / "a"),
                            n_ep=2, **common).train()
        b = RxnGraphTrainer(model_save_dir=str(tmp_path / "b"),
                            n_ep=4, **common).train()
        np.testing.assert_allclose(a["train_losses"], b["train_losses"],
                                   rtol=1e-4)
        np.testing.assert_allclose(a["val_losses"], b["val_losses"],
                                   rtol=1e-4)
        assert a["train_losses"][-1] < a["train_losses"][0]

    def test_ep_trainer_dp_ep_mesh(self, demo_ds, tmp_path):
        """dp=2 x ep=2 mesh from the trainer: runs, learns, checkpoints."""
        from cgr_mpnn_3d_tpu.data import plan_spec
        from cgr_mpnn_3d_tpu.train import RxnGraphTrainer
        gs = [demo_ds.graph(i) for i in range(len(demo_ds))]
        spec = plan_spec(gs, te=128, tn=64, tb=8)
        cfg = CGRMPNNConfig(num_node_features=demo_ds.num_node_features,
                            num_edge_features=demo_ds.num_edge_features,
                            depth=2, hidden_sizes=(24, 24),
                            dropout_ps=(0.1, 0.1))
        out = RxnGraphTrainer(
            name="ep-dp", cfg=cfg, train_data=demo_ds, val_data=demo_ds,
            spec=spec, lr=5e-3, num_epochs=4, batch_size=8,
            val_frequency=2, seed=0, n_dp=2, n_ep=2,
            model_save_dir=str(tmp_path / "m")).train()
        assert np.isfinite(out["train_losses"]).all()
        assert out["train_losses"][-1] < out["train_losses"][0]
        assert (tmp_path / "m" / "ep-dp.npz").exists()


class TestNaNGuardRollback:
    def test_dp_rollback_reuses_state_after_bad_batch(self, tmp_path):
        """Regression: dp/ep train steps must NOT donate the input state —
        the NaN guard rolls back to it after a poisoned batch, and a
        donated buffer would be deleted (RuntimeError on the next step)."""
        from pathlib import Path
        from cgr_mpnn_3d_tpu.data import ChemDataset, plan_spec
        from cgr_mpnn_3d_tpu.train import RxnGraphTrainer
        demo = Path(__file__).resolve().parent.parent / "examples" / "demo.csv"
        ds = ChemDataset(str(demo))
        ds.prefeaturize()
        ds.labels = np.asarray(ds.labels, np.float32).copy()
        ds.labels[3] = np.inf                    # one poisoned row
        gs = [ds.graph(i) for i in range(len(ds))]
        spec = plan_spec(gs, te=128, tn=64, tb=8)
        cfg = CGRMPNNConfig(num_node_features=ds.num_node_features,
                            num_edge_features=ds.num_edge_features,
                            depth=2, hidden_sizes=(16, 16),
                            dropout_ps=(0.0, 0.0))
        events = []

        class _Log:
            def log(self, rec):
                events.append(rec)
            def finish(self):
                pass

        out = RxnGraphTrainer(
            name="nan-dp", cfg=cfg, train_data=ds, val_data=ds, spec=spec,
            lr=1e-3, num_epochs=2, batch_size=4, val_frequency=5,
            seed=0, n_dp=2, logger=_Log(),
            model_save_dir=str(tmp_path / "m")).train()
        # the poisoned batch was dropped, the rest of training proceeded
        assert any(e.get("event") == "non_finite_loss" for e in events)
        assert len(out["train_losses"]) == 2


class TestGlobalizeGroup:
    """multihost.globalize_group: single-process it must equal device_put of
    the stacked batch (the multi-process semantics are proven end-to-end by
    test_multiprocess.test_two_process_trainer_equality)."""

    def test_joint_dp_matches_stacked(self):
        from jax.sharding import NamedSharding

        from cgr_mpnn_3d_tpu.parallel import P, make_mesh, multihost

        mesh = make_mesh(n_dp=4, n_ep=1, devices=jax.devices()[:4])
        rng = np.random.default_rng(0)
        batches = [{"a": rng.normal(size=(3, 5)).astype(np.float32),
                    "b": np.int32(i)} for i in range(4)]
        cells = dict(zip(multihost.local_mesh_cells(mesh), batches))
        assert sorted(cells) == [(0, 0), (1, 0), (2, 0), (3, 0)]
        g = multihost.globalize_group(mesh, cells, joint_dp_ep=True)
        stacked = jax.tree_util.tree_map(
            lambda *xs: np.stack(xs, 0), *batches)
        sh = NamedSharding(mesh, P(("dp", "ep")))
        for k in ("a", "b"):
            assert g[k].sharding.is_equivalent_to(sh, g[k].ndim)
            np.testing.assert_array_equal(np.asarray(g[k]), stacked[k])

    def test_dp_ep_grid(self):
        from cgr_mpnn_3d_tpu.parallel import make_mesh, multihost

        mesh = make_mesh(n_dp=2, n_ep=2, devices=jax.devices()[:4])
        cells = {c: {"x": np.full((2,), 10 * c[0] + c[1], np.float32)}
                 for c in multihost.local_mesh_cells(mesh)}
        g = multihost.globalize_group(mesh, cells)
        assert g["x"].shape == (2, 2, 2)
        got = np.asarray(g["x"])
        for i in range(2):
            for j in range(2):
                np.testing.assert_array_equal(got[i, j],
                                              np.full((2,), 10 * i + j))
