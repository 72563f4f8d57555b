"""Data-layer tests: dataset (mirrors reference test_chemdataset.py:16-85),
block-dense packing invariants, loader static shapes."""

import numpy as np
import pytest

from cgr_mpnn_3d_tpu.chem import RxnGraph
from cgr_mpnn_3d_tpu.data import (ChemDataset, PackedLoader, PackSpec,
                                  pack_graphs, packs_needed, plan_spec)

SMILES = ["CCO>C>CCO", "O>C>CO", "N>C>CN"]
LABELS = [1.0, 2.0, 3.0]


@pytest.fixture
def csv_path(tmp_path):
    p = tmp_path / "mock.csv"
    p.write_text("SMILES,Label\n" +
                 "\n".join(f"{s},{l}" for s, l in zip(SMILES, LABELS)) + "\n")
    return str(p)


@pytest.fixture
def npz_path(tmp_path, csv_path):
    p = tmp_path / "mock.npz"
    rng = np.random.default_rng(0)
    sizes = [RxnGraph(s).arrays.num_nodes for s in SMILES]
    np.savez(str(p), *[rng.random((n, 5)).astype(np.float32) for n in sizes])
    return str(p)


class TestChemDataset:
    def test_initialization(self, csv_path):
        ds = ChemDataset(csv_path, mode="rxn")
        assert len(ds) == 3
        assert ds.mode == "rxn"
        assert ds.smiles[0] == SMILES[0]
        assert abs(ds.labels[0] - 1.0) < 1e-6

    def test_graph_and_getitem(self, csv_path):
        ds = ChemDataset(csv_path)
        g, y, extra = ds[0]
        assert g.node_feats.shape[1] == 78
        assert extra is None
        assert abs(y - 1.0) < 1e-6
        # cache: same object back
        assert ds.graph(0) is ds.graph(0)

    def test_npz_concat_widens_features(self, csv_path, npz_path):
        ds = ChemDataset(csv_path, data_npz_path=npz_path)
        assert ds.num_node_features == 78 + 5
        _, _, extra = ds[0]
        assert extra.shape[1] == 5

    def test_negative_index(self, csv_path, npz_path):
        ds = ChemDataset(csv_path, data_npz_path=npz_path)
        np.testing.assert_array_equal(ds.extra_feats(-1), ds.extra_feats(2))

    def test_bad_mode(self, csv_path):
        with pytest.raises(ValueError):
            ChemDataset(csv_path, mode="nope")

    def test_headerless_csv(self, tmp_path):
        p = tmp_path / "nohdr.csv"
        p.write_text("CCO>>CCO,4.5\n")
        ds = ChemDataset(str(p))
        assert len(ds) == 1 and abs(ds.labels[0] - 4.5) < 1e-5

    def test_headerless_csv_trailing_text_column(self, tmp_path):
        # regression (ADVICE r1): sniffing on the LAST column used to treat
        # a header-less first row with a trailing non-numeric column as a
        # header and silently drop it — the label column is what matters
        p = tmp_path / "nohdr2.csv"
        p.write_text("CCO>>CCO,4.5,noteA\nO>>O,2.0,noteB\n")
        ds = ChemDataset(str(p))
        assert len(ds) == 2
        assert abs(ds.labels[0] - 4.5) < 1e-5

    def test_has_header_override(self, tmp_path):
        # a header whose column 1 happens to parse as a float defeats any
        # sniffer; the explicit flag wins
        p = tmp_path / "odd.csv"
        p.write_text("smiles,1.0\nCCO>>CCO,4.5\n")
        ds = ChemDataset(str(p), has_header=True)
        assert len(ds) == 1 and abs(ds.labels[0] - 4.5) < 1e-5
        ds2 = ChemDataset(str(p), has_header=False)
        assert len(ds2) == 2


def _brute_force_check(batch, spec):
    """Validate every precomputed index array against senders/receivers."""
    ET, NT = spec.total_edges, spec.total_nodes
    real_edges = np.nonzero(batch.senders < NT)[0]
    for e in real_edges:
        s, r = batch.senders[e], batch.receivers[e]
        # rev is an involution crossing the same node pair
        re = batch.rev[e]
        assert re < ET
        assert batch.senders[re] == r and batch.receivers[re] == s
        # edge_nbr = in-edges of sender(e)
        expect = sorted(int(x) for x in real_edges if batch.receivers[x] == s)
        got = sorted(int(x) for x in batch.edge_nbr[e] if x < ET)
        assert got == expect
        # edge_nbr_rev = out-edges of receiver(e)
        expect = sorted(int(x) for x in real_edges if batch.senders[x] == r)
        got = sorted(int(x) for x in batch.edge_nbr_rev[e] if x < ET)
        assert got == expect
    real_nodes = np.nonzero(batch.graph_of_node < spec.total_graphs)[0]
    for n in real_nodes:
        expect = sorted(int(x) for x in real_edges if batch.receivers[x] == n)
        got = sorted(int(x) for x in batch.node_inc[n] if x < ET)
        assert got == expect
        expect = sorted(int(x) for x in real_edges if batch.senders[x] == n)
        got = sorted(int(x) for x in batch.node_out[n] if x < ET)
        assert got == expect
    # graph_nodes consistent with graph_of_node
    for g in np.nonzero(batch.graph_mask > 0)[0]:
        members = sorted(int(n) for n in real_nodes
                         if batch.graph_of_node[n] == g)
        got = sorted(int(n) for n in batch.graph_nodes[g] if n < NT)
        assert got == members


class TestPacking:
    def _graphs(self):
        gs = [RxnGraph(s).arrays for s in SMILES * 3]
        return gs, [float(i) for i in range(len(gs))]

    def test_pack_invariants(self):
        graphs, labels = self._graphs()
        spec = plan_spec(graphs, te=64, tn=32, tb=8).with_packs(2)
        batch = pack_graphs(graphs, labels, spec)
        assert batch.node_x.shape == (64, 78)
        assert batch.senders.shape == (128,)
        assert batch.graph_mask.sum() == len(graphs)
        _brute_force_check(batch, spec)

    def test_pack_locality(self):
        graphs, labels = self._graphs()
        spec = plan_spec(graphs, te=32, tn=16, tb=4).with_packs(4)
        batch = pack_graphs(graphs, labels, spec)
        NT, ET = spec.total_nodes, spec.total_edges
        for e in np.nonzero(batch.senders < NT)[0]:
            pk = e // spec.te
            assert batch.senders[e] // spec.tn == pk
            assert batch.rev[e] // spec.te == pk
            for x in batch.edge_nbr[e]:
                assert x == ET or x // spec.te == pk

    def test_overflow_raises(self):
        graphs, labels = self._graphs()
        spec = plan_spec(graphs, te=8, tn=4, tb=2).with_packs(1)
        with pytest.raises(ValueError):
            pack_graphs(graphs, labels, spec)

    def test_extra_feats_concat(self):
        graphs, labels = self._graphs()
        extra = [np.ones((g.num_nodes, 3), np.float32) * i
                 for i, g in enumerate(graphs)]
        spec = plan_spec(graphs, te=64, tn=32, tb=16).with_packs(2)
        batch = pack_graphs(graphs, labels, spec, extra)
        assert batch.node_x.shape[1] == 78 + 3
        # first graph's nodes carry block value 0, second value 1
        nn0 = graphs[0].num_nodes
        np.testing.assert_allclose(batch.node_x[:nn0, 78:], 0.0)

    def test_packs_needed(self):
        graphs, labels = self._graphs()
        spec = plan_spec(graphs, te=32, tn=16, tb=4)
        p = packs_needed(graphs, spec)
        batch = pack_graphs(graphs, labels, spec.with_packs(p))
        assert batch.graph_mask.sum() == len(graphs)


class TestLoader:
    def test_static_shapes_and_coverage(self, csv_path):
        ds = ChemDataset(csv_path)
        spec = plan_spec([ds.graph(i) for i in range(len(ds))],
                         te=64, tn=32, tb=2)
        loader = PackedLoader(ds, spec, batch_size=2, shuffle=True, seed=1)
        seen = 0
        shapes = set()
        for batch in loader:
            shapes.add(batch.node_x.shape)
            seen += int(batch.graph_mask.sum())
        assert seen == len(ds)
        assert len(shapes) == 1  # static!

    def test_prefetch_matches(self, csv_path):
        ds = ChemDataset(csv_path)
        spec = plan_spec([ds.graph(i) for i in range(len(ds))],
                         te=64, tn=32, tb=4)
        a = list(PackedLoader(ds, spec, batch_size=3, shuffle=False))
        b = list(PackedLoader(ds, spec, batch_size=3, shuffle=False).prefetch())
        assert len(a) == len(b)
        np.testing.assert_array_equal(a[0].node_x, b[0].node_x)

    def test_parallel_packing_bit_identical(self, csv_path):
        """workers>1 speculative packing must yield the EXACT batches of
        serial iteration, every field, shuffled or not."""
        ds = ChemDataset(csv_path)
        spec = plan_spec([ds.graph(i) for i in range(len(ds))],
                         te=64, tn=32, tb=2)
        for shuffle in (False, True):
            a = list(PackedLoader(ds, spec, batch_size=2, shuffle=shuffle,
                                  seed=3))
            b = list(PackedLoader(ds, spec, batch_size=2, shuffle=shuffle,
                                  seed=3, workers=3).prefetch())
            assert len(a) == len(b)
            for ba, bb in zip(a, b):
                for fa, fb in zip(ba, bb):
                    np.testing.assert_array_equal(np.asarray(fa),
                                                  np.asarray(fb))

    def test_reuse_packs_identical_content_shuffled_order(self, csv_path):
        """reuse_packs: epoch 2+ yields the SAME batch objects as the
        (fixed, epoch-0-composed) cache, in an epoch-seeded order; and the
        cache composition is independent of which epoch builds it (resume
        determinism)."""
        ds = ChemDataset(csv_path)
        spec = plan_spec([ds.graph(i) for i in range(len(ds))],
                         te=64, tn=32, tb=2)
        ld = PackedLoader(ds, spec, batch_size=2, shuffle=True, seed=5,
                          reuse_packs=True)
        ld.set_epoch(0)
        e0 = list(ld)
        ld.set_epoch(1)
        e1 = list(ld)
        assert len(e0) == len(e1)
        key = lambda b: tuple(np.asarray(b.row_ids).tolist())
        assert sorted(map(key, e0)) == sorted(map(key, e1)), \
            "reuse must preserve batch composition"
        # some epoch must reorder the (here only 2) batches
        orders = set()
        for ep in range(6):
            ld.set_epoch(ep)
            orders.add(tuple(key(b) for b in ld))
        assert len(orders) > 1, "no epoch ever reordered the batches"
        # a fresh loader that starts at epoch 7 builds the same cache
        ld2 = PackedLoader(ds, spec, batch_size=2, shuffle=True, seed=5,
                           reuse_packs=True)
        ld2.set_epoch(7)
        e7 = list(ld2)
        ld.set_epoch(7)
        e7_orig = list(ld)
        for ba, bb in zip(e7_orig, e7):
            for fa, fb in zip(ba, bb):
                np.testing.assert_array_equal(np.asarray(fa),
                                              np.asarray(fb))


class TestFeatDtype:
    def test_float16_packing_runs_model(self):
        import jax
        from cgr_mpnn_3d_tpu.models import CGRMPNNConfig, apply, init_params
        graphs = [RxnGraph(s).arrays for s in SMILES]
        spec = plan_spec(graphs, te=64, tn=32, tb=4)
        spec16 = PackSpec(spec.te, spec.tn, spec.tb, spec.d, spec.dn, 1,
                          "float16")
        b32 = pack_graphs(graphs, [1.0, 2.0, 3.0], spec.with_packs(1))
        b16 = pack_graphs(graphs, [1.0, 2.0, 3.0], spec16)
        assert b16.node_x.dtype == np.float16
        cfg = CGRMPNNConfig(num_node_features=78, num_edge_features=14,
                            depth=2, hidden_sizes=(16, 16),
                            dropout_ps=(0.0, 0.0))
        params = init_params(jax.random.PRNGKey(0), cfg)
        p32 = np.asarray(apply(params, b32, cfg))
        p16 = np.asarray(apply(params, b16, cfg))
        mask = np.asarray(b32.graph_mask) > 0
        np.testing.assert_allclose(p16[mask], p32[mask], rtol=2e-3, atol=2e-3)


class TestMultihost:
    def test_host_shard_disjoint_cover(self):
        from cgr_mpnn_3d_tpu.parallel.multihost import host_shard
        shards = [host_shard(10, process_id=i, num_processes=3)
                  for i in range(3)]
        allrows = np.concatenate(shards)
        assert sorted(allrows.tolist()) == list(range(10))
        for i in range(3):
            for j in range(i + 1, 3):
                assert not set(shards[i]) & set(shards[j])

    def test_initialize_noop_single_process(self, monkeypatch):
        from cgr_mpnn_3d_tpu.parallel import multihost
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
        multihost.initialize()  # must not raise or try to connect
        assert multihost.is_primary()


class TestRowOrder:
    def test_predict_order_with_backfill(self, tmp_path):
        """First-fit backfill: a later small graph can land in an earlier
        pack; predictions must still come back in dataset row order."""
        import jax
        from cgr_mpnn_3d_tpu.models import CGRMPNNConfig, apply, init_params
        from cgr_mpnn_3d_tpu.train import predict

        # large, large, small, small: with te sized so pack0 takes
        # [large, small(backfill)] and pack1 [large, small]
        smis = ["CCCCCCCCCC>>CCCCCCCCCC",    # 10 atoms, 18 edges
                "CCCCCCCCC>>CCCCCCCCC",      # 9 atoms, 16 edges
                "CO>>CO",                    # 2 atoms, 2 edges
                "CC>>CC"]                    # 2 atoms
        p = tmp_path / "d.csv"
        p.write_text("smiles,y\n" +
                     "\n".join(f"{s},{i}.0" for i, s in enumerate(smis)) + "\n")
        ds = ChemDataset(str(p))
        graphs = [ds.graph(i) for i in range(len(ds))]
        spec = plan_spec(graphs, te=20, tn=12, tb=2)

        cfg = CGRMPNNConfig(num_node_features=78, num_edge_features=14,
                            depth=2, hidden_sizes=(8, 8),
                            dropout_ps=(0.0, 0.0))
        params = init_params(jax.random.PRNGKey(0), cfg)

        got = predict(params, cfg, ds, spec, batch_size=4)

        # per-graph singleton reference, in dataset order
        one_spec = plan_spec(graphs, te=32, tn=16, tb=1).with_packs(1)
        expect = []
        for i in range(len(ds)):
            b = pack_graphs([graphs[i]], [0.0], one_spec)
            out = np.asarray(apply(params, b, cfg))
            expect.append(out[np.asarray(b.graph_mask) > 0][0])
        np.testing.assert_allclose(got, np.asarray(expect), rtol=1e-4,
                                   atol=1e-4)

    def test_backfill_actually_occurs(self):
        # sanity: the scenario above really does reorder slots
        smis = ["CCCCCCCCCC>>CCCCCCCCCC", "CCCCCCCCC>>CCCCCCCCC",
                "CO>>CO", "CC>>CC"]
        graphs = [RxnGraph(s).arrays for s in smis]
        spec = plan_spec(graphs, te=20, tn=12, tb=2).with_packs(3)
        batch = pack_graphs(graphs, [0.0] * 4, spec)
        rows = np.asarray(batch.row_ids)
        real = rows[rows >= 0]
        assert not np.array_equal(real, np.sort(real))  # reordered!


class TestDropLast:
    def test_drop_last_skips_partial(self, csv_path):
        ds = ChemDataset(csv_path)  # 3 rows
        spec = plan_spec([ds.graph(i) for i in range(len(ds))],
                         te=64, tn=32, tb=2)
        full = list(PackedLoader(ds, spec, batch_size=2, shuffle=False))
        dropped = list(PackedLoader(ds, spec, batch_size=2, shuffle=False,
                                    drop_last=True))
        assert len(full) == 2 and len(dropped) == 1
        assert int(dropped[0].graph_mask.sum()) == 2


class TestFeatureCache:
    def test_roundtrip_and_staleness(self, csv_path):
        import time as _time
        ds = ChemDataset(csv_path)
        ds.prefeaturize(cache=True)
        cache_path = ds._cache_path()
        assert cache_path.exists()
        # fresh dataset loads from cache (bit-identical graphs)
        ds2 = ChemDataset(csv_path)
        assert ds2.load_feature_cache()
        for i in range(len(ds)):
            np.testing.assert_array_equal(ds.graph(i).node_feats,
                                          ds2.graph(i).node_feats)
            np.testing.assert_array_equal(ds.graph(i).senders,
                                          ds2.graph(i).senders)
        # touching the csv invalidates the cache
        _time.sleep(0.01)
        import os
        os.utime(csv_path)
        ds3 = ChemDataset(csv_path)
        assert not ds3.load_feature_cache()

    def test_cache_payload_clean(self, csv_path):
        # regression (ADVICE r1): savez has no allow_pickle kwarg — passing
        # one wrote a bogus 'allow_pickle' array; rev_edge_index is now
        # persisted instead of being reconstructed as arange^1
        ds = ChemDataset(csv_path)
        ds.prefeaturize(cache=True)
        with np.load(ds._cache_path(), allow_pickle=True) as z:
            assert "allow_pickle" not in z.files
            assert "rev" in z.files
        ds2 = ChemDataset(csv_path)
        assert ds2.load_feature_cache()
        for i in range(len(ds)):
            np.testing.assert_array_equal(ds.graph(i).rev_edge_index,
                                          ds2.graph(i).rev_edge_index)


class TestWindowPlanning:
    """plan_windows + place_graphs: the multi-host window planner must
    reproduce serial iteration's shrink-and-carry exactly, and the python
    probe must agree with the native one."""

    def _tight_loader(self, use_native=None):
        from cgr_mpnn_3d_tpu.data import ChemDataset, plan_spec
        from cgr_mpnn_3d_tpu.data.loader import PackedLoader
        from pathlib import Path
        demo = Path(__file__).resolve().parent.parent / "examples" / \
            "demo.csv"
        ds = ChemDataset(str(demo))
        gs = [ds.graph(i) for i in range(len(ds))]
        # tight: bs-4 windows overflow their single small pack
        spec = plan_spec(gs, te=48, tn=32, tb=4)
        return PackedLoader(ds, spec, batch_size=4, shuffle=True, seed=1,
                            use_native=use_native)

    @pytest.mark.parametrize("use_native", [None, False])
    def test_plan_matches_serial_iteration(self, use_native):
        ld = self._tight_loader(use_native)
        plan = ld.plan_windows(ld._order())
        batches = list(ld._iter_pack(1))
        assert len(plan) == len(batches)
        assert any(len(w) < 4 for w in plan), "spec did not carry"
        for rows, b in zip(plan, batches):
            got = sorted(int(r) for r in b.row_ids if r >= 0)
            assert got == sorted(rows)
        assert sum(len(w) for w in plan) == len(ld.dataset)

    def test_python_place_probe_agrees_with_native(self):
        from cgr_mpnn_3d_tpu import native
        from cgr_mpnn_3d_tpu.data import place_graphs, plan_spec
        if not native.available():
            pytest.skip("native unavailable")
        ld = self._tight_loader()
        rng = np.random.default_rng(0)
        gs_all = [ld.dataset.graph(i) for i in range(len(ld.dataset))]
        spec = plan_spec(gs_all, te=48, tn=32, tb=4)
        for _ in range(40):
            k = int(rng.integers(1, 7))
            idx = rng.choice(len(gs_all), size=k, replace=False)
            gs = [gs_all[i] for i in idx]
            assert place_graphs(gs, spec) == \
                native.place_graphs_native(gs, spec)
