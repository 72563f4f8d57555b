"""Dump per-layer activation goldens from the ACTUAL reference model.

This imports ``/root/reference/cgr_mpnn_3D/models/GNN.py`` *unmodified* and
runs it under torch-CPU, with a ~40-line stand-in registered for the only two
``torch_geometric`` symbols it touches (``MessagePassing`` with its
edge->dst-node scatter aggregation, and ``global_add_pool``).  Everything the
goldens assert — edge_init gather+linear, the DMPNNConv message math
(GNN.py:131-145), skip/activation ordering (GNN.py:90-102), the last-conv
reuse readout (GNN.py:105-110) — executes inside the reference's own code.

Per-layer activations are captured with forward hooks positioned so each
value is read *exactly as the reference consumes it*:

  - ``convs[l]`` input ``edge_attr``  == h_{l-1} after skip+act+dropout
  - the depth+1'th conv invocation's input == final h (GNN.py:105 reuse)
  - ``edge_to_node`` input column-slice == the incoming node sums ``s``
  - ``ffn`` input == pooled graph embeddings

Output: an .npz of {case}/{name} arrays (inputs, parameters in this repo's
[fan_in, fan_out] layout, activations), consumed by
tests/test_reference_goldens.py via apply(..., capture=True).

When RDKit is importable (not in this image; run on a connected host), the
script additionally dumps reference featurizer goldens
(graph_features.py:4-63 atom/bond vectors + RxnGraph CGR arrays) for a
reaction-SMILES corpus — see --featurizer-corpus.

Usage:
    python tools/dump_reference_goldens.py --out tests/goldens/reference_gnn.npz
"""

from __future__ import annotations

import argparse
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np

REFERENCE = Path("/root/reference")
REPO = Path(__file__).resolve().parent.parent


# ---------------------------------------------------------------------------
# torch_geometric stand-in (the reference imports MessagePassing +
# global_add_pool; semantics per PyG: scatter messages onto edge_index[1],
# inferred dim size = max index + 1)
# ---------------------------------------------------------------------------

def _install_tg_shim(torch):
    class MessagePassing(torch.nn.Module):
        def __init__(self, aggr: str = "add"):
            super().__init__()
            if aggr not in ("add", "mean"):
                raise ValueError(f"shim supports add/mean, got {aggr!r}")
            self.aggr = aggr

        def propagate(self, edge_index, x=None, edge_attr=None):
            del x  # the reference always passes x=None (GNN.py:134)
            msg = self.message(edge_attr=edge_attr)
            dst = edge_index[1]
            dim = int(edge_index.max().item()) + 1 if edge_index.numel() \
                else 0
            out = torch.zeros((dim, msg.shape[1]), dtype=msg.dtype)
            out.index_add_(0, dst, msg)
            if self.aggr == "mean":
                ones = torch.ones(dst.shape[0], dtype=msg.dtype)
                deg = torch.zeros(dim, dtype=msg.dtype)
                deg.index_add_(0, dst, ones)
                out = out / deg.clamp(min=1.0).unsqueeze(1)
            return out

        def message(self, edge_attr):  # overridden by DMPNNConv
            return edge_attr

    def global_add_pool(x, batch):
        n = int(batch.max().item()) + 1
        out = torch.zeros((n, x.shape[1]), dtype=x.dtype)
        out.index_add_(0, batch, x)
        return out

    def global_mean_pool(x, batch):
        n = int(batch.max().item()) + 1
        out = torch.zeros((n, x.shape[1]), dtype=x.dtype)
        out.index_add_(0, batch, x)
        cnt = torch.zeros(n, dtype=x.dtype)
        cnt.index_add_(0, batch, torch.ones(batch.shape[0], dtype=x.dtype))
        return out / cnt.clamp(min=1.0).unsqueeze(1)

    tg = types.ModuleType("torch_geometric")
    tg_nn = types.ModuleType("torch_geometric.nn")
    tg_nn.MessagePassing = MessagePassing
    tg_nn.global_add_pool = global_add_pool
    tg_nn.global_mean_pool = global_mean_pool
    tg.nn = tg_nn
    sys.modules["torch_geometric"] = tg
    sys.modules["torch_geometric.nn"] = tg_nn
    return tg


def _load_reference_gnn():
    import torch
    _install_tg_shim(torch)
    path = REFERENCE / "cgr_mpnn_3D" / "models" / "GNN.py"
    spec = importlib.util.spec_from_file_location("reference_gnn", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# inputs: synthetic paired-edge graph batches + featurized demo reactions
# ---------------------------------------------------------------------------

class CaseGraph(types.SimpleNamespace):
    """node_feats [n,F], edge_feats [e,Fe] (pair-consecutive), senders,
    receivers [e] — the disjoint-union member of one golden batch."""


def synthetic_batch(rng, n_graphs, f_node, f_edge):
    graphs = []
    for _ in range(n_graphs):
        n = int(rng.integers(3, 18))
        # random spanning tree + extra chords => no isolated nodes and
        # edge_index.max()+1 == n (PyG size-inference assumption holds)
        pairs = [(i, int(rng.integers(0, i))) for i in range(1, n)]
        for _ in range(int(rng.integers(0, n))):
            a, b = rng.integers(0, n, 2)
            if a != b and (a, b) not in pairs and (b, a) not in pairs:
                pairs.append((int(a), int(b)))
        senders, receivers = [], []
        for a, b in pairs:                 # both directions, consecutive
            senders += [a, b]
            receivers += [b, a]
        e = len(senders)
        graphs.append(CaseGraph(
            node_feats=rng.standard_normal((n, f_node)).astype(np.float32),
            edge_feats=rng.standard_normal((e, f_edge)).astype(np.float32),
            senders=np.asarray(senders, np.int32),
            receivers=np.asarray(receivers, np.int32)))
    return graphs


def demo_batch(extra_dim=0, seed=0):
    """Featurize the demo reactions with this repo's chem stack (RDKit is
    absent here; the model-math goldens only need *identical inputs* on both
    sides — featurizer parity vs RDKit is the separate --featurizer-corpus
    dump on a connected host)."""
    sys.path.insert(0, str(REPO))
    from cgr_mpnn_3d_tpu.chem import RxnGraph
    rows = (REPO / "examples" / "demo.csv").read_text().splitlines()[1:]
    rng = np.random.default_rng(seed)
    graphs = []
    for line in rows:
        smi = line.split(",")[0]
        g = RxnGraph(smi).arrays
        x = g.node_feats
        if extra_dim:
            x = np.concatenate(
                [x, rng.standard_normal((x.shape[0], extra_dim))
                 .astype(np.float32)], axis=1)
        graphs.append(CaseGraph(node_feats=x, edge_feats=g.edge_feats,
                                senders=g.senders, receivers=g.receivers))
    return graphs


def disjoint_union(graphs):
    """-> x, e, edge_index[2,E], batch[N], n_nodes[], n_edges[]"""
    xs, es, srcs, dsts, bvec = [], [], [], [], []
    off = 0
    for gi, g in enumerate(graphs):
        xs.append(g.node_feats)
        es.append(g.edge_feats)
        srcs.append(g.senders.astype(np.int64) + off)
        dsts.append(g.receivers.astype(np.int64) + off)
        bvec.append(np.full(g.node_feats.shape[0], gi, np.int64))
        off += g.node_feats.shape[0]
    return (np.concatenate(xs), np.concatenate(es),
            np.stack([np.concatenate(srcs), np.concatenate(dsts)]),
            np.concatenate(bvec),
            np.asarray([g.node_feats.shape[0] for g in graphs], np.int64),
            np.asarray([g.edge_feats.shape[0] for g in graphs], np.int64))


# ---------------------------------------------------------------------------
# parameter seeding (numpy -> torch state dict; dumped in our [in,out] layout)
# ---------------------------------------------------------------------------

def seed_params(model, rng, learnable_skip):
    import torch
    dumped = {}
    bound = 0.1
    for name, p in model.named_parameters():
        if p.dim() == 2:  # torch Linear weight [out, in]
            bound = 1.0 / np.sqrt(p.shape[1])
        # bias reuses its weight's bound (iteration order: weight, bias) —
        # keeps activations O(1) so f32 ReLU-boundary noise stays << tol
        vals = rng.uniform(-bound, bound,
                           size=tuple(p.shape)).astype(np.float32)
        if "skip_weights" in name:
            vals = np.float32(rng.uniform(0.5, 1.5))
        with torch.no_grad():
            p.copy_(torch.from_numpy(np.asarray(vals)))
        dumped[name] = np.asarray(vals)

    out = {}
    for lin, ours in [("edge_init", "edge_init"),
                      ("edge_to_node", "edge_to_node"), ("ffn", "ffn")]:
        out[f"{ours}.w"] = dumped[f"{lin}.weight"].T.copy()
        out[f"{ours}.b"] = dumped[f"{lin}.bias"].copy()
    li = 0
    while f"convs.{li}.lin.weight" in dumped:
        out[f"convs.{li}.w"] = dumped[f"convs.{li}.lin.weight"].T.copy()
        out[f"convs.{li}.b"] = dumped[f"convs.{li}.lin.bias"].copy()
        li += 1
    if learnable_skip:
        si = 0
        while f"skip_weights.{si}" in dumped:
            out[f"skip_weights.{si}"] = dumped[f"skip_weights.{si}"]
            si += 1
    return out


# ---------------------------------------------------------------------------
# one golden case
# ---------------------------------------------------------------------------

CONFIGS = {
    # name: depth, hidden, activation, aggr, learnable_skip, pooling
    "defaults_relu": (3, 48, "ReLU", "add", False, "add"),
    "flagship_d4": (4, 56, "ReLU", "add", False, "add"),
    "gelu_skip": (2, 40, "GELU", "add", True, "add"),
    "silu_mean": (3, 32, "SiLU", "mean", False, "add"),
    # GNN.py:23 pooling_fn=global_mean_pool (the reference's other pooling)
    "relu_meanpool": (3, 40, "ReLU", "add", False, "mean"),
}

ACT = {"ReLU": "relu", "GELU": "gelu", "SiLU": "silu"}


def run_case(gnn_mod, case_name, graphs, depth, hidden, act_name, aggr,
             learnable_skip, param_seed, pooling="add"):
    import torch
    import torch.nn.functional as F

    x, e, edge_index, bvec, n_nodes, n_edges = disjoint_union(graphs)
    act_fn = getattr(F, ACT[act_name])

    tg_nn = sys.modules["torch_geometric.nn"]
    pool_fn = (tg_nn.global_mean_pool if pooling == "mean"
               else tg_nn.global_add_pool)
    model = gnn_mod.GNN(
        num_node_features=x.shape[1], num_edge_features=e.shape[1],
        depth=depth, hidden_sizes=[hidden] * depth,
        dropout_ps=[0.0] * depth, activation_fn=act_fn, aggr=aggr,
        pooling_fn=pool_fn, use_learnable_skip=learnable_skip)
    model.eval()
    params = seed_params(model, np.random.default_rng(param_seed),
                         learnable_skip)

    # hooks: record every module invocation in call order
    calls = []

    def grab(name):
        def hook(mod, args, output):
            calls.append((name, [a.detach().numpy() if torch.is_tensor(a)
                                 else a for a in args],
                          output))
        return hook

    model.edge_init.register_forward_hook(grab("edge_init"))
    for li, conv in enumerate(model.convs):
        conv.register_forward_hook(grab(f"conv{li}"))
    model.edge_to_node.register_forward_hook(grab("edge_to_node"))
    model.ffn.register_forward_hook(grab("ffn"))

    data = types.SimpleNamespace(
        x=torch.from_numpy(x), edge_index=torch.from_numpy(edge_index),
        edge_attr=torch.from_numpy(e), batch=torch.from_numpy(bvec))
    with torch.no_grad():
        preds = model(data).numpy()

    conv_calls = [c for c in calls if c[0].startswith("conv")]
    assert len(conv_calls) == depth + 1, "expected depth loop + reuse call"

    acts = {}
    # h_{l-1} as consumed by conv invocation l (edge_attr arg of forward)
    for inv in range(1, depth):
        acts[f"h_{inv - 1}"] = conv_calls[inv][1][1]
    # final h: consumed by the REUSE invocation (GNN.py:105)
    acts[f"h_{depth - 1}"] = conv_calls[depth][1][1]
    # h0 as consumed by the first conv call
    acts["h0"] = conv_calls[0][1][1]
    # s: column-slice of edge_to_node's input q = cat([x, s], dim=1)
    e2n = next(c for c in calls if c[0] == "edge_to_node")
    acts["s"] = e2n[1][0][:, x.shape[1]:]
    with torch.no_grad():
        acts["h_node"] = act_fn(e2n[2]).numpy()
    ffn_call = next(c for c in calls if c[0] == "ffn")
    acts["pooled"] = ffn_call[1][0]
    acts["preds"] = preds

    out = {}
    for k, v in acts.items():
        out[f"{case_name}/act/{k}"] = np.asarray(v, np.float32)
    for k, v in params.items():
        out[f"{case_name}/param/{k}"] = v
    out[f"{case_name}/in/x"] = x
    out[f"{case_name}/in/edge_attr"] = e
    out[f"{case_name}/in/senders"] = edge_index[0].astype(np.int32)
    out[f"{case_name}/in/receivers"] = edge_index[1].astype(np.int32)
    out[f"{case_name}/in/n_nodes"] = n_nodes
    out[f"{case_name}/in/n_edges"] = n_edges
    out[f"{case_name}/meta"] = np.asarray(
        [depth, hidden, int(learnable_skip)], np.int64)
    out[f"{case_name}/meta_str"] = np.asarray([act_name, aggr, pooling])
    return out


# ---------------------------------------------------------------------------
# optional: reference featurizer goldens (needs RDKit; connected host only)
# ---------------------------------------------------------------------------

def dump_featurizer_goldens(corpus_csv: str, out_path: str):
    try:
        import rdkit  # noqa: F401
    except ImportError:
        print("RDKit not importable here — featurizer goldens must be "
              "dumped on a host with the reference's environment "
              "(requirements.txt).  Skipping.")
        return False
    sys.path.insert(0, str(REFERENCE))
    from cgr_mpnn_3D.utils.graph_features import RxnGraph  # noqa

    out = {}
    smis = [line.split(",")[0] for line in
            Path(corpus_csv).read_text().splitlines()[1:] if line.strip()]
    for i, smi in enumerate(smis):
        g = RxnGraph(smi)
        out[f"r{i}/f_atoms"] = np.asarray(g.f_atoms, np.float32)
        out[f"r{i}/f_bonds"] = np.asarray(g.f_bonds, np.float32)
        out[f"r{i}/edge_index"] = np.asarray(g.edge_index, np.int64)
        out[f"r{i}/smiles"] = np.asarray([smi])
    np.savez_compressed(out_path, **out)
    print(f"wrote featurizer goldens for {len(smis)} reactions -> "
          f"{out_path}")
    return True


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(
        REPO / "tests" / "goldens" / "reference_gnn.npz"))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--featurizer-corpus", default=None,
                    help="CSV of reaction SMILES; dumps RDKit featurizer "
                         "goldens when rdkit is importable")
    ap.add_argument("--featurizer-out", default=str(
        REPO / "tests" / "goldens" / "reference_featurizer.npz"))
    args = ap.parse_args(argv)

    gnn_mod = _load_reference_gnn()
    rng = np.random.default_rng(args.seed)

    out = {}
    synth = synthetic_batch(rng, n_graphs=8, f_node=21, f_edge=9)
    demo = demo_batch()
    demo_3d = demo_batch(extra_dim=24, seed=3)

    import zlib
    for cname, (depth, hidden, act, aggr, skip, pool) in CONFIGS.items():
        out.update(run_case(gnn_mod, f"synth_{cname}", synth, depth, hidden,
                            act, aggr, skip,
                            param_seed=zlib.crc32(cname.encode()),
                            pooling=pool))
    out.update(run_case(gnn_mod, "demo_flagship", demo, 4, 64, "ReLU",
                        "add", False, param_seed=11))
    out.update(run_case(gnn_mod, "demo_defaults", demo, 3, 48, "ReLU",
                        "add", False, param_seed=12))
    out.update(run_case(gnn_mod, "demo_3d_skip", demo_3d, 2, 40, "ReLU",
                        "add", True, param_seed=13))

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(args.out, **out)
    ncases = len({k.split("/")[0] for k in out})
    print(f"wrote {ncases} golden cases ({len(out)} arrays) -> {args.out}")

    if args.featurizer_corpus:
        dump_featurizer_goldens(args.featurizer_corpus, args.featurizer_out)


if __name__ == "__main__":
    main()
