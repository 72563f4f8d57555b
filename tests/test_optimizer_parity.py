"""Training-dynamics parity against the LIVE torch reference optimizer.

The reference trains with ``torch.optim.Adam(amsgrad=True, weight_decay=wd)``
+ ``ExponentialLR(gamma)`` stepped per epoch + ``MSELoss(reduction='sum')``
(/root/reference/train.py:117-121,
/root/reference/cgr_mpnn_3D/training/trainer.py:124-155,212).  Forward parity
was already proven per-layer (tests/test_reference_goldens.py); these tests
prove the *optimizer dynamics* match by running the real torch optimizer
side-by-side with this repo's ``make_optimizer``/``set_epoch_lr``:

1. pure-optimizer trajectory parity on an adversarial gradient sequence
   (early second-moment spike) that distinguishes torch's raw-max amsgrad
   from optax's bias-corrected-max variant — asserted to ~f32 exactness;
2. end-to-end: the reference GNN (imported unmodified, run live under
   torch-CPU) trained by the real torch recipe vs this repo's model+trainer
   step on identical init/batches for 3 epochs across LR-decay boundaries —
   per-step losses and final parameters must match.

Either test FAILS if make_optimizer or set_epoch_lr drift from torch
semantics (e.g. reverting to optax.amsgrad fails test 1 at step 2).
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

import numpy as np
import optax
import pytest

import jax.numpy as jnp

from cgr_mpnn_3d_tpu.chem.featurize import GraphArrays
from cgr_mpnn_3d_tpu.data import PackSpec, pack_graphs
from cgr_mpnn_3d_tpu.models import CGRMPNNConfig, apply, init_params
from cgr_mpnn_3d_tpu.train.trainer import (make_optimizer, set_epoch_lr,
                                           sse_loss)

REPO = Path(__file__).resolve().parent.parent

torch = pytest.importorskip("torch")


def _load_dump_tools():
    """Import tools/dump_reference_goldens.py (reference loader + helpers)."""
    spec = importlib.util.spec_from_file_location(
        "dump_reference_goldens", REPO / "tools" / "dump_reference_goldens.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# 1. optimizer-only trajectory parity
# ---------------------------------------------------------------------------

def test_amsgrad_trajectory_matches_torch():
    """make_optimizer == torch Adam(amsgrad=True, weight_decay) with
    set_epoch_lr == ExponentialLR per epoch, to f32 round-off, on a
    gradient sequence with an early second-moment spike (the case where
    optax.amsgrad's bias-corrected max diverges by ~1000x at step 1)."""
    rng = np.random.default_rng(0)
    shape = (7, 5)
    p0 = rng.standard_normal(shape).astype(np.float32)
    grads = [rng.standard_normal(shape).astype(np.float32)
             * (10.0 if i == 1 else 0.1) for i in range(24)]
    lr, wd, gamma, steps_per_epoch = 1e-3, 1e-5, 0.9, 8

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.Adam([tp], lr=lr, weight_decay=wd, amsgrad=True)
    sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma)
    t_traj = []
    for i, g in enumerate(grads):
        opt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        opt.step()
        t_traj.append(tp.detach().numpy().copy())
        if (i + 1) % steps_per_epoch == 0:
            sched.step()                         # trainer.py:212 parity

    params = {"w": jnp.asarray(p0)}
    tx = make_optimizer(lr, wd)
    state = tx.init(params)
    for i, g in enumerate(grads):
        state = set_epoch_lr(state, lr, gamma, i // steps_per_epoch)
        upd, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, upd)
        np.testing.assert_allclose(
            np.asarray(params["w"]), t_traj[i], rtol=0, atol=5e-6,
            err_msg=f"param divergence from torch Adam at step {i}")


def test_amsgrad_no_weight_decay_matches_torch():
    """wd=0 path (make_optimizer skips add_decayed_weights entirely)."""
    rng = np.random.default_rng(3)
    p0 = rng.standard_normal((11,)).astype(np.float32)
    grads = [rng.standard_normal((11,)).astype(np.float32) for _ in range(10)]

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.Adam([tp], lr=3e-3, amsgrad=True)
    for g in grads:
        opt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        opt.step()

    params = {"w": jnp.asarray(p0)}
    tx = make_optimizer(3e-3, 0.0)
    state = tx.init(params)
    for g in grads:
        upd, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, upd)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tp.detach().numpy(), rtol=0, atol=5e-6)


# ---------------------------------------------------------------------------
# 2. end-to-end training-dynamics parity vs the live reference
# ---------------------------------------------------------------------------

def _to_graph_arrays(case_graphs):
    return [GraphArrays(
        node_feats=g.node_feats, edge_feats=g.edge_feats,
        senders=g.senders, receivers=g.receivers,
        rev_edge_index=(np.arange(len(g.senders), dtype=np.int32) ^ 1))
        for g in case_graphs]


def _pack_all(graphs, labels):
    E = sum(g.num_edges for g in graphs)
    N = sum(g.num_nodes for g in graphs)
    B = len(graphs)
    deg = max(int(np.bincount(g.receivers).max()) for g in graphs
              if g.num_edges)
    dn = max(g.num_nodes for g in graphs)
    spec = PackSpec(te=E + 2, tn=N + 2, tb=B + 1, d=deg + 1, dn=dn, p=1)
    return pack_graphs(graphs, labels, spec), spec


def test_training_dynamics_parity_vs_live_reference():
    """Reference GNN + torch Adam(amsgrad)+ExponentialLR+MSE(sum) vs this
    repo's apply + make_optimizer + set_epoch_lr: identical init and batch
    sequence for 3 epochs (gamma=0.9 decays at each boundary) — per-step
    losses and final parameters must track (VERDICT r3 missing #1)."""
    mod = _load_dump_tools()
    gnn_mod = mod._load_reference_gnn()

    depth, hidden = 3, 48
    lr, wd, gamma = 5e-3, 1e-5, 0.9
    n_epochs, n_batches = 3, 3

    rng = np.random.default_rng(7)
    batches = [mod.synthetic_batch(rng, n_graphs=6, f_node=21, f_edge=9)
               for _ in range(n_batches)]
    labels = [rng.standard_normal(len(b)).astype(np.float32) * 5.0
              for b in batches]

    import torch.nn.functional as F
    model = gnn_mod.GNN(
        num_node_features=21, num_edge_features=9, depth=depth,
        hidden_sizes=[hidden] * depth, dropout_ps=[0.0] * depth,
        activation_fn=F.relu, aggr="add", use_learnable_skip=False)
    model.train()
    dumped = mod.seed_params(model, np.random.default_rng(11),
                             learnable_skip=False)

    opt = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=wd,
                           amsgrad=True)
    sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma)
    crit = torch.nn.MSELoss(reduction="sum")

    import types
    torch_batches = []
    for bg in batches:
        x, e, edge_index, bvec, _, _ = mod.disjoint_union(bg)
        torch_batches.append(types.SimpleNamespace(
            x=torch.from_numpy(x), edge_index=torch.from_numpy(edge_index),
            edge_attr=torch.from_numpy(e), batch=torch.from_numpy(bvec)))

    t_losses = []
    for _epoch in range(n_epochs):
        for data, y in zip(torch_batches, labels):
            opt.zero_grad()
            pred = model(data)
            loss = crit(pred, torch.from_numpy(y))
            loss.backward()
            opt.step()
            t_losses.append(float(loss.item()))
        sched.step()                                  # trainer.py:212

    # ---- this framework, same init / batches / recipe -------------------
    params = {
        "edge_init": {"w": jnp.asarray(dumped["edge_init.w"]),
                      "b": jnp.asarray(dumped["edge_init.b"])},
        "convs": [{"w": jnp.asarray(dumped[f"convs.{l}.w"]),
                   "b": jnp.asarray(dumped[f"convs.{l}.b"])}
                  for l in range(depth)],
        "edge_to_node": {"w": jnp.asarray(dumped["edge_to_node.w"]),
                         "b": jnp.asarray(dumped["edge_to_node.b"])},
        "ffn": {"w": jnp.asarray(dumped["ffn.w"]),
                "b": jnp.asarray(dumped["ffn.b"])},
    }
    cfg = CGRMPNNConfig(num_node_features=21, num_edge_features=9,
                        depth=depth, hidden_sizes=(hidden,) * depth,
                        dropout_ps=(0.0,) * depth)
    packed = [_pack_all(_to_graph_arrays(bg), list(y))
              for bg, y in zip(batches, labels)]

    import jax
    tx = make_optimizer(lr, wd)
    state = tx.init(params)
    grad_fn = jax.jit(jax.value_and_grad(
        lambda p, b: sse_loss(p, b, cfg, False, None, packed[0][1])))

    j_losses = []
    for epoch in range(n_epochs):
        state = set_epoch_lr(state, lr, gamma, epoch)
        for batch, _spec in packed:
            loss, grads = grad_fn(params, batch)
            upd, state = tx.update(grads, state, params)
            params = optax.apply_updates(params, upd)
            j_losses.append(float(loss))

    np.testing.assert_allclose(
        j_losses, t_losses, rtol=2e-3,
        err_msg="per-step loss trajectory diverged from the live torch "
                "reference (Adam-amsgrad/ExponentialLR/MSE-sum semantics)")
    # final parameters: identical trajectories => identical weights
    for name, ours in [("edge_init.w", params["edge_init"]["w"]),
                       ("edge_to_node.w", params["edge_to_node"]["w"]),
                       ("ffn.w", params["ffn"]["w"]),
                       *[(f"convs.{l}.w", params["convs"][l]["w"])
                         for l in range(depth)]]:
        ref = {"edge_init.w": model.edge_init.weight,
               "edge_to_node.w": model.edge_to_node.weight,
               "ffn.w": model.ffn.weight,
               **{f"convs.{l}.w": model.convs[l].lin.weight
                  for l in range(depth)}}[name]
        np.testing.assert_allclose(
            np.asarray(ours), ref.detach().numpy().T, rtol=0, atol=2e-4,
            err_msg=f"final params diverged from torch: {name}")


def test_training_duel_rmse_parity():
    """End-to-end accuracy duel on in-image data (VERDICT r3 next #7):
    both frameworks train the same model config with the reference recipe
    (incl. nonzero dropout => independent RNG streams) on a fixed-teacher
    regression task built from the featurizer corpus; final train RMSEs
    must land in the same place even though trajectories are stochastic."""
    mod = _load_dump_tools()
    gnn_mod = mod._load_reference_gnn()
    import types

    import torch.nn.functional as F

    # corpus chemistry, this repo's featurizer (RDKit absent; identical
    # inputs on both sides is what matters — cf. tests/test_corpus.py)
    from cgr_mpnn_3d_tpu.chem import RxnGraph
    rows = (REPO / "tests" / "corpus_reactions.csv"
            ).read_text().splitlines()[1:]
    smis = [r.split(",")[0] for r in rows if r.strip()][:96]
    graphs = [RxnGraph(s).arrays for s in smis]

    depth, hidden = 2, 32
    lr, wd, gamma = 5e-3, 1e-5, 0.95
    dropout = 0.1
    n_epochs, bs = 12, 32

    # fixed teacher: a seeded reference GNN labels the corpus
    teacher = gnn_mod.GNN(num_node_features=graphs[0].node_feats.shape[1],
                          num_edge_features=graphs[0].edge_feats.shape[1],
                          depth=2, hidden_sizes=[24] * 2,
                          dropout_ps=[0.0] * 2, activation_fn=F.relu,
                          aggr="add", use_learnable_skip=False)
    mod.seed_params(teacher, np.random.default_rng(5), learnable_skip=False)
    teacher.eval()

    def torch_data(gs):
        case = [types.SimpleNamespace(node_feats=g.node_feats,
                                      edge_feats=g.edge_feats,
                                      senders=g.senders,
                                      receivers=g.receivers) for g in gs]
        x, e, edge_index, bvec, _, _ = mod.disjoint_union(case)
        return types.SimpleNamespace(
            x=torch.from_numpy(x), edge_index=torch.from_numpy(edge_index),
            edge_attr=torch.from_numpy(e), batch=torch.from_numpy(bvec))

    with torch.no_grad():
        labels = np.concatenate(
            [teacher(torch_data(graphs[i:i + bs])).numpy()
             for i in range(0, len(graphs), bs)]).astype(np.float32)

    batches = [(graphs[i:i + bs], labels[i:i + bs])
               for i in range(0, len(graphs), bs)]

    # ---- torch student ---------------------------------------------------
    student = gnn_mod.GNN(num_node_features=graphs[0].node_feats.shape[1],
                          num_edge_features=graphs[0].edge_feats.shape[1],
                          depth=depth, hidden_sizes=[hidden] * depth,
                          dropout_ps=[dropout] * depth, activation_fn=F.relu,
                          aggr="add", use_learnable_skip=False)
    dumped = mod.seed_params(student, np.random.default_rng(13),
                             learnable_skip=False)
    opt = torch.optim.Adam(student.parameters(), lr=lr, weight_decay=wd,
                           amsgrad=True)
    sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma)
    crit = torch.nn.MSELoss(reduction="sum")
    tds = [(torch_data(gs), torch.from_numpy(y)) for gs, y in batches]
    student.train()
    torch.manual_seed(0)
    for _ in range(n_epochs):
        for data, y in tds:
            opt.zero_grad()
            loss = crit(student(data), y)
            loss.backward()
            opt.step()
        sched.step()
    student.eval()
    with torch.no_grad():
        sse = sum(float(crit(student(d), y).item()) for d, y in tds)
    torch_rmse = float(np.sqrt(sse / len(graphs)))

    # ---- this framework, same recipe, own RNG ---------------------------
    import jax
    cfg = CGRMPNNConfig(num_node_features=graphs[0].node_feats.shape[1],
                        num_edge_features=graphs[0].edge_feats.shape[1],
                        depth=depth, hidden_sizes=(hidden,) * depth,
                        dropout_ps=(dropout,) * depth)
    params = {
        "edge_init": {"w": jnp.asarray(dumped["edge_init.w"]),
                      "b": jnp.asarray(dumped["edge_init.b"])},
        "convs": [{"w": jnp.asarray(dumped[f"convs.{l}.w"]),
                   "b": jnp.asarray(dumped[f"convs.{l}.b"])}
                  for l in range(depth)],
        "edge_to_node": {"w": jnp.asarray(dumped["edge_to_node.w"]),
                         "b": jnp.asarray(dumped["edge_to_node.b"])},
        "ffn": {"w": jnp.asarray(dumped["ffn.w"]),
                "b": jnp.asarray(dumped["ffn.b"])},
    }
    packed = [_pack_all(gs, list(y)) for gs, y in batches]
    # all batches share the max-size spec so ONE jitted step serves all
    mspec = PackSpec(te=max(s.te for _, s in packed),
                     tn=max(s.tn for _, s in packed),
                     tb=max(s.tb for _, s in packed),
                     d=max(s.d for _, s in packed),
                     dn=max(s.dn for _, s in packed), p=1)
    packed = [pack_graphs(gs, list(y), mspec) for gs, y in batches]

    tx = make_optimizer(lr, wd)
    state = tx.init(params)
    step = jax.jit(lambda p, b, k: jax.value_and_grad(
        sse_loss)(p, b, cfg, True, k, mspec))
    key = jax.random.PRNGKey(0)
    for epoch in range(n_epochs):
        state = set_epoch_lr(state, lr, gamma, epoch)
        for batch in packed:
            key, sub = jax.random.split(key)
            loss, grads = step(params, batch, sub)
            upd, state = tx.update(grads, state, params)
            params = optax.apply_updates(params, upd)
    eval_fn = jax.jit(lambda p, b: sse_loss(p, b, cfg, False, None, mspec))
    sse = sum(float(eval_fn(params, b)) for b in packed)
    jax_rmse = float(np.sqrt(sse / len(graphs)))

    # same recipe, same data, independent dropout RNG: final fit quality
    # must land in the same place (ratio bound, not bitwise)
    assert jax_rmse < torch_rmse * 1.25 + 0.05, \
        f"duel lost: ours {jax_rmse:.4f} vs torch {torch_rmse:.4f}"
    assert torch_rmse < jax_rmse * 1.25 + 0.05, \
        f"duel suspicious (torch worse): {torch_rmse:.4f} vs {jax_rmse:.4f}"
