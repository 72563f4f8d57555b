"""Real 2-process jax.distributed execution (VERDICT r1 gap #6).

Two OS processes with 2 virtual CPU devices each form a 4-device global
'dp' mesh; the shard_map'd train step's gradient psum crosses the process
boundary (the DCN path on real pods).  Both processes must agree on the
loss/updated parameters, and those must match single-process training on
the same 8 graphs (tests/_multiproc_child.py).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cgr_mpnn_3d_tpu.data import ChemDataset  # noqa: F401 (jax init order)
from cgr_mpnn_3d_tpu.chem import RxnGraph
from cgr_mpnn_3d_tpu.data import pack_graphs, plan_spec
from cgr_mpnn_3d_tpu.models import CGRMPNNConfig, init_params
from cgr_mpnn_3d_tpu.train import make_optimizer, sse_loss

REPO = Path(__file__).resolve().parent.parent
CHILD = Path(__file__).resolve().parent / "_multiproc_child.py"
TRAINER_CHILD = Path(__file__).resolve().parent / \
    "_multiproc_trainer_child.py"

SMILES = ["CCO>>CC=O", "CC(=O)N>>CC(=O)N", "C=CC=C>>C=CC=C",
          "[N:1]([H:2])([H:3])[H:4]>>[N:1]([H:2])[H:3].[H:4]",
          "CCO>C>CCO", "O>C>CO", "N>C>CN", "CC>>CC"]
LABELS = [float(i + 1) for i in range(len(SMILES))]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference():
    cfg = CGRMPNNConfig(num_node_features=78, num_edge_features=14,
                        depth=2, hidden_sizes=(16, 16),
                        dropout_ps=(0.0, 0.0))
    graphs = [RxnGraph(s).arrays for s in SMILES]
    spec = plan_spec(graphs, te=128, tn=64, tb=8).with_packs(1)
    batch = pack_graphs(graphs, LABELS, spec)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-3, 0.0, 1.0, 1)
    loss, grads = jax.value_and_grad(
        lambda p: sse_loss(p, batch, cfg, False, None))(params)
    updates, _ = opt.update(grads, opt.init(params), params)
    new_params = optax.apply_updates(params, updates)
    checksum = float(sum(float(jnp.sum(jnp.abs(leaf)))
                         for leaf in jax.tree_util.tree_leaves(new_params)))
    return float(loss), checksum


def _single_process_ep_reference():
    """Same EP batch/step as the children, on one process's own 2 devices."""
    from jax.sharding import Mesh

    from cgr_mpnn_3d_tpu.chem.featurize import GraphArrays
    from cgr_mpnn_3d_tpu.parallel import (make_ep_pack_train_step,
                                          pack_shard_edges)
    from cgr_mpnn_3d_tpu.train import TrainState

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

    cfg = CGRMPNNConfig(num_node_features=78, num_edge_features=14,
                        depth=2, hidden_sizes=(16, 16),
                        dropout_ps=(0.0, 0.0))
    graphs = [RxnGraph(s).arrays for s in SMILES]
    ep_graphs = [chain(100)] + graphs[:4]
    ep_labels = [2.0] + LABELS[:4]
    eb, espec = pack_shard_edges(ep_graphs, ep_labels, 2, te=64, tn=32)
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(1, 2), ("dp", "ep"))
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-3, 0.0, 1.0, 1)
    step = make_ep_pack_train_step(opt, cfg, mesh, espec)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32),
                       jax.random.PRNGKey(1))
    stacked = jax.tree_util.tree_map(lambda v: v[None], eb)
    new_state, loss, _ = step(state, stacked)
    checksum = float(sum(float(jnp.sum(jnp.abs(leaf)))
                         for leaf in jax.tree_util.tree_leaves(
                             new_state.params)))
    return float(loss), checksum


def test_two_process_distributed_training():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, str(CHILD), str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=str(REPO), env=env) for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"child failed:\n{out}\n{err}"
        outs.append(out)

    def parse(out, key):
        line = next(ln for ln in out.splitlines() if ln.startswith(key))
        return line.split()[1]

    losses = [float(parse(o, "LOSS")) for o in outs]
    checks = [float(parse(o, "CHECKSUM")) for o in outs]
    ep_losses = [float(parse(o, "EPLOSS")) for o in outs]
    ep_checks = [float(parse(o, "EPCHECKSUM")) for o in outs]
    primaries = [parse(o, "PRIMARY") for o in outs]
    # both processes agree bit-for-bit on the psum'd loss and update
    assert losses[0] == losses[1]
    assert checks[0] == checks[1]
    assert sorted(primaries) == ["False", "True"]
    # and they match single-process training on the concatenated batch
    loss_ref, check_ref = _single_process_reference()
    np.testing.assert_allclose(losses[0], loss_ref, rtol=1e-5)
    np.testing.assert_allclose(checks[0], check_ref, rtol=1e-5)
    # EP phase: the ring boundary exchange crossed the OS-process boundary
    # and both processes agree with single-process EP on the same batch
    assert ep_losses[0] == ep_losses[1]
    assert ep_checks[0] == ep_checks[1]
    ep_loss_ref, ep_check_ref = _single_process_ep_reference()
    np.testing.assert_allclose(ep_losses[0], ep_loss_ref, rtol=1e-5)
    np.testing.assert_allclose(ep_checks[0], ep_check_ref, rtol=1e-5)


# ---------------------------------------------------------------------------
# The SHIPPED trainer across 2 OS processes (VERDICT r4 ask #1): the child
# runs RxnGraphTrainer itself (the object cli/train.py builds) on a global
# 4-device mesh spanning 2 processes, in seven phases — dp, dp+reuse_packs,
# the composed dp x ep mesh through EPPackLoader, device_epoch on the dp
# and composed meshes, resume from the primary-written checkpoint, and a
# tight-spec shrink-and-carry window plan.  Both processes must agree, and
# must match the single-process trainer on the same data/seed.
# ---------------------------------------------------------------------------

MH_TRAIN_SMILES = SMILES + SMILES[:4]
MH_TRAIN_LABELS = LABELS + [float(i + 10) for i in range(4)]
MH_VAL_SMILES = SMILES[4:]
MH_VAL_LABELS = [float(i + 2) for i in range(4)]


def _write_mh_csvs(data_dir: Path) -> None:
    data_dir.mkdir(parents=True, exist_ok=True)
    for name, smis, labs in [("train", MH_TRAIN_SMILES, MH_TRAIN_LABELS),
                             ("val", MH_VAL_SMILES, MH_VAL_LABELS)]:
        with open(data_dir / f"{name}.csv", "w") as f:
            f.write("smiles,ea\n")
            for s, y in zip(smis, labs):
                f.write(f"{s},{y}\n")


def _trainer_phase_kwargs(phase: str, data_dir: Path, out_dir: Path):
    """Mirror of _multiproc_trainer_child.run_phase's config (kept in sync
    so parent and children train the identical recipe)."""
    from cgr_mpnn_3d_tpu.data import plan_spec
    from cgr_mpnn_3d_tpu.models import CGRMPNNConfig

    train_data = ChemDataset(str(data_dir / "train.csv"))
    val_data = ChemDataset(str(data_dir / "val.csv"))
    cfg = CGRMPNNConfig(num_node_features=78, num_edge_features=14,
                        depth=2, hidden_sizes=(16, 16),
                        dropout_ps=(0.0, 0.0))
    graphs = [train_data.graph(i) for i in range(len(train_data))]
    if phase == "dpcarry":
        spec = plan_spec(graphs, te=8, tn=8, tb=2)
    else:
        spec = plan_spec(graphs, te=64, tn=48, tb=2)
    kw = dict(name=f"mh-{phase}", cfg=cfg, train_data=train_data,
              val_data=val_data, spec=spec, lr=1e-3, num_epochs=2,
              val_frequency=1, seed=0, model_save_dir=str(out_dir / phase))
    if phase == "dp":
        kw.update(n_dp=4, batch_size=8)
    elif phase == "dpreuse":
        kw.update(n_dp=4, batch_size=8, reuse_packs=True, num_epochs=3)
    elif phase == "dpep":
        kw.update(n_dp=2, n_ep=2, batch_size=4, ep_te=64, ep_tn=48)
    elif phase == "dpde":
        kw.update(n_dp=4, batch_size=8, reuse_packs=True,
                  device_epoch=True, num_epochs=2)
    elif phase == "dpepde":
        kw.update(n_dp=2, n_ep=2, batch_size=4, ep_te=64, ep_tn=48,
                  reuse_packs=True, device_epoch=True, num_epochs=2)
    elif phase == "dpresume":
        kw.update(n_dp=4, batch_size=8, num_epochs=3,
                  resume_from=str(out_dir / "dp" / "mh-dp.latest.npz"))
    elif phase == "dpcarry":
        kw.update(n_dp=4, batch_size=8)
    return kw


def _single_process_trainer(phase: str, data_dir: Path, out_dir: Path):
    from cgr_mpnn_3d_tpu.train import RxnGraphTrainer

    tr = RxnGraphTrainer(**_trainer_phase_kwargs(phase, data_dir, out_dir))
    out = tr.train()
    checksum = float(sum(float(jnp.sum(jnp.abs(leaf)))
                         for leaf in jax.tree_util.tree_leaves(
                             tr.state.params)))
    return {"train": out["train_losses"], "val": out["val_losses"],
            "checksum": checksum}


def test_two_process_cli_train_smoke(tmp_path):
    """The PRODUCTION multi-host launch path: two OS processes run the
    actual `cli.train` command with the coordinator from the standard
    env vars (exactly how a pod host launches).  Primary-only side
    effects: checkpoints, metrics JSONL, results json, the post-train
    eval; the non-primary returns quietly after training."""
    import json as _json

    data_dir = tmp_path / "data"
    _write_mh_csvs(data_dir)
    # cli.train without --skip_test evaluates on the test split (primary)
    (data_dir / "test.csv").write_text(
        (data_dir / "val.csv").read_text())
    work = tmp_path / "work"
    work.mkdir()
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    child = Path(__file__).resolve().parent / "_multiproc_cli_child.py"
    procs = [subprocess.Popen(
        [sys.executable, str(child), str(i), str(port), str(data_dir),
         str(work)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=str(REPO), env=env) for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"cli child failed:\n{out}\n{err}"
        outs.append(out)
    assert all(f"CLI-DONE {i}" in outs[i] for i in range(2))
    # primary-only: results json written exactly once, with test metrics
    study = work / "hyperparameter_study" / "CGR_hyperparameter_study.json"
    assert study.exists()
    rec = _json.load(open(study))
    (run_key,) = rec.keys()
    assert "test_losses" in rec[run_key]
    # primary-only metrics JSONL exists and holds both epochs
    jsonl = list((work / "runs").glob("*.jsonl"))
    assert len(jsonl) == 1
    epochs = [_json.loads(ln) for ln in jsonl[0].read_text().splitlines()]
    assert sum(1 for r in epochs if "train_loss" in r) == 2
    # checkpoints written by the primary only (but visible to both)
    assert list((work / "saved").glob("CGR_*.npz"))


def test_two_process_config_mismatch_guard(tmp_path):
    """Different seeds across processes must fail LOUDLY at trainer
    construction (fingerprint allgather) — silent loader divergence would
    deadlock the collectives mid-run instead."""
    data_dir = tmp_path / "data"
    _write_mh_csvs(data_dir)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    child = Path(__file__).resolve().parent / "_multiproc_mismatch_child.py"
    procs = [subprocess.Popen(
        [sys.executable, str(child), str(i), str(port), str(data_dir)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=str(REPO), env=env) for i in range(2)]
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"child failed:\n{out}\n{err}"
        assert "GUARD caught" in out, out


def test_two_process_trainer_equality(tmp_path):
    import json

    data_dir = tmp_path / "data"
    _write_mh_csvs(data_dir)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, str(TRAINER_CHILD), str(i), str(port),
         str(data_dir), str(tmp_path / f"out")],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=str(REPO), env=env) for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"child failed:\n{out}\n{err}"
        outs.append(out)

    def parse(out, key):
        line = next(ln for ln in out.splitlines() if ln.startswith(key))
        return line[len(key) + 1:]

    results = [json.loads(parse(o, "RESULT")) for o in outs]
    assert sorted(parse(o, "PRIMARY") for o in outs) == ["False", "True"]
    # only the primary wrote checkpoints (best + latest, per phase)
    # the dpcarry phase's tight spec must actually shrink-and-carry, or
    # the multi-host window-plan equality it asserts is vacuous
    kw = _trainer_phase_kwargs("dpcarry", data_dir, tmp_path / "probe")
    from cgr_mpnn_3d_tpu.data.loader import PackedLoader
    ld = PackedLoader(kw["train_data"], kw["spec"], batch_size=2,
                      shuffle=True, seed=0)
    plan = ld.plan_windows(ld._order())
    assert any(len(w) < 2 for w in plan), "tight spec did not carry"

    for phase in ("dp", "dpreuse", "dpep", "dpde", "dpepde", "dpresume",
                  "dpcarry"):
        assert (tmp_path / "out" / phase / f"mh-{phase}.npz").exists()
        # both processes agree bit-for-bit
        assert results[0][phase] == results[1][phase], phase
        # and match the single-process trainer on the same data/seed
        ref = _single_process_trainer(phase, data_dir, tmp_path / "sp")
        np.testing.assert_allclose(results[0][phase]["train"],
                                   ref["train"], rtol=1e-5, err_msg=phase)
        np.testing.assert_allclose(results[0][phase]["val"],
                                   ref["val"], rtol=1e-5, err_msg=phase)
        np.testing.assert_allclose(results[0][phase]["checksum"],
                                   ref["checksum"], rtol=1e-5,
                                   err_msg=phase)
