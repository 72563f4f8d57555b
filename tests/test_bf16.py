"""bf16 accuracy leg (VERDICT r4 weak #1).

Every headline throughput number (16.31 Medge/s, EP 15.72, device_epoch
1400 steps/s) is measured at ``--dtype bfloat16`` and the T1x runbook
defaults to bf16 — so bf16 needs accuracy evidence that does not depend on
the (env-blocked) T1x download:

1. forward tolerance vs f32 on real corpus chemistry, XLA path AND the
   Pallas fused path including aggr/pooling='mean' — the mean paths fold
   the 1/in-degree column scale into the bf16 one-hot entries
   (ops/pallas_fused.mean_colscale) while the XLA oracle scales by f32
   inv_deg, a quantization difference previously untested (ADVICE r4 #1);
2. a teacher-task end-to-end training duel: the same config trained at
   f32 vs bf16 with the reference recipe (Adam-amsgrad + ExponentialLR +
   MSE-sum, nonzero dropout) must reach the same final fit quality — the
   harness of tests/test_optimizer_parity.py::test_training_duel_rmse_parity,
   torch-free;
3. the one-kernel fused train step's bf16 loss/gradients agree with the
   f32 XLA oracle in direction and magnitude.

Reference contract: trainer.py:124-155 recipe; README.md:152-158 RMSE
targets (gated on a connected host by cli/runbook.py, whose dtype default
is justified by these tests).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cgr_mpnn_3d_tpu.chem import RxnGraph
from cgr_mpnn_3d_tpu.data import PackSpec, pack_graphs, plan_spec
from cgr_mpnn_3d_tpu.models import CGRMPNNConfig, apply, init_params
from cgr_mpnn_3d_tpu.models.cgr_mpnn import (fused_train_value_and_grad,
                                             supports_fused_train)
from cgr_mpnn_3d_tpu.train.trainer import (make_optimizer, set_epoch_lr,
                                           sse_loss)

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def corpus_graphs():
    rows = (REPO / "tests" / "corpus_reactions.csv"
            ).read_text().splitlines()[1:]
    smis = [r.split(",")[0] for r in rows if r.strip()][:96]
    return [RxnGraph(s).arrays for s in smis]


def _cfg(graphs, dtype, **kw):
    return CGRMPNNConfig(num_node_features=graphs[0].node_feats.shape[1],
                         num_edge_features=graphs[0].edge_feats.shape[1],
                         depth=2, hidden_sizes=(32, 32),
                         dropout_ps=(0.0, 0.0), compute_dtype=dtype, **kw)


def _rel_l2(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12))


class TestForwardTolerance:
    """Golden-forward bf16 bounds: the bf16 forward must stay within the
    expected 8-bit-mantissa drift of the f32 forward — and must actually
    be running in bf16 (a dtype plumbing regression that silently kept
    f32 would pass a pure tolerance check)."""

    def test_xla_forward_bf16_close_to_f32(self, corpus_graphs):
        gs = corpus_graphs[:32]
        labels = [0.0] * len(gs)
        spec = plan_spec(gs, te=128, tn=64, tb=8).with_packs(8)
        batch = pack_graphs(gs, labels, spec)
        cfg32 = _cfg(gs, jnp.float32)
        params = init_params(jax.random.PRNGKey(0), cfg32)
        p32 = apply(params, batch, cfg32)
        p16 = apply(params, batch, _cfg(gs, jnp.bfloat16))
        mask = np.asarray(batch.graph_mask) > 0
        err = _rel_l2(np.asarray(p16)[mask], np.asarray(p32)[mask])
        # measured ~2e-3 on this corpus at depth 2; bound at ~5x headroom
        assert err < 1e-2, f"bf16 forward drift {err:.2e} vs f32"
        assert err > 0.0, "bf16 path produced bit-identical output to " \
                          "f32 — compute_dtype is not being applied"

    @pytest.mark.parametrize("aggr,pooling", [("add", "add"),
                                              ("mean", "mean"),
                                              ("mean", "add")])
    def test_pallas_fused_bf16_close_to_f32_oracle(self, corpus_graphs,
                                                   aggr, pooling):
        """The fused kernels at bf16 (incl. mean_colscale's bf16-quantized
        1/in-degree entries) vs the f32 XLA oracle (which uses f32
        inv_deg) — ADVICE r4 #1's untested quantization path."""
        gs = corpus_graphs[:16]
        labels = [0.0] * len(gs)
        spec = plan_spec(gs, te=128, tn=64, tb=8).with_packs(4)
        batch = pack_graphs(gs, labels, spec)
        cfg32 = _cfg(gs, jnp.float32, aggr=aggr, pooling=pooling)
        cfg16 = _cfg(gs, jnp.bfloat16, aggr=aggr, pooling=pooling,
                     use_pallas=True, pallas_interpret=True)
        params = init_params(jax.random.PRNGKey(1), cfg32)
        p32 = apply(params, batch, cfg32)
        p16 = apply(params, batch, cfg16, spec)
        mask = np.asarray(batch.graph_mask) > 0
        err = _rel_l2(np.asarray(p16)[mask], np.asarray(p32)[mask])
        assert err < 1.5e-2, \
            f"fused bf16 {aggr}/{pooling} drift {err:.2e} vs f32 oracle"


class TestFusedTrainStep:
    def test_fused_bf16_loss_and_grads_track_f32_oracle(self, corpus_graphs):
        gs = corpus_graphs[:16]
        labels = [float(i % 7 - 3) for i in range(len(gs))]
        spec = plan_spec(gs, te=128, tn=64, tb=8).with_packs(4)
        batch = pack_graphs(gs, labels, spec)
        cfg32 = _cfg(gs, jnp.float32)
        cfg16 = _cfg(gs, jnp.bfloat16, use_pallas=True,
                     pallas_interpret=True)
        assert supports_fused_train(cfg16)
        params = init_params(jax.random.PRNGKey(2), cfg32)
        l32, g32 = jax.value_and_grad(sse_loss)(params, batch, cfg32,
                                                False, None)
        l16, g16 = fused_train_value_and_grad(params, batch, cfg16, spec,
                                              jax.random.PRNGKey(0))
        np.testing.assert_allclose(float(l16), float(l32), rtol=2e-2)
        flat32 = np.concatenate([np.asarray(x, np.float64).ravel()
                                 for x in jax.tree_util.tree_leaves(g32)])
        flat16 = np.concatenate([np.asarray(x, np.float64).ravel()
                                 for x in jax.tree_util.tree_leaves(g16)])
        cos = float(flat16 @ flat32 /
                    (np.linalg.norm(flat16) * np.linalg.norm(flat32)))
        assert cos > 0.995, f"bf16 fused grads misaligned: cos={cos:.4f}"
        assert _rel_l2(flat16, flat32) < 0.1


class TestTrainingDuel:
    def test_bf16_vs_f32_final_rmse_parity(self, corpus_graphs):
        """Same config, same seed, same reference recipe (Adam-amsgrad +
        per-epoch ExponentialLR + MSE-sum, dropout 0.1) trained at f32 vs
        bf16 on a fixed-teacher task — final fit quality must land in the
        same place.  This is the in-image justification for the bf16
        default of bench.py and cli/runbook.py."""
        gs = corpus_graphs
        teacher_cfg = _cfg(gs, jnp.float32)
        teacher = init_params(jax.random.PRNGKey(5), teacher_cfg)

        bs = 32
        spec = plan_spec(gs, te=128, tn=64, tb=8).with_packs(8)
        chunks = [gs[i:i + bs] for i in range(0, len(gs), bs)]
        # teacher labels at f32 (the "dataset" both dtypes must fit)
        batches0 = [pack_graphs(c, [0.0] * len(c), spec) for c in chunks]
        labels = [np.asarray(apply(teacher, b, teacher_cfg), np.float32)
                  for b in batches0]
        batches = [b._replace(labels=np.asarray(y))
                   for b, y in zip(batches0, labels)]
        n_graphs = sum(len(c) for c in chunks)

        lr, wd, gamma, n_epochs = 5e-3, 1e-5, 0.95, 12
        dropout = 0.1

        def train_at(dtype):
            cfg = CGRMPNNConfig(
                num_node_features=gs[0].node_feats.shape[1],
                num_edge_features=gs[0].edge_feats.shape[1],
                depth=2, hidden_sizes=(32, 32),
                dropout_ps=(dropout, dropout), compute_dtype=dtype)
            params = init_params(jax.random.PRNGKey(13), cfg)
            tx = make_optimizer(lr, wd)
            state = tx.init(params)
            step = jax.jit(lambda p, b, k: jax.value_and_grad(
                sse_loss)(p, b, cfg, True, k, spec))
            key = jax.random.PRNGKey(0)
            for epoch in range(n_epochs):
                state = set_epoch_lr(state, lr, gamma, epoch)
                for b in batches:
                    key, sub = jax.random.split(key)
                    _, grads = step(params, b, sub)
                    upd, state = tx.update(grads, state, params)
                    params = optax.apply_updates(params, upd)
            ev = jax.jit(lambda p, b: sse_loss(p, b, cfg, False, None,
                                               spec))
            sse = sum(float(ev(params, b)) for b in batches)
            return float(np.sqrt(sse / n_graphs))

        rmse32 = train_at(jnp.float32)
        rmse16 = train_at(jnp.bfloat16)
        assert rmse16 < rmse32 * 1.25 + 0.05, \
            f"bf16 training degraded: {rmse16:.4f} vs f32 {rmse32:.4f}"
        assert rmse32 < rmse16 * 1.25 + 0.05, \
            f"suspicious (f32 worse): {rmse32:.4f} vs bf16 {rmse16:.4f}"
