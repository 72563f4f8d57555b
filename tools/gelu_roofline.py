"""GELU cliff decomposition (VERDICT r4 weak #4): is 7.3 Medge/s the
speed of light for exact-erf GELU on this chip?

Measures, on the real device:

1. VPU elementwise rate of the EXACT kernel op chains (ops/pallas_fused
   k_act/k_dact for relu/silu/gelu) on production-shaped [N, H] tiles,
   chained serially inside one jitted lax.scan so XLA cannot elide them
   (Gelem/s per application);
2. the model's activation element counts per train step at the headline
   bench config (depth-4/hidden-400, 98.6k edges, fill 0.97);
3. the PREDICTED step-time delta  relu -> gelu  from (1) x (2), compared
   with the MEASURED end-to-end delta (bench.py -af GELU vs ReLU).

If predicted ~= measured, the cliff is structural VPU arithmetic — the
erf chain itself — not a scheduling artifact a pipelined kernel could
hide (the TPU core issues VPU and MXU work from one in-order stream;
there is no independent activation engine to overlap with the MXU).

Usage:  python tools/gelu_roofline.py [--cpu] [--n 101888] [--h 512]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=101888,
                    help="rows (headline bench edge slots)")
    ap.add_argument("--h", type=int, default=512,
                    help="cols (H=400 pads to 512 VPU lanes)")
    ap.add_argument("--apps", type=int, default=32,
                    help="serial chain length per timed call")
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cgr_mpnn_3d_tpu.ops.pallas_fused import k_act, k_dact

    N, H, K = args.n, args.h, args.apps
    x0 = jax.random.normal(jax.random.PRNGKey(0), (N, H), jnp.float32)

    from functools import partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TE = 128
    grid = N // TE

    def pallas_chain(fn, k):
        """One kernel: load a [TE, H] VMEM tile, apply ``fn`` k times in
        registers, store.  An XLA lax.scan would round-trip HBM between
        applications and measure bandwidth (~48 GB/s/dir here), not the
        VPU op chain — exactly where the real kernels run the activation."""
        def kernel(x_ref, o_ref):
            y = x_ref[:]
            for _ in range(k):
                y = fn(y * 0.5) - 0.1   # renormalize; identical for all fns
            o_ref[:] = y

        @jax.jit
        def run(x):
            y = pl.pallas_call(
                kernel, grid=(grid,),
                in_specs=[pl.BlockSpec((TE, H), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((TE, H), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N, H), jnp.float32),
            )(x)
            # reduce to a scalar the host FETCHES: on the axon tunnel
            # neither block_until_ready nor distinct inputs suffice —
            # only a device->host value read proves execution
            return jnp.sum(y)
        return run

    def timed_k(fn, k):
        run = pallas_chain(fn, k)
        float(run(x0))                          # compile + warm
        best = float("inf")
        for i in range(args.repeats):
            xi = x0 + (0.001 * (i + 1))         # distinct input per repeat
            jax.block_until_ready(xi)
            t0 = time.perf_counter()
            float(run(xi))
            best = min(best, time.perf_counter() - t0)
        return best

    def timed(fn):
        # K-slope isolates the in-VMEM op-chain cost from tile load/store
        t_lo, t_hi = timed_k(fn, 1), timed_k(fn, 1 + K)
        return (t_hi - t_lo) / K                 # seconds per application

    acts = {
        "relu": lambda y: k_act("relu", y),
        "silu": lambda y: k_act("silu", y),
        "gelu": lambda y: k_act("gelu", y),
        "gelu_bwd": lambda y: k_dact("gelu", y),
        # candidate backward-from-stored-output: cdf = out/pre instead of
        # re-deriving erf; still one exp for the pdf term
        "gelu_bwd_from_out": lambda y: (
            jnp.where(jnp.abs(y) > 1e-6, k_act("gelu", y) / y, 0.5)
            + y * 0.3989422804014327 * jnp.exp(-y * y * 0.5)),
    }
    per_app = {k: timed(v) for k, v in acts.items()}
    gel = {k: N * H / t / 1e9 for k, t in per_app.items()}

    # --- model activation element counts per step (headline config) -----
    # fwd: h0 act [PE,H] + depth layer acts [PE,H] + readout act [PN,H];
    # bwd (train): k_dact at every one of those sites (ReLU uses the
    # cheaper out>0 compare; GELU pays the full chain)
    PE = args.n            # edge slots (101888 at the headline config)
    PN = 796 * 72          # node slots (796 packs x tn=72)
    depth = 4
    fwd_elems = (depth + 1) * PE * H + PN * H
    bwd_elems = fwd_elems  # one dact per act site
    t_gelu_extra = (fwd_elems * (per_app["gelu"] - per_app["relu"]) / (N * H)
                    + bwd_elems * (per_app["gelu_bwd"] - per_app["relu"])
                    / (N * H))
    t_bwd_lever = (bwd_elems * (per_app["gelu_bwd"]
                                - per_app["gelu_bwd_from_out"]) / (N * H))

    # headline measured numbers (BENCH_r04 / BASELINE.md)
    edges = 98602
    t_relu_step = edges / 16.31e6
    t_gelu_step_meas = edges / 7.36e6
    t_gelu_step_pred = t_relu_step + t_gelu_extra
    out = {
        "device": str(jax.devices()[0].platform),
        "gelem_per_s": {k: round(v, 1) for k, v in gel.items()},
        "per_app_ms": {k: round(v * 1e3, 3) for k, v in per_app.items()},
        "act_elems_per_step": fwd_elems + bwd_elems,
        "pred_gelu_step_ms": round(t_gelu_step_pred * 1e3, 2),
        "meas_gelu_step_ms": round(t_gelu_step_meas * 1e3, 2),
        "pred_gelu_medge_s": round(edges / t_gelu_step_pred / 1e6, 2),
        "bwd_from_out_lever_ms": round(t_bwd_lever * 1e3, 2),
        "pred_medge_s_with_lever": round(
            edges / (t_gelu_step_pred - t_bwd_lever) / 1e6, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
