"""Is int8 actually ~2x bf16 on this chip's MXU through XLA/Mosaic?

BASELINE.md names int8 quantized message matmuls as a remaining >=2x lever.
Before building quantized kernels, this measures the raw sustained rate of
int8 x int8 -> int32 vs bf16 x bf16 -> f32 matmuls (same chained-scan
harness as bench.py's ceiling probe) plus a Pallas variant of each.  If
int8 is NOT ~2x here, the lever dies with data.  Dev tool.
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 4096
STEPS = 32


def rate(name, make_loop, flops_per_iter):
    loop, arg = make_loop()
    jax.block_until_ready(loop(arg))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(loop(arg))
        best = min(best, time.time() - t0)
    tops = flops_per_iter * STEPS / best / 1e12
    print(f"{name:28s} {tops:7.1f} T(FL)OP/s", file=sys.stderr)
    return tops


def xla_bf16():
    a = jnp.ones((N, N), jnp.bfloat16)

    @jax.jit
    def loop(c):
        def body(c, _):
            r = jnp.dot(c, a, preferred_element_type=jnp.float32)
            return r.astype(jnp.bfloat16), ()
        c, _ = jax.lax.scan(body, c, None, length=STEPS)
        return c
    return loop, a


def xla_int8():
    a = jnp.ones((N, N), jnp.int8)

    @jax.jit
    def loop(c):
        def body(c, _):
            r = jax.lax.dot_general(
                c, a, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return (r & 127).astype(jnp.int8), ()
        c, _ = jax.lax.scan(body, c, None, length=STEPS)
        return c
    return loop, a


def _pk(a_ref, b_ref, o_ref, *, odt):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=odt).astype(o_ref.dtype)


def pallas_mm(dt, odt):
    a = jnp.ones((N, N), dt)
    k = pl.pallas_call(
        functools.partial(_pk, odt=odt),
        out_shape=jax.ShapeDtypeStruct((N, N), dt),
        in_specs=[pl.BlockSpec((512, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((N, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((512, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        grid=(N // 512,),
    )

    @jax.jit
    def loop(c):
        def body(c, _):
            r = k(c, c)
            return r, ()
        c, _ = jax.lax.scan(body, c, None, length=STEPS)
        return c
    return loop, a


def main():
    f = 2 * N * N * N
    bf = rate("XLA bf16->f32", xla_bf16, f)
    i8 = rate("XLA int8->int32", xla_int8, f)
    try:
        pbf = rate("Pallas bf16->f32",
                   lambda: pallas_mm(jnp.bfloat16, jnp.float32), f)
    except Exception as e:  # pragma: no cover
        print(f"Pallas bf16 failed: {e}", file=sys.stderr)
        pbf = 0.0
    try:
        pi8 = rate("Pallas int8->int32",
                   lambda: pallas_mm(jnp.int8, jnp.int32), f)
    except Exception as e:  # pragma: no cover
        print(f"Pallas int8 failed: {type(e).__name__}: "
              f"{str(e)[:200]}", file=sys.stderr)
        pi8 = 0.0
    print(f"int8/bf16 speedup: XLA {i8/bf:.2f}x, "
          f"Pallas {pi8/pbf if pbf else float('nan'):.2f}x",
          file=sys.stderr)


if __name__ == "__main__":
    main()
