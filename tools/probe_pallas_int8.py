"""Probe: (1) Pallas int8 matmul throughput vs bf16 on this chip,
(2) whether a dynamic FIRST-axis DMA slice of a 3-D HBM ref compiles on the
axon remote-compile path (the round-1 conv3x3 kernel crashed the worker
with a dynamic 2nd-axis slice of a 4-D ref).

Usage: python tools/probe_pallas_int8.py [matmul|dma|all]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm_kernel(a_ref, b_ref, o_ref, acc_ref, *, k_steps, out_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32 if a_ref.dtype == jnp.int8 else jnp.float32,
    )

    @pl.when(pl.program_id(2) == k_steps - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def pallas_matmul(a, b, bm=256, bn=256, bk=256, out_dtype=jnp.float32):
    M, K = a.shape
    _, N = b.shape
    acc_dtype = jnp.int32 if a.dtype == jnp.int8 else jnp.float32
    grid = (M // bm, N // bn, K // bk)
    return pl.pallas_call(
        functools.partial(_mm_kernel, k_steps=grid[2], out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(a, b)


def probe_matmul():
    M, K, N = 8192, 2048, 2048
    flops = 2 * M * K * N
    key = jax.random.PRNGKey(0)
    af = jax.random.normal(key, (M, K), jnp.float32)
    bf = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.float32)

    for name, a, b, out_dtype in [
        ("bf16", af.astype(jnp.bfloat16), bf.astype(jnp.bfloat16), jnp.bfloat16),
        ("int8", (af * 10).astype(jnp.int8), (bf * 10).astype(jnp.int8), jnp.int32),
    ]:
        fn = jax.jit(lambda a, b, od=out_dtype: pallas_matmul(a, b, out_dtype=od))
        try:
            fn(a, b).block_until_ready()
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        iters = 50
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(a, b)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        print(f"pallas matmul {name}: {flops / dt / 1e12:8.1f} T{'OP' if name == 'int8' else 'FLOP'}/s")

    # XLA reference points
    for name, a, b in [
        ("xla bf16", af.astype(jnp.bfloat16), bf.astype(jnp.bfloat16)),
        ("xla int8", (af * 10).astype(jnp.int8), (bf * 10).astype(jnp.int8)),
    ]:
        pref = jnp.int32 if "int8" in name else jnp.bfloat16
        fn = jax.jit(lambda a, b, p=pref: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=p))
        fn(a, b).block_until_ready()
        iters = 50
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(a, b)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {flops / dt / 1e12:8.1f} T/s")


def _dma_kernel(x_hbm, o_ref, scratch, sem, *, TH):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(x_hbm.at[pl.ds(i * TH, TH + 2)], scratch, sem)
    dma.start()
    dma.wait()
    o_ref[:] = scratch[1 : TH + 1] * 2.0


def probe_dma():
    # 3-D ref, dynamic slice on the FIRST axis only
    H, W, C = 256, 128, 128
    TH = 32
    x = jnp.arange(H * W * C, dtype=jnp.float32).reshape(H, W, C) / 1e6
    out = pl.pallas_call(
        functools.partial(_dma_kernel, TH=TH),
        grid=((H - 2) // TH,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((TH, W, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((H - 2, W, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TH + 2, W, C), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(x)
    ref = x[1 : H - 1] * 2.0
    err = float(jnp.abs(out - ref).max())
    print(f"3-D first-axis dynamic DMA: OK, max err {err:.2e}")


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what in ("dma", "all"):
        probe_dma()
    if what in ("matmul", "all"):
        probe_matmul()
