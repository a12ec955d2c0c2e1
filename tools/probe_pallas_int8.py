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


def _time(name, fn, make_args, flops, iters=8):
    """Per-call blocked timing with a DIFFERENT input each call.

    Two failure modes were caught building this: (a) same-args dispatch
    loops replay cached results on this remote runtime (first probe
    'measured' 3100 TFLOP/s on a 197-peak chip; a re-run of an identical
    chain returned in 0.00 ms), and (b) blocked-call RTT is negligible
    (~0.05 ms), so per-call blocking with fresh args is accurate."""
    try:
        fn(*make_args(0)).block_until_ready()
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return None
    best = float("inf")
    for i in range(1, iters + 1):
        args = make_args(i)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        fn(*args).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {flops / best / 1e12:8.1f} T/s  ({best * 1e3:.2f} ms)")
    return best


def probe_matmul():
    # correctness first (small)
    ka = jax.random.PRNGKey(7)
    sa = (jax.random.normal(ka, (512, 512)) * 5).astype(jnp.int8)
    sb = (jax.random.normal(jax.random.PRNGKey(8), (512, 512)) * 5).astype(jnp.int8)
    got = pallas_matmul(sa, sb, out_dtype=jnp.int32)
    want = jax.lax.dot_general(sa, sb, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    assert (got == want).all(), "pallas int8 matmul mismatch"
    print("pallas int8 matmul exact vs XLA: OK")

    M, K, N = 8192, 2048, 2048
    key = jax.random.PRNGKey(0)
    af = jax.random.normal(key, (M, K), jnp.float32)
    bf = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.float32)
    flops = 2 * M * K * N

    def args_f(dtype):
        def make(i):
            return ((af + i).astype(dtype), bf.astype(dtype))
        return make

    def args_i8(i):
        return ((af * 10 + i).astype(jnp.int8), (bf * 10).astype(jnp.int8))

    _time("pallas bf16", jax.jit(lambda a, b: pallas_matmul(a, b, out_dtype=jnp.bfloat16)),
          args_f(jnp.bfloat16), flops)
    _time("pallas int8", jax.jit(lambda a, b: pallas_matmul(a, b, out_dtype=jnp.int32)),
          args_i8, flops)
    _time("xla    bf16", jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.bfloat16)),
          args_f(jnp.bfloat16), flops)
    _time("xla    int8", jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)),
          args_i8, flops)


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

def probe_conv():
    """Chained 3x3 convs at UNet hot shapes: bf16 vs int8 (+fused requant).
    This is the decisive comparison for an int8 inference path — the UNet's
    bf16 convs measure 147-170 TFLOP/s in the real model."""
    B, H, W, C = 32, 256, 256, 128
    reps = 6
    dn = jax.lax.conv_dimension_numbers((B, H, W, C), (3, 3, C, C),
                                        ("NHWC", "HWIO", "NHWC"))
    flops = 2 * B * H * W * 9 * C * C * reps

    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, C), jnp.float32) * 0.05

    @jax.jit
    def chain_bf16(x, w):
        x = x.astype(jnp.bfloat16)
        wb = w.astype(jnp.bfloat16)
        for _ in range(reps):
            x = jax.lax.conv_general_dilated(
                x, wb, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.bfloat16)
            x = jnp.maximum(x, 0) * 0.0625  # relu + rescale to keep finite
        return x

    @jax.jit
    def chain_int8(x8, w8):
        scale = jnp.float32(1.0 / (127.0 * 8))
        for _ in range(reps):
            acc = jax.lax.conv_general_dilated(
                x8, w8, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            # fused requant: scale, relu, round, clip, back to int8
            y = jnp.maximum(acc.astype(jnp.float32) * scale, 0.0)
            x8 = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
        return x8

    x8 = (x * 16).astype(jnp.int8)
    w8 = (w * 160).astype(jnp.int8)

    _time("conv bf16 x6", chain_bf16,
          lambda i: (x + i * 1e-3, w), flops)
    _time("conv int8+requant x6", chain_int8,
          lambda i: ((x * 16 + i).astype(jnp.int8), w8), flops)


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what in ("conv", "all"):
        probe_conv()
    if what in ("dma", "all"):
        probe_dma()
    if what in ("matmul", "all"):
        probe_matmul()
