"""Pallas conv3x3_relu vs XLA conv at UNetSmall-96 shapes on the real chip.

Usage: python tools/bench_conv.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from s1s2.ops.conv3x3 import conv3x3_relu

# the UNet's dominant conv shapes at batch 16 (SURVEY/BENCH_NOTES roofline)
SHAPES = [
    (16, 256, 256, 96, 192),
    (16, 256, 256, 192, 192),
    (16, 128, 128, 384, 384),
    (16, 64, 64, 768, 768),
]


def bench(f, x, w, b, iters=8):
    """Per-call blocked timing with fresh inputs each call — identical-args
    dispatch loops replay cached results on this remote runtime
    (BENCH_NOTES.md measurement pitfalls)."""
    jax.block_until_ready(f(x, w, b))
    best = float("inf")
    for i in range(1, iters + 1):
        xi = x + jnp.bfloat16(i * 1e-3)
        jax.block_until_ready(xi)
        t0 = time.perf_counter()
        jax.block_until_ready(f(xi, w, b))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    for B, H, W, Ci, Co in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, Ci), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, Ci, Co), jnp.bfloat16) * 0.1
        b = jnp.zeros((Co,), jnp.float32)

        xla = jax.jit(lambda x, w, b: jax.nn.relu(
            jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16) + b.astype(jnp.bfloat16)))
        pal = jax.jit(lambda x, w, b: conv3x3_relu(x, w, b.astype(jnp.float32),
                                                   tile_rows=16))
        flops = 2 * 9 * Ci * Co * B * H * W
        try:
            # correctness first (bf16 tolerance)
            import numpy as np

            got = np.asarray(pal(x, w, b), np.float32)
            want = np.asarray(xla(x, w, b), np.float32)
            scale = max(1e-6, float(np.abs(want).max()))
            max_rel = float(np.abs(got - want).max()) / scale
            assert max_rel < 3e-2, f"pallas/XLA mismatch rel={max_rel:.4f}"
            t_xla = bench(xla, x, w, b)
            t_pal = bench(pal, x, w, b)
            print(json.dumps({
                "shape": [B, H, W, Ci, Co],
                "xla_ms": round(t_xla * 1e3, 3),
                "pallas_ms": round(t_pal * 1e3, 3),
                "xla_tflops": round(flops / t_xla / 1e12, 1),
                "pallas_tflops": round(flops / t_pal / 1e12, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"shape": [B, H, W, Ci, Co], "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
