"""Benchmark the BlockSpec-only Pallas conv3x3 vs XLA's conv on the real TPU.

First Pallas kernel with MXU FLOPs that compiles AND runs on this axon
remote-compile runtime (conv3x3_relu_bs — halo via strip-shifted BlockSpecs,
no manual DMA; see s1s2/ops/conv3x3.py and the BENCH_NOTES.md capability
matrix). Times bias+ReLU-fused 3x3 SAME convs at the UNet's four level
shapes. Inputs VARY per iteration (this tunnel replays identical-args
dispatches — BENCH_NOTES.md measurement pitfalls).

Usage: python tools/bench_pallas_conv.py [--batch 64] [--iters 6]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--variants", type=int, default=3,
                    help="distinct input tensors cycled through the loop")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from s1s2.ops.conv3x3 import conv3x3_relu_bs

    B = args.batch
    # (H, W, C, tile_rows) — the UNet's four levels at base_ch 96.
    # tile_rows bounded by the 16 MB scoped-VMEM limit (double-buffered
    # in/out blocks + f32 accumulator): R=16 fits every level.
    shapes = [(256, 96, 16), (128, 192, 16), (64, 384, 16), (32, 768, 16)]

    def xla_conv(x, w, b):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jax.nn.relu(y + b.astype(jnp.float32)).astype(x.dtype)

    for H, C, R in shapes:
        k = jax.random.PRNGKey(H)
        w = (0.05 * jax.random.normal(k, (3, 3, C, C), jnp.float32)
             ).astype(jnp.bfloat16)
        b = jax.random.normal(jax.random.fold_in(k, 1), (C,), jnp.float32
                              ).astype(jnp.bfloat16)
        xs = [jax.random.normal(jax.random.fold_in(k, 2 + i), (B, H, H, C),
                                jnp.float32).astype(jnp.bfloat16)
              for i in range(args.variants)]

        def chain(conv1, x, s, steps):
            # Re-normalized conv chain seeded by a per-call scalar `s`: the
            # whole dispatch has distinct args every iteration, so the
            # tunnel can never replay a previously executed chain
            # (CLAUDE.md measurement traps); dispatch cost amortizes over
            # `steps`.
            x = x * (1.0 + s * 1e-6).astype(x.dtype)
            def body(h, _):
                y = conv1(h)
                y = y * jax.lax.rsqrt(
                    jnp.mean(jnp.square(y.astype(jnp.float32))) + 1e-6
                ).astype(y.dtype)
                return y, ()
            out, _ = jax.lax.scan(body, x, (), length=steps)
            return out

        steps = 20
        pallas_fn = jax.jit(functools.partial(
            chain, lambda x: conv3x3_relu_bs(x, w, b, tile_rows=R),
            steps=steps))
        xla_fn = jax.jit(functools.partial(
            chain, lambda x: xla_conv(x, w, b), steps=steps))

        # parity on this shape (bf16 compute both sides, single conv)
        p1 = jax.jit(lambda x: conv3x3_relu_bs(x, w, b, tile_rows=R))
        x1 = jax.jit(lambda x: xla_conv(x, w, b))
        err = float(jnp.abs(p1(xs[0]).astype(jnp.float32)
                            - x1(xs[0]).astype(jnp.float32)).max())

        flops = 2 * 9 * B * H * H * C * C * steps
        row = {"shape": f"{B}x{H}x{H}x{C}", "tile_rows": R,
               "chain_steps": steps, "max_abs_diff_vs_xla": round(err, 5)}
        for name, fn in (("pallas", pallas_fn), ("xla", xla_fn)):
            fn(xs[0], jnp.float32(-1.0)).block_until_ready()  # compile
            t0 = time.perf_counter()
            n = 0
            for i in range(args.iters):
                for j, x in enumerate(xs):
                    # distinct (x, s) per dispatch — never a replay
                    fn(x, jnp.float32(i * len(xs) + j)).block_until_ready()
                    n += 1
            dt = (time.perf_counter() - t0) / n
            row[f"{name}_ms_per_conv"] = round(dt * 1e3 / steps, 3)
            row[f"{name}_tflops"] = round(flops / dt / 1e12, 1)
        row["pallas_vs_xla"] = round(
            row["xla_ms_per_conv"] / row["pallas_ms_per_conv"], 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
