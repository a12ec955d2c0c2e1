"""Throughput probe: int8 1-step anchored DDIM vs UNet width / s2d stem.

Motivates width distillation: the base-96 distilled-1+int8 headline is at
~98% of its int8 roofline, so further speedup must come from a smaller
student. Measures patches/s for base_ch in {96, 64, 48} (channels scale
2x per level) at B=64/128, random weights (throughput is weight-
independent), varied inputs per iteration (tunnel replay pitfall,
BENCH_NOTES.md).

Width specs are BASE or BASExS (s2d stem factor, UNetSmall.stem_s2d):
``--widths 12 24x2 48x4`` probes base-12 at full res, base-24 on a 2x
space-to-depth stem, base-48 on a 4x stem — the latter two match base-12's
FLOPs but run s x wider channels at (256/s)^2 body resolution.

Usage: python tools/bench_width_throughput.py [--widths 96 64 48 24x2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", type=str, nargs="+", default=["96", "64", "48"],
                    help="BASE or BASExS (S = s2d stem factor)")
    ap.add_argument("--batches", type=int, nargs="+", default=[64, 128])
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from s1s2.core import Schedule
    from s1s2.models import UNetSmall
    from s1s2.models.quant import (make_quant_denoise_fn,
                                   make_sampler_calib, quantize_unet)
    from s1s2.sampling import ddim_anchored

    H, W, CC, CT = 256, 256, 4, 4
    schedule = Schedule.cosine(1000)
    ab = schedule.alpha_bar_np()

    for spec in args.widths:
        base, _, s2d_s = spec.partition("x")
        base, s2d = int(base), int(s2d_s or 1)
        model = UNetSmall(out_ch=CT, base_ch=base, stem_s2d=s2d,
                          compute_dtype=jnp.bfloat16)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, H, W, CC + CT), jnp.float32),
            jnp.zeros((1,), jnp.int32))
        cond = jax.random.normal(jax.random.PRNGKey(3), (8, H, W, CC))
        gt = jax.random.uniform(jax.random.PRNGKey(4), (8, H, W, CT))
        qp = quantize_unet(variables["params"],
                           make_sampler_calib(gt, cond, ab, (200, 100, 20)),
                           stem_s2d=s2d)

        @jax.jit
        def run(cond, gt, key, qp=qp):
            fn = make_quant_denoise_fn(qp, cond)
            return ddim_anchored(fn, gt, key, schedule, 200, 1)

        # count params for the record
        n_par = sum(int(np.prod(p.shape))
                    for p in jax.tree_util.tree_leaves(variables["params"]))

        for B in args.batches:
            cond = jax.random.normal(jax.random.PRNGKey(13), (B, H, W, CC))
            gt = jax.random.uniform(jax.random.PRNGKey(14), (B, H, W, CT))
            run(cond, gt, jax.random.PRNGKey(9)).block_until_ready()
            t0 = time.perf_counter()
            out = None
            for i in range(args.iters):
                out = run(cond, gt, jax.random.PRNGKey(10 + i))
            out.block_until_ready()
            pps = B * args.iters / (time.perf_counter() - t0)
            print(json.dumps({
                "base_ch": base, "s2d": s2d, "batch": B,
                "params_m": round(n_par / 1e6, 2),
                "distill1_int8_patches_per_s": round(pps, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
