"""Throughput probe for the distilled 1-step operating point (bench.py line 4).

Measures GT-anchored DDIM-1 from t_start=200 through the int8 quantized
path, over a batch sweep. The quality evidence for this operating point
lives in examples/results_synthetic/distill_evidence.jsonl (current
committed numbers; see BENCH_NOTES.md "Step distillation"). Architecture
is identical teacher/student (UNetSmall base 96), so throughput is
weight-independent; bench.py additionally loads the committed student
checkpoint for its headline line so measurement and quality share one
artifact.

Usage: python tools/bench_distill_throughput.py [--batches 64 128 256]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[64, 128, 256])
    ap.add_argument("--t_start", type=int, default=200)
    ap.add_argument("--iters", type=int, default=20)
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
    model = UNetSmall(out_ch=CT, base_ch=96, compute_dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, CC + CT), jnp.float32),
        jnp.zeros((1,), jnp.int32))
    schedule = Schedule.cosine(1000)
    ab = schedule.alpha_bar_np()

    gt8 = jax.random.uniform(jax.random.PRNGKey(2), (8, H, W, CT))
    cond8 = jax.random.normal(jax.random.PRNGKey(3), (8, H, W, CC))
    qp = quantize_unet(variables["params"], make_sampler_calib(
        gt8, cond8, ab, (args.t_start, args.t_start // 2, 20)))

    @jax.jit
    def run(cond, gt, key):
        fn = make_quant_denoise_fn(qp, cond)
        return ddim_anchored(fn, gt, key, schedule, args.t_start, 1)

    for B in args.batches:
        cond = jax.random.normal(jax.random.PRNGKey(11), (B, H, W, CC))
        gt = jax.random.uniform(jax.random.PRNGKey(12), (B, H, W, CT))
        run(cond, gt, jax.random.PRNGKey(9)).block_until_ready()
        t0 = time.perf_counter()
        out = None
        for i in range(args.iters):
            out = run(cond, gt, jax.random.PRNGKey(100 + i))
        out.block_until_ready()
        dt = time.perf_counter() - t0
        print(json.dumps({"batch": B, "patches_per_sec": round(B * args.iters / dt, 2),
                          "secs": round(dt, 3)}), flush=True)


if __name__ == "__main__":
    main()
