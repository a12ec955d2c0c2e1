"""Perf experiments on the real chip: configuration sweep for the 50-step
DDIM flagship path. Usage: python tools/bench_variants.py [quick]"""

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from s1s2.core import Schedule
from s1s2.models import UNetSmall
from s1s2.sampling import ddim_anchored, make_denoise_fn


def bench_one(B, up_impl, dtype, steps=50, iters=3):
    model = UNetSmall(out_ch=4, base_ch=96, compute_dtype=dtype, up_impl=up_impl)
    H = W = 256
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 8), jnp.float32),
        jnp.zeros((1,), jnp.int32),
    )
    schedule = Schedule.cosine(1000)
    cond = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 4), jnp.float32)
    gt = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, 4), jnp.float32)

    @jax.jit
    def run(cond, gt, key):
        fn = make_denoise_fn(model.apply, variables, cond)
        return ddim_anchored(fn, gt, key, schedule, 999, steps)

    run(cond, gt, jax.random.PRNGKey(3)).block_until_ready()
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = run(cond, gt, jax.random.PRNGKey(i))
    out.block_until_ready()
    dt = time.perf_counter() - t0
    return B * iters / dt


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    batches = [32] if quick else [8, 16, 32, 64]
    ups = ["ps", "convt"]
    for B, up in itertools.product(batches, ups):
        try:
            pps = bench_one(B, up, jnp.bfloat16)
            print(json.dumps({"B": B, "up": up, "patches_per_s": round(pps, 2)}),
                  flush=True)
        except Exception as e:  # OOM etc.
            print(json.dumps({"B": B, "up": up, "error": str(e)[:100]}), flush=True)


if __name__ == "__main__":
    main()
