"""Dump a jax.profiler trace of the flagship 50-step DDIM sampler.

Usage: python tools/profile_forward.py /tmp/trace_dir
View with TensorBoard/XProf (trace_viewer).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from s1s2.core import Schedule
from s1s2.models import UNetSmall
from s1s2.sampling import ddim_anchored, make_denoise_fn
from s1s2.utils import trace_context


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/s1s2_trace"
    B, H, W = 32, 256, 256
    model = UNetSmall(out_ch=4, base_ch=96)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 8)), jnp.zeros((1,), jnp.int32)
    )
    schedule = Schedule.cosine(1000)
    cond = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 4))
    gt = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, 4))

    @jax.jit
    def run(cond, gt, key):
        fn = make_denoise_fn(model.apply, variables, cond)
        return ddim_anchored(fn, gt, key, schedule, 999, 50)

    run(cond, gt, jax.random.PRNGKey(3)).block_until_ready()  # compile
    with trace_context(out):
        run(cond, gt, jax.random.PRNGKey(4)).block_until_ready()
    print(f"trace written to {out}")


if __name__ == "__main__":
    main()
