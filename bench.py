"""Headline benchmark: 256×256 S1→S2 patches/sec/chip at 50-step DDIM.

Runs the flagship UNetSmall (base_ch=96, ε-param, bf16 compute) through the
fused 50-step lax.scan DDIM sampler on the real TPU chip and prints ONE JSON
line. Baseline = 500 patches/sec/chip (BASELINE.json north star; the
reference publishes no throughput numbers — SURVEY.md §6).
"""

import json
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    from s1s2.core import Schedule
    from s1s2.models import UNetSmall
    from s1s2.sampling import ddim_anchored, make_denoise_fn

    B, H, W, CC, CT = 64, 256, 256, 4, 4
    STEPS, T_START = 50, 999

    model = UNetSmall(out_ch=CT, base_ch=96, compute_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        key, jnp.zeros((1, H, W, CC + CT), jnp.float32), jnp.zeros((1,), jnp.int32)
    )
    schedule = Schedule.cosine(1000)

    cond = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, CC), jnp.float32)
    gt = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, CT), jnp.float32)

    @jax.jit
    def run(cond, gt, key):
        fn = make_denoise_fn(model.apply, variables, cond)
        return ddim_anchored(fn, gt, key, schedule, T_START, STEPS)

    # warmup/compile
    run(cond, gt, jax.random.PRNGKey(3)).block_until_ready()

    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        out = run(cond, gt, jax.random.PRNGKey(10 + i))
    out.block_until_ready()
    dt = time.perf_counter() - t0

    pps = B * iters / dt
    print(json.dumps({
        "metric": "patches_per_sec_per_chip_50step_ddim_256px",
        "value": round(pps, 2),
        "unit": "patches/s",
        "vs_baseline": round(pps / 500.0, 3),
    }))


if __name__ == "__main__":
    main()
