"""Headline benchmark: 256×256 S1→S2 patches/sec/chip at 50-step DDIM.

Runs the flagship UNetSmall (base_ch=96, ε-param, bf16 compute) through the
fused 50-step lax.scan DDIM sampler on the real TPU chip. Baseline = 500
patches/sec/chip (BASELINE.json north star; the reference publishes no
throughput numbers — SURVEY.md §6).

Prints TWO JSON lines:
  1. quality-matched throughput — DPM-Solver++(2M) at 5 steps (6 model
     calls), which matches/beats 20-step DDIM reconstruction MAE on the
     same checkpoint (evidence: tools/bench_quality_matched.py +
     BENCH_NOTES.md solver tables). This is the honest "patches/s at
     DDIM-20 quality" number.
  2. the fixed 50-step DDIM headline (LAST line = the driver-parsed
     metric, same as round 1).

Batch 128 is the measured v5e sweet spot (tools/roofline.py sweep:
B=32→9.8, 64→9.8, 128→11.4, 192→9.6, 256→11.3 patches/s).
"""

import json
import time


def main() -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from s1s2.core import Schedule
    from s1s2.core.parametrize import Parameterization, q_sample
    from s1s2.models import UNetSmall
    from s1s2.sampling import ddim_anchored, dpm_solver_2m, make_denoise_fn
    from s1s2.sampling.grids import round_unique_grid

    B, H, W, CC, CT = 128, 256, 256, 4, 4
    STEPS, T_START = 50, 999

    model = UNetSmall(out_ch=CT, base_ch=96, compute_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        key, jnp.zeros((1, H, W, CC + CT), jnp.float32), jnp.zeros((1,), jnp.int32)
    )
    schedule = Schedule.cosine(1000)

    cond = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, CC), jnp.float32)
    gt = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, CT), jnp.float32)

    # --- quality-matched: dpm2m-5 anchored @ t_start=200 (the evidence
    # config; 6 UNet calls total) ---
    grid = round_unique_grid(200, 5, 1000)
    K = int(grid[-1])
    ab = schedule.alpha_bar_np()
    sab, s1m = float(np.sqrt(ab[K])), float(np.sqrt(1.0 - ab[K]))

    @jax.jit
    def run_qm(cond, gt, noise):
        fn = make_denoise_fn(model.apply, variables, cond)
        x_init = q_sample(gt, noise, sab, s1m)
        return dpm_solver_2m(fn, x_init, schedule, grid, Parameterization.EPS)

    noise = jax.random.normal(jax.random.PRNGKey(4), gt.shape)
    run_qm(cond, gt, noise).block_until_ready()
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run_qm(cond, gt, noise)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    pps_qm = B * iters / dt
    print(json.dumps({
        "metric": "patches_per_sec_per_chip_dpm2m5_at_ddim20_quality_256px",
        "value": round(pps_qm, 2),
        "unit": "patches/s",
        "vs_baseline": round(pps_qm / 500.0, 3),
    }))

    # --- headline: fixed 50-step DDIM (driver-parsed last line) ---
    @jax.jit
    def run(cond, gt, key):
        fn = make_denoise_fn(model.apply, variables, cond)
        return ddim_anchored(fn, gt, key, schedule, T_START, STEPS)

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
