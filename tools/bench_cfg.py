"""Guided-sampling throughput on the real chip (BENCH_NOTES "CFG").

Measures classifier-free-guided DDIM generation — the cond/uncond pair
batched into ONE stacked forward (`make_cfg_denoise_fn` /
`make_quant_cfg_denoise_fn`) — against the unguided sampler at the same
step budget, bf16 and int8. The reference's cfg_v family shipped with no
surviving sampler script (SURVEY.md §0); the expected cost model is ~2×
the unguided forward FLOPs, recovered almost exactly because the stacked
batch keeps the MXU at the same utilization.

Measurement discipline (BENCH_NOTES "measurement pitfalls"): inputs vary
per timed iteration, per-call block_until_ready.

Usage: python tools/bench_cfg.py [--batch 32] [--steps 8] [--scales 1 2 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--t_start", type=int, default=999)
    ap.add_argument("--scales", type=float, nargs="+", default=[2.0])
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--base_ch", type=int, default=96)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from s1s2.core import Schedule
    from s1s2.core.parametrize import Parameterization
    from s1s2.models import UNetSmall
    from s1s2.models.quant import (make_quant_cfg_denoise_fn,
                                   make_quant_denoise_fn, quantize_unet)
    from s1s2.sampling.grids import round_unique_grid
    from s1s2.sampling.samplers import (ddim_grid_sample, make_cfg_denoise_fn,
                                        make_denoise_fn)

    H, W, CC, CT = 256, 256, 4, 4
    B = args.batch
    model = UNetSmall(out_ch=CT, base_ch=args.base_ch,
                      compute_dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, CC + CT), jnp.float32),
        jnp.zeros((1,), jnp.int32))
    schedule = Schedule.cosine(1000)
    grid = round_unique_grid(args.t_start, args.steps, 1000)
    scale = float(np.sqrt(1.0 - schedule.alpha_bar_np()[int(grid[-1])]))

    key = jax.random.PRNGKey(7)
    conds = jax.device_put(jax.random.normal(key, (args.iters, B, H, W, CC),
                                             jnp.float32))
    noises = jax.device_put(jax.random.normal(
        jax.random.fold_in(key, 1), (args.iters, B, H, W, CT), jnp.float32))
    # calibration must cover the CFG null-cond pass too (zeroed cond)
    nb = min(4, B)
    calib = []
    for tval in (args.t_start, args.t_start // 2, 20):
        x_t = noises[0, :nb] * scale
        for c in (conds[0, :nb], jnp.zeros_like(conds[0, :nb])):
            calib.append((jnp.concatenate([x_t, c], -1),
                          jnp.full((nb,), tval, jnp.int32)))
    qparams = quantize_unet(variables["params"], calib)

    def run(tag, fn_of_cond, g):
        @jax.jit
        def gen(cond, nz):
            return ddim_grid_sample(fn_of_cond(cond), nz * scale,
                                    jax.random.PRNGKey(0), schedule, grid,
                                    Parameterization.V)

        # compile/warm on PERTURBED tensors so no timed dispatch repeats an
        # already-executed arg set (CLAUDE.md measurement traps)
        gen(conds[0] + 1.0, noises[0] - 1.0).block_until_ready()
        t0 = time.perf_counter()
        for i in range(args.iters):
            gen(conds[i], noises[i]).block_until_ready()
        dt = time.perf_counter() - t0
        pps = args.iters * B / dt
        print(json.dumps({"config": tag, "guidance": g, "steps": args.steps,
                          "batch": B, "patches_per_s": round(pps, 2)}))
        return pps

    base = run("bf16_unguided",
               lambda c: make_denoise_fn(model.apply, variables, c), 1.0)
    for g in args.scales:
        guided = run("bf16_cfg",
                     lambda c, g=g: make_cfg_denoise_fn(
                         model.apply, variables, c, g), g)
        print(json.dumps({"config": "bf16_cfg_cost_ratio", "guidance": g,
                          "ratio_vs_unguided": round(base / guided, 3)}))
    base8 = run("int8_unguided",
                lambda c: make_quant_denoise_fn(qparams, c), 1.0)
    for g in args.scales:
        guided8 = run("int8_cfg",
                      lambda c, g=g: make_quant_cfg_denoise_fn(
                          qparams, c, g), g)
        print(json.dumps({"config": "int8_cfg_cost_ratio", "guidance": g,
                          "ratio_vs_unguided": round(base8 / guided8, 3)}))


if __name__ == "__main__":
    main()
