"""Headline benchmark: 256×256 S1→S2 patches/sec/chip.

Baseline = 500 patches/sec/chip at 50-step DDIM (BASELINE.json north star;
the reference publishes no throughput numbers — SURVEY.md §6).

Default profile prints 3 JSON lines (driver parses the LAST) and is sized
to finish well inside an 8-minute wall budget on the tunnel (VERDICT r3:
the full 11-line ladder blew the driver timeout and the recorded headline
collapsed to the slowest row):

  1. bf16 reference path — 50-step DDIM @ B=128 (the measured bf16 batch
     sweet spot; 86% MFU against the XLA-cost-analysis roofline of 13.2
     patches/s, BENCH_NOTES.md "Roofline").
  2. quality-matched throughput — DPM-Solver++(2M) 5 steps + int8: matches
     20-step DDIM MAE on the same checkpoint (evidence:
     tools/bench_quality_matched.py --int8 → quality_matched_int8: true).
  3. HEADLINE (last): the best proven width/shape-distilled 1-step student
     + int8 at ddim-20-matched reconstruction quality. SELF-VERIFYING:
     this process loads the committed checkpoint
     (examples/checkpoints/distill_eps_student{SPEC}.bf16.msgpack),
     regenerates the deterministic 32-file synthetic evidence set, scores
     GT-anchored ddim-1 through the int8 path in-process, asserts the
     committed evidence MAE vs the teacher ddim-20 anchor (0.44074), then
     times throughput with the same quantized weights. Preferred rung is
     24x4 (base-24 channels, 4× space-to-depth stem — body at 64² —
     1.11M params, landed r5: evidence int8 MAE 0.32764, held-out
     0.32700, the LADDER-BEST quality at the ladder-best throughput:
     examples/results_synthetic/distill_width24x4_metrics.jsonl,
     distill_width_holdout.jsonl); falls back to 16x2 (r4 headline) then
     base-12 full-res if checkpoints are absent, emitting a
     {"skipped": ...} JSON line so a missing rung is never silent.

Set S1S2_BENCH_WIDTHS=1 (or run tools/bench_width_ladder.py) to add one
line per committed intermediate width rung (base 64/48/32/24/16/12)
before the headline — the full ladder takes ~15 min and exists for
BENCH_NOTES tables, not for the driver budget.

Set S1S2_BENCH_CFG=1 to add the guided-generation line: quality-equal
int8+CFG at g=3 on the committed cfg_v teacher, self-verified through the
cfg_sweep harness against the r4 rich-set protocol (~6 min; sample JSON in
BENCH_NOTES "int8+CFG degradation FIXED").

Width-ladder quality provenance (BENCH_NOTES.md "Width distillation"):
every rung is scored on the evidence set AND a held-out synthetic set the
students never saw (distill_width_holdout.jsonl); quality_checked in the
JSON line is computed in-process from freshly regenerated data, not quoted.
"""

import json
import os
import time

# (spec, batch, expected int8 evidence MAE, params) — narrowest/best LAST.
# Expected MAEs are the committed evidence rows in
# examples/results_synthetic/distill_width{SPEC}_metrics.jsonl.
WIDTHS = [
    ("64", 64, 0.34812, "7.7M"),
    ("48", 128, 0.35026, "4.3M"),
    ("32", 128, 0.34052, "1.9M"),
    ("24", 256, 0.34453, "1.1M"),
    ("16", 128, 0.34008, "0.48M"),
    ("12", 128, 0.34379, "0.27M"),
    # 4x space-to-depth rungs (body at 64^2)
    ("48x4", 128, 0.33002, "4.37M"),
    # r4 headline (2x stem, body at 128^2) — now a ladder rung
    ("16x2", 128, 0.33557, "0.48M"),
]
# Headline preference order: the 24x4 rung (base-24, 4× space-to-depth
# stem, body at 64² — landed r5) DOMINATES the rest of the ladder on both
# axes: ladder-best int8 MAE (0.32764 evidence / 0.32700 held-out) AND
# ~14% above 16x2's throughput (probe 18,950/s @B=128). Fallbacks keep
# the r4/r3 headline rungs for snapshots missing the new checkpoint.
HEADLINE_PREF = [
    ("24x4", 128, 0.32764, "1.11M"),
    ("16x2", 128, 0.33557, "0.48M"),
    ("12", 128, 0.34379, "0.27M"),
]
TEACHER_ANCHOR = 0.44074  # committed teacher ddim-20 evidence MAE


def _report(metric: str, pps: float, **extra) -> None:
    print(json.dumps({
        "metric": metric,
        "value": round(pps, 2),
        "unit": "patches/s",
        "vs_baseline": round(pps / 500.0, 3),
        **extra,
    }), flush=True)


def _skip(spec: str, reason: str) -> None:
    print(json.dumps({"skipped": f"w{spec}", "reason": reason}), flush=True)


def _cfg_line(ckpt_dir: str, UNetSmall, Schedule, load_params) -> None:
    """Opt-in (S1S2_BENCH_CFG=1) guided-generation line: quality-equal
    int8+CFG at g=3 on the committed cfg_v teacher.

    Self-verifying against the r4 rich-set protocol (BENCH_NOTES "int8+CFG
    degradation FIXED"): regenerates the 129-file --rich synthetic set
    (seed 0), scores files 96-127 via --file_list through the cfg_sweep
    harness in bf16 AND in the quality-equal int8 setting (--int8_calib
    rollout --int8_perchannel --int8_bf16_blocks conv1), asserts the int8
    MAE is within noise of bf16 (committed anchors 0.29791 / 0.29821),
    then times the 5-step stacked-CFG sampler B=32 both ways. Adds ~6 min;
    env-gated so the default driver profile stays 3 lines."""
    import csv
    import tempfile
    import time as _time

    import numpy as np
    import jax
    import jax.numpy as jnp

    ckpt = os.path.join(ckpt_dir, "cfg_v_teacher.bf16.msgpack")
    if not os.path.exists(ckpt):
        print(json.dumps({"skipped": "cfg", "reason": f"checkpoint absent: "
                          f"{ckpt}"}), flush=True)
        return

    from s1s2.cli.evaluate import main as eval_main

    maes = {}
    with tempfile.TemporaryDirectory() as td:
        from s1s2.data.synthetic import make_synthetic_patches

        patches = os.path.join(td, "rich")
        make_synthetic_patches(patches, n=129, size=256, seed=0, rich=True)
        lst = os.path.join(td, "eval.txt")
        with open(lst, "w") as f:
            f.write("".join(f"patch_{i:06d}.npz\n" for i in range(96, 128)))
        for tag, extra in (
                ("bf16", []),
                ("int8", ["--int8", "--int8_calib", "rollout",
                          "--int8_perchannel",
                          "--int8_bf16_blocks", "conv1"])):
            out = os.path.join(td, "out_" + tag)
            eval_main([
                "--mode", "cfg_sweep", "--patch_dir", patches,
                "--file_list", lst, "--ckpt", ckpt, "--pred_param", "v",
                "--t_start", "999", "--ddim_steps", "5", "--out_dir", out,
                "--guidance_scales", "3", "--save_viz_n", "0"] + extra)
            with open(os.path.join(out, "cfg_sweep_summary.csv")) as f:
                maes[tag] = float(next(iter(csv.DictReader(f)))["MAE_mean"])

    # ---- throughput: 5-step stacked-CFG sampler, B=32, bf16 vs int8 ----
    from s1s2.core.parametrize import Parameterization
    from s1s2.models.quant import (make_cfg_rollout_calib,
                                   make_quant_cfg_denoise_fn, quantize_unet)
    from s1s2.sampling.grids import round_unique_grid
    from s1s2.sampling.samplers import ddim_grid_sample, make_cfg_denoise_fn

    H, W, CC, CT, B, G = 256, 256, 4, 4, 32, 3.0
    model = UNetSmall(out_ch=CT, base_ch=96, compute_dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, CC + CT), jnp.float32),
        jnp.zeros((1,), jnp.int32))
    variables = {"params": load_params(ckpt,
                                       template=variables["params"])}
    schedule = Schedule.cosine(1000)
    grid = round_unique_grid(999, 5, 1000)
    vscale = float(np.sqrt(1.0 - schedule.alpha_bar_np()[int(grid[-1])]))
    cond = jax.random.normal(jax.random.PRNGKey(11), (B, H, W, CC))
    calib = make_cfg_rollout_calib(model.apply, variables, cond, schedule,
                                   grid, G, param="v", out_ch=CT)
    qp = quantize_unet(variables["params"], calib, out_ch=CT, base_ch=96,
                       act_perchannel=True, bf16_blocks=("conv1",))

    def timed(fn_of_cond, iters=8):
        @jax.jit
        def run(cond_b, key):
            noise = jax.random.normal(key, (B, H, W, CT)) * vscale
            return ddim_grid_sample(fn_of_cond(cond_b), noise,
                                    jax.random.PRNGKey(0), schedule, grid,
                                    Parameterization.V)

        run(cond, jax.random.PRNGKey(1)).block_until_ready()
        t0 = _time.perf_counter()
        out = None
        for i in range(iters):  # keys vary: no cached-dispatch replay
            out = run(cond, jax.random.PRNGKey(2 + i))
        out.block_until_ready()
        return B * iters / (_time.perf_counter() - t0)

    pps_bf16 = timed(lambda c: make_cfg_denoise_fn(model.apply, variables,
                                                   c, G))
    pps_int8 = timed(lambda c: make_quant_cfg_denoise_fn(qp, c, G))
    _report(
        "patches_per_sec_per_chip_cfg_g3_5step_int8_quality_equal_256px",
        pps_int8,
        config="cfg_v teacher, guidance 3.0, 5-step stacked CFG, int8 "
               "rollout-calib + per-channel + bf16 conv1, B=32",
        bf16_patches_per_s=round(pps_bf16, 2),
        int8_speedup_vs_bf16=round(pps_int8 / pps_bf16, 3),
        verified_mae_bf16=round(maes["bf16"], 5),
        verified_mae_int8=round(maes["int8"], 5),
        quality_checked=bool(maes["int8"] <= maes["bf16"] + 0.002),
        protocol="129-file rich set (seed 0), --file_list files 96-127, "
                 "cfg_sweep g=3 — BENCH_NOTES 'int8+CFG degradation FIXED' "
                 "(committed anchors bf16 0.29821 / int8 0.29791)")


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
    from s1s2.train.checkpoint import load_params

    H, W, CC, CT = 256, 256, 4, 4
    STEPS, T_START = 50, 999
    CKPT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "examples", "checkpoints")

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
        # keys vary per iteration: identical-arg dispatch chains replay
        # cached results on this tunnel (BENCH_NOTES "Measurement traps")
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
    # 2 timed iterations (~11 s each at B=128) + the per-iteration spread
    # in the JSON line (the ADVICE r4 alternative to more iterations —
    # a 3rd iteration costs 11 s of the driver's wall budget)
    run_bf16(cond, gt, jax.random.PRNGKey(9)).block_until_ready()
    its = []
    for i in range(2):
        t0 = time.perf_counter()
        run_bf16(cond, gt, jax.random.PRNGKey(10 + i)).block_until_ready()
        its.append(cond.shape[0] / (time.perf_counter() - t0))
    _report("patches_per_sec_per_chip_50step_ddim_256px_bf16",
            sum(its) / len(its),
            per_iteration=[round(v, 3) for v in its])
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
            timed(run_qm, cond, gt, 10))
    del cond, gt

    # ---- evidence set for in-process self-verification of every rung ----
    # The committed distilled students are quality-certified against a
    # deterministic 32-file synthetic evidence set (seed 0) — regenerate it
    # here so the MAE in the JSON line comes from THIS process, and the
    # quality claim shares one artifact with the throughput measurement.
    import tempfile

    from s1s2.data.dataset import NpzPatchDataset
    from s1s2.data.synthetic import make_synthetic_patches
    from s1s2.eval.metrics import masked_mae

    with tempfile.TemporaryDirectory() as td:
        # compress=False: byte-identical VALUES (deterministic from seed),
        # ~3x faster writes on the 1-core host — wall budget, not quality
        make_synthetic_patches(td, n=32, size=256, seed=0, compress=False)
        ds = NpzPatchDataset(td)
        items = [ds[i] for i in range(len(ds))]
    ev_cond = jnp.asarray(np.stack([it["cond"] for it in items]))
    ev_gt = jnp.asarray(np.stack([it["target"] for it in items]))
    ev_mask = jnp.asarray(np.stack(
        [np.ones(it["target"].shape[:2], np.float32)
         if it["mask"] is None else it["mask"] for it in items]))
    ev_key = jax.random.PRNGKey(1234)
    ev_noise = jax.random.normal(ev_key, ev_gt.shape)
    # same calibration points as tools/score_distill_full.py --int8
    calib_s = make_sampler_calib(ev_gt, ev_cond, ab, (200, 100, 20))

    def rung(spec, wb, expect_mae, params_s, metric, extra_cfg=""):
        """Self-verify + time one distilled width rung. True if it ran."""
        base_s, _, s2d_s = spec.partition("x")
        # spec "1" = the original base-96 1-step student (r2 naming)
        wch = 96 if spec == "1" else int(base_s)
        s2d = int(s2d_s or 1)
        ckpt_w = os.path.join(CKPT_DIR,
                              f"distill_eps_student{spec}.bf16.msgpack")
        if not os.path.exists(ckpt_w):
            _skip(spec, "checkpoint absent: " + ckpt_w)
            return False
        model_w = UNetSmall(out_ch=CT, base_ch=wch, stem_s2d=s2d,
                            compute_dtype=jnp.bfloat16)
        tmpl_w = model_w.init(
            jax.random.PRNGKey(0), jnp.zeros((1, H, W, CC + CT), jnp.float32),
            jnp.zeros((1,), jnp.int32))["params"]
        qp_w = quantize_unet(load_params(ckpt_w, template=tmpl_w), calib_s,
                             base_ch=wch, stem_s2d=s2d)
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
            metric,
            timed(run_w, cond_w, gt_w, 100),
            config=f"width-distilled base-{wch}"
                   + (f" s2d-{s2d} stem" if s2d > 1 else "")
                   + f" 1-step student, int8, B={wb} ({params_s} params; "
                   "BENCH_NOTES.md 'Width distillation')" + extra_cfg,
            quality_checked=bool(mae_w <= TEACHER_ANCHOR * 0.95
                                 and abs(mae_w - expect_mae) < 0.02),
            verified_mae=round(mae_w, 5),
            weights=f"committed examples/checkpoints/distill_eps_student"
                    f"{spec}.bf16.msgpack, scored in-process vs teacher "
                    f"ddim-20 anchor {TEACHER_ANCHOR}")
        return True

    # ---- optional: guided-generation quality-equal int8+CFG (env-gated) ----
    # VERDICT r4 item 5: surface the measured 1.47x quality-equal CFG
    # setting (rollout calib + per-channel + bf16 conv1, BENCH_NOTES
    # "int8+CFG degradation FIXED") as a bench line. Self-checking: rebuilds
    # the r4 rich-set protocol (129-file --rich set, --file_list files
    # 96-127) in-process and scores BOTH bf16 and quality-equal int8 at g=3
    # through the cfg_sweep harness before timing the stacked sampler.
    if os.environ.get("S1S2_BENCH_CFG"):
        _cfg_line(CKPT_DIR, UNetSmall, Schedule, load_params)

    # ---- optional: full intermediate width ladder (env-gated) ----
    if os.environ.get("S1S2_BENCH_WIDTHS"):
        for spec, wb, expect_mae, params_s in WIDTHS:
            rung(spec, wb, expect_mae, params_s,
                 f"patches_per_sec_per_chip_distill1_w{spec}_int8"
                 "_at_ddim20_quality_256px")

    # ---- 3. HEADLINE (always the LAST line) ----
    for spec, wb, expect_mae, params_s in HEADLINE_PREF:
        if rung(spec, wb, expect_mae, params_s,
                f"patches_per_sec_per_chip_distill1_w{spec}_int8"
                "_at_ddim20_quality_256px",
                extra_cfg="; HEADLINE — held-out generalization table in "
                          "distill_width_holdout.jsonl"):
            break
    else:
        # no width checkpoint at all: fall back to the base-96 student line
        # (r2 headline) so the driver still parses a distilled metric
        rung("1", 64, 0.36465, "17M",
             "patches_per_sec_per_chip_distill1_int8_at_ddim20_quality"
             "_256px")


if __name__ == "__main__":
    main()
