"""Full-metric scoring of a distilled student vs its teacher.

Strengthens the MAE-only quality-matched claim in
examples/results_synthetic/distill_evidence.jsonl: loads the teacher and
endpoint-distilled student checkpoints from a tools/bench_distill.py
workdir and scores teacher ddim-20 vs student ddim-1 (and optionally the
int8-quantized student) on the full metric suite — masked MAE, MSE, PSNR,
SSIM, SAM, ERGAS (s1s2/eval/metrics.py, the same functions behind the
reference's Comparison_Original 5-column schema).

Usage:
    python tools/score_distill_full.py --workdir /tmp/s1s2_distill_XXXX \
        [--int8] [--t_start 200]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--teacher", default="teacher_last.msgpack")
    ap.add_argument("--student", default="student_endpoint.msgpack")
    ap.add_argument("--t_start", type=int, default=200)
    ap.add_argument("--param", choices=("eps", "v"), default="eps",
                    help="TEACHER parameterization (students are always eps)")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--student_steps", type=int, default=1,
                    help="student DDIM budget (2 for the progressive-only "
                    "2-step SAM experiment, BENCH_NOTES 'Step distillation')")
    ap.add_argument("--student_base_ch", type=int, default=96,
                    help="student UNet width (width-distilled students, "
                    "distill --student_base_ch)")
    ap.add_argument("--student_s2d", type=int, default=1,
                    help="student's space-to-depth stem factor (matches "
                    "distill --student_s2d)")
    ap.add_argument("--out", default=None, help="write rows to this JSONL")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from s1s2.core import Schedule
    from s1s2.data.dataset import NpzPatchDataset
    from s1s2.eval import metrics as M
    from s1s2.models import UNetSmall
    from s1s2.sampling import ddim_anchored, make_denoise_fn
    from s1s2.train.checkpoint import load_params

    T = 1000
    schedule = Schedule.cosine(T)
    model = UNetSmall(out_ch=4, base_ch=96, compute_dtype=jnp.bfloat16)

    ds = NpzPatchDataset(os.path.join(args.workdir, "patches"))
    conds, gts, masks = [], [], []
    for i in range(len(ds)):
        item = ds[i]
        conds.append(item["cond"])
        gts.append(item["target"])
        m = item["mask"]
        masks.append(np.ones(item["target"].shape[:2], np.float32)
                     if m is None else m)
    cond = jnp.asarray(np.stack(conds))
    gt = jnp.asarray(np.stack(gts))
    mask = jnp.asarray(np.stack(masks))

    s_model = (model
               if args.student_base_ch == 96 and args.student_s2d == 1 else
               UNetSmall(out_ch=4, base_ch=args.student_base_ch,
                         stem_s2d=args.student_s2d,
                         compute_dtype=jnp.bfloat16))

    def make_tmpl(m):
        return m.init(
            jax.random.PRNGKey(0), jnp.zeros((1,) + gt.shape[1:3] + (8,),
                                             jnp.float32),
            jnp.zeros((1,), jnp.int32))["params"]

    tmpl = make_tmpl(model)
    teacher = load_params(os.path.join(args.workdir, args.teacher),
                          template=tmpl)
    student = load_params(
        os.path.join(args.workdir, args.student),
        template=tmpl if s_model is model else make_tmpl(s_model))

    key = jax.random.PRNGKey(1234)
    noise = jax.random.normal(key, gt.shape)

    rows = []

    def score(tag, pred):
        row = {
            "model": tag,
            "mae": float(M.masked_mae(pred, gt, mask)),
            "mse": float(M.masked_mse(pred, gt, mask)),
            "psnr": float(M.psnr(pred, gt, mask)),
            "ssim": float(M.ssim_simple(pred, gt)),
            "sam_rad": float(M.sam(pred, gt, mask)),
            "ergas": float(M.ergas(pred, gt, mask)),
        }
        rows.append(row)
        print(json.dumps({k: (round(v, 5) if isinstance(v, float) else v)
                          for k, v in row.items()}), flush=True)
        return row

    def run(params, steps, param="eps", apply_fn=None):
        fn = make_denoise_fn(apply_fn or model.apply, {"params": params},
                             cond)
        if param == "eps":
            return ddim_anchored(fn, gt, key, schedule, args.t_start, steps,
                                 noise=noise)
        # v teachers: round-unique grid sampler with the anchored init
        # (same convention as tools/bench_distill.py --param v)
        from s1s2.core.parametrize import Parameterization, q_sample
        from s1s2.sampling import ddim_grid_sample
        from s1s2.sampling.grids import round_unique_grid

        ab = schedule.alpha_bar_np()
        grid = round_unique_grid(args.t_start, steps, schedule.T)
        K = int(grid[-1])
        x_init = q_sample(gt, noise, float(np.sqrt(ab[K])),
                          float(np.sqrt(1.0 - ab[K])))
        return ddim_grid_sample(fn, x_init, key, schedule, grid,
                                Parameterization.V)

    t20 = score("teacher_ddim20", run(teacher, 20, args.param))
    score("teacher_ddim1", run(teacher, 1, args.param))
    n_s = args.student_steps
    s1 = score(f"student_ep_ddim{n_s}",
               run(student, n_s, apply_fn=s_model.apply))

    if args.int8:
        from s1s2.models.quant import (make_quant_denoise_fn,
                                       make_sampler_calib, quantize_unet)

        ab = schedule.alpha_bar_np()
        t_hi = min(max(args.t_start, 1), schedule.T - 1)
        qp = quantize_unet(student, make_sampler_calib(
            gt, cond, ab, (t_hi, max(t_hi // 2, 1), 20)),
            stem_s2d=args.student_s2d)
        fn = make_quant_denoise_fn(qp, cond)
        score(f"student_ep_int8_ddim{n_s}",
              ddim_anchored(fn, gt, key, schedule, args.t_start, n_s,
                            noise=noise))

    summary = {
        "summary": True,
        "quality_matched_full": bool(
            s1["mae"] <= t20["mae"] * 1.01
            and s1["ssim"] >= t20["ssim"] - 0.01
            and s1["sam_rad"] <= t20["sam_rad"] * 1.05),
    }
    rows.append(summary)
    print(json.dumps(summary), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps({k: (round(v, 5) if isinstance(v, float)
                                        else v) for k, v in r.items()}) + "\n")


if __name__ == "__main__":
    main()
