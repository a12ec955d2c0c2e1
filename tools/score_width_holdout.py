"""Held-out generalization check for the width-distillation ladder.

The width students (BENCH_NOTES.md "Width distillation") are trained on
the 32-file deterministic evidence set (seed 0) — the same protocol as the
r2 base-96 evidence. A narrower student could in principle match on the
training patches while generalizing worse, so this tool scores the teacher
and EVERY committed student width on a HELD-OUT synthetic set the students
never saw (``make_synthetic --seed 1``), full metric suite, bf16 and int8.

Usage:
    python -m s1s2.cli.make_synthetic --out /tmp/d2/patches --n 32 \
        --size 256 --seed 1
    python tools/score_width_holdout.py --patch_dir /tmp/d2/patches \
        --out examples/results_synthetic/distill_width_holdout.jsonl
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CKPT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples", "checkpoints")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--patch_dir", required=True,
                    help="held-out patch dir (different make_synthetic seed "
                         "than the training/evidence set)")
    ap.add_argument("--t_start", type=int, default=200)
    ap.add_argument("--widths", type=str, nargs="+",
                    default=["96", "64", "48", "32", "24", "16"],
                    help="BASE or BASExS (S = s2d stem factor; ckpt name "
                         "distill_eps_student{BASExS})")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from s1s2.core import Schedule
    from s1s2.data.dataset import NpzPatchDataset
    from s1s2.eval import metrics as M
    from s1s2.models import UNetSmall
    from s1s2.models.quant import (make_quant_denoise_fn,
                                   make_sampler_calib, quantize_unet)
    from s1s2.sampling import ddim_anchored, make_denoise_fn
    from s1s2.train.checkpoint import load_params

    T = 1000
    schedule = Schedule.cosine(T)
    ab = schedule.alpha_bar_np()

    ds = NpzPatchDataset(args.patch_dir)
    items = [ds[i] for i in range(len(ds))]
    cond = jnp.asarray(np.stack([d["cond"] for d in items]))
    gt = jnp.asarray(np.stack([d["target"] for d in items]))
    mask = jnp.asarray(np.stack(
        [np.ones(d["target"].shape[:2], np.float32) if d["mask"] is None
         else d["mask"] for d in items]))

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

    def make_calib(params_unused):
        return make_sampler_calib(
            gt, cond, ab, (args.t_start, max(args.t_start // 2, 1), 20))

    def load(width, name, s2d=1):
        model = UNetSmall(out_ch=4, base_ch=width, stem_s2d=s2d,
                          compute_dtype=jnp.bfloat16)
        tmpl = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1,) + gt.shape[1:3] + (8,),
                                             jnp.float32),
            jnp.zeros((1,), jnp.int32))["params"]
        return model, load_params(os.path.join(CKPT_DIR, name), template=tmpl)

    # teacher (base 96, ddim-20 anchor) in bf16
    t_model, teacher = load(96, "distill_eps_teacher.bf16.msgpack")
    score("teacher_ddim20",
          ddim_anchored(make_denoise_fn(t_model.apply, {"params": teacher},
                                        cond),
                        gt, key, schedule, args.t_start, 20, noise=noise))

    # base-96 is the original r2 step-distilled student ("student1");
    # every narrower rung is archived as distill_eps_student{width}
    for spec in args.widths:
        w_s, _, s2d_s = str(spec).partition("x")
        w, s2d = int(w_s), int(s2d_s or 1)
        tag = "1" if (w == 96 and s2d == 1) else str(spec)
        name = f"distill_eps_student{tag}.bf16.msgpack"
        model, params = load(w, name, s2d)
        score(f"student{spec}_ddim1",
              ddim_anchored(make_denoise_fn(model.apply, {"params": params},
                                            cond),
                            gt, key, schedule, args.t_start, 1, noise=noise))
        qp = quantize_unet(params, make_calib(params), stem_s2d=s2d)
        score(f"student{spec}_int8_ddim1",
              ddim_anchored(make_quant_denoise_fn(qp, cond),
                            gt, key, schedule, args.t_start, 1, noise=noise))

    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps({k: (round(v, 5) if isinstance(v, float)
                                        else v) for k, v in r.items()}) + "\n")


if __name__ == "__main__":
    main()
