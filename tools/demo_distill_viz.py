"""Render judge-facing compare strips for the distilled 1-step student.

For the first --k patches of a tools/bench_distill.py workdir, saves
true-color strips  GT | teacher ddim-20 | student ddim-1  (per-image
percentile stretch, `s1s2/viz/render.py`) plus a summary JSON with the
per-image MAE of both predictions — the visual counterpart of
examples/results_synthetic/distill_full_metrics.jsonl.

Usage:
    python tools/demo_distill_viz.py --workdir /tmp/s1s2_distill_XXXX \
        --out examples/results_synthetic/distill_demo --k 4
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
    ap.add_argument("--out", required=True)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--t_start", type=int, default=200)
    ap.add_argument("--param", choices=("eps", "v"), default="eps",
                    help="TEACHER parameterization (students are always eps)")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from s1s2.core import Schedule
    from s1s2.data.dataset import NpzPatchDataset
    from s1s2.eval.metrics import masked_mae_per_sample
    from s1s2.models import UNetSmall
    from s1s2.sampling import ddim_anchored, make_denoise_fn
    from s1s2.train.checkpoint import load_params
    from s1s2.viz.render import true_color

    def strip3(a, b, c, gap=6):
        h = a.shape[0]
        pad = np.full((h, gap, 3), 255, np.uint8)
        return np.concatenate([a, pad, b, pad, c], axis=1)

    ds = NpzPatchDataset(os.path.join(args.workdir, "patches"))
    items = [ds[i] for i in range(min(args.k, len(ds)))]
    cond = jnp.asarray(np.stack([d["cond"] for d in items]))
    gt = jnp.asarray(np.stack([d["target"] for d in items]))
    mask = jnp.asarray(np.stack([
        np.ones(d["target"].shape[:2], np.float32)
        if d["mask"] is None else d["mask"] for d in items]))

    model = UNetSmall(out_ch=4, base_ch=96, compute_dtype=jnp.bfloat16)
    tmpl = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1,) + gt.shape[1:3] + (8,), jnp.float32),
        jnp.zeros((1,), jnp.int32))["params"]
    teacher = load_params(os.path.join(args.workdir, args.teacher),
                          template=tmpl)
    student = load_params(os.path.join(args.workdir, args.student),
                          template=tmpl)

    schedule = Schedule.cosine(1000)
    key = jax.random.PRNGKey(1234)
    noise = jax.random.normal(key, gt.shape)

    def run(params, steps, param="eps"):
        fn = make_denoise_fn(model.apply, {"params": params}, cond)
        if param == "eps":
            return ddim_anchored(fn, gt, key, schedule, args.t_start, steps,
                                 noise=noise)
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

    t20 = run(teacher, 20, args.param)
    s1 = run(student, 1)

    os.makedirs(args.out, exist_ok=True)
    rows = []
    for i in range(gt.shape[0]):
        strip = strip3(true_color(np.asarray(gt[i])),
                       true_color(np.asarray(t20[i])),
                       true_color(np.asarray(s1[i])))
        Image.fromarray(strip).save(
            os.path.join(args.out, f"patch{i:02d}_gt_teacher20_student1.png"))
        rows.append({
            "patch": i,
            "teacher20_mae": round(float(np.asarray(
                masked_mae_per_sample(t20[i:i + 1], gt[i:i + 1], mask[i:i + 1])).reshape(-1)[0]), 5),
            "student1_mae": round(float(np.asarray(
                masked_mae_per_sample(s1[i:i + 1], gt[i:i + 1], mask[i:i + 1])).reshape(-1)[0]), 5),
        })
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump({"layout": "GT | teacher ddim-20 | student ddim-1",
                   "rows": rows}, f, indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
