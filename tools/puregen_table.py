"""Pure-generation steps x guidance table (BENCH_NOTES "Pure generation").

Runs the harness's `true_infer` mode (full 5-metric table, mirroring the
reference's `Evaluation_Updated/Evaluation_Pure_Generation.py:538-573`
summary) over a grid of DDIM step budgets and CFG guidance scales in ONE
process — the checkpoint loads once, each cell compiles its own fused
sampler. The point (VERDICT r2 "non-vacuous pure generation"): show a
teacher whose pure-gen quality *improves with step budget*, and where
guidance (one stacked cond/uncond forward) shifts the curve.

Usage:
  python tools/puregen_table.py --ckpt /tmp/cfg_v/model_best.msgpack \
      --patch_dir /tmp/rich_patches --file_list /tmp/rich_eval_files.txt \
      --out_dir /tmp/puregen_table [--int8] [--steps 1 2 5 10 20 50] \
      [--scales 1 2] [--n_seeds 4]

Prints one JSON line per cell and writes <out_dir>/puregen_table.csv.
"""

import argparse
import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--patch_dir", required=True)
    ap.add_argument("--file_list", default=None)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--pred_param", default="v", choices=["eps", "v"])
    ap.add_argument("--base_ch", type=int, default=96)
    ap.add_argument("--T", type=int, default=1000)
    ap.add_argument("--t_start", type=int, default=999)
    ap.add_argument("--steps", type=int, nargs="+", default=[1, 2, 5, 10, 20, 50])
    ap.add_argument("--scales", type=float, nargs="+", default=[1.0, 2.0])
    ap.add_argument("--n_seeds", type=int, default=4)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--cache_dir", default=None)
    ap.add_argument("--jsonl", default=None,
                    help="also append one JSON row per cell here")
    args = ap.parse_args()

    from s1s2.eval.harness import EvalConfig, EvalContext, run_true_infer
    from s1s2.sampling.grids import round_unique_grid

    os.makedirs(args.out_dir, exist_ok=True)
    cfg = EvalConfig(
        patch_dir=args.patch_dir, out_dir=args.out_dir, ckpt=args.ckpt,
        mode="true_infer", T=args.T, base_ch=args.base_ch,
        pred_param=args.pred_param, batch_size=args.batch_size,
        t_start=args.t_start, n_seeds=args.n_seeds, int8=args.int8,
        file_list=args.file_list, cache_dir=args.cache_dir,
        # non-None BEFORE init so int8 calibration covers the null-cond pass
        guidance_scale=args.scales[0],
    )
    ctx = EvalContext(cfg)

    rows = []
    for g in args.scales:
        for steps in args.steps:
            # denoise_fn and the sampler grid both read cfg at build time
            cfg.guidance_scale = None if g == 1.0 else float(g)
            cfg.ddim_steps = int(steps)
            cfg.out_dir = os.path.join(args.out_dir, f"g{g:g}_s{steps}")
            os.makedirs(cfg.out_dir, exist_ok=True)
            r = run_true_infer(ctx)
            # v-grid convention: `steps` counts grid POINTS; transitions
            # (model calls per sample) = len(grid)-1 (grids.py docstring)
            if args.pred_param == "v":
                calls = len(round_unique_grid(args.t_start, steps, args.T)) - 1
            else:
                calls = steps
            row = {"guidance": g, "steps": steps, "calls": calls,
                   "t_start": args.t_start,
                   "n_seeds": args.n_seeds, "int8": args.int8,
                   **{k: round(v, 6) for k, v in r.items()}}
            print(json.dumps(row), flush=True)
            if args.jsonl:
                with open(args.jsonl, "a") as f:
                    f.write(json.dumps(row) + "\n")
            rows.append(row)

    with open(os.path.join(args.out_dir, "puregen_table.csv"), "w",
              newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)


if __name__ == "__main__":
    main()
