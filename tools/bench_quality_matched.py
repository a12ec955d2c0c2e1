"""Reproduce the solver quality-vs-steps evidence tables (BENCH_NOTES.md).

Trains a quick soak model on synthetic patches (or loads --ckpt), then runs
GT-anchored reconstruction at t_start=200 with DDIM {20,10,5} steps and
DPM-Solver++(2M) {10,5} steps over the same files/noise, printing one JSON
line per row. This is the committed evidence behind bench.py's
quality-matched JSON line (patches/s at DDIM-20-matched quality using
dpm2m-5): the final line reports whether dpm2m-5 MAE <= ddim-20 MAE on the
same checkpoint.

Usage:
    python tools/bench_quality_matched.py [--epochs 8] [--n 32] [--ckpt X]

Soak models establish solver ORDERING (2nd-order multistep >= DDIM at ~4x
fewer calls), not absolute reconstruction quality — see BENCH_NOTES.md.
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--n", type=int, default=32, help="synthetic patch count")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--t_start", type=int, default=200)
    ap.add_argument("--ckpt", default=None, help="skip training, load this .msgpack/.pth")
    ap.add_argument("--int8", action="store_true",
                    help="also score the quantized int8 path (models/quant.py)")
    ap.add_argument("--out", default=None, help="workdir (default: tmp)")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from s1s2.core import Schedule
    from s1s2.core.parametrize import Parameterization, q_sample
    from s1s2.data.dataset import NpzPatchDataset
    from s1s2.data.synthetic import make_synthetic_patches
    from s1s2.models import UNetSmall
    from s1s2.sampling import ddim_anchored, dpm_solver_2m, make_denoise_fn
    from s1s2.sampling.grids import round_unique_grid

    work = args.out or tempfile.mkdtemp(prefix="s1s2_qm_")
    patches = os.path.join(work, "patches")
    if not os.path.isdir(patches) or not os.listdir(patches):
        make_synthetic_patches(patches, n=args.n, size=args.size, seed=0)

    T = 1000
    schedule = Schedule.cosine(T)
    model = UNetSmall(out_ch=4, base_ch=96, compute_dtype=jnp.bfloat16)

    if args.ckpt:
        from s1s2.train.checkpoint import load_any_checkpoint

        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.size, args.size, 8), jnp.float32),
            jnp.zeros((1,), jnp.int32),
        )
        params = load_any_checkpoint(args.ckpt, template=variables["params"])
    else:
        from s1s2.train.loop import TrainConfig
        from s1s2.train.trainer import RunConfig, train_loop

        run = RunConfig(
            patch_dir=patches,
            model_path=os.path.join(work, "soak.msgpack"),
            epochs=args.epochs, batch_size=args.batch, base_ch=96, seed=0,
        )
        cfg = TrainConfig(T=T, pred_param="eps")
        hist = train_loop(run, cfg,
                          progress=lambda d: print(json.dumps(d), flush=True))
        params = hist["final_state"].ema_params

    ds = NpzPatchDataset(patches)
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
    mask = np.stack(masks)

    t_start = args.t_start
    key = jax.random.PRNGKey(1234)
    noise = jax.random.normal(key, gt.shape)
    ab = schedule.alpha_bar_np()

    def mae(pred):
        pred = np.asarray(pred)
        m = mask[..., None]
        return float(np.abs((pred - np.asarray(gt)) * m).sum()
                     / (m.sum() * gt.shape[-1]))

    fn = make_denoise_fn(model.apply, {"params": params}, cond)
    fns = {"": fn}
    if args.int8:
        from s1s2.models.quant import (make_quant_denoise_fn,
                                       make_sampler_calib, quantize_unet)

        qp = quantize_unet(params, make_sampler_calib(
            gt, cond, ab, (t_start, t_start // 2, 5), noise=noise))
        fns["_int8"] = make_quant_denoise_fn(qp, cond)

    rows = {}
    for suffix, f in fns.items():
        for steps in (20, 10, 5):
            out = ddim_anchored(f, gt, key, schedule, t_start, steps,
                                noise=noise)
            rows[(f"ddim{suffix}", steps)] = mae(out)
            print(json.dumps({"sampler": f"ddim{suffix}", "steps": steps,
                              "mae": round(rows[(f"ddim{suffix}", steps)], 5)}),
                  flush=True)
        for steps in (10, 5):
            grid = round_unique_grid(t_start, steps, T)
            K = int(grid[-1])
            x_init = q_sample(gt, noise, float(np.sqrt(ab[K])),
                              float(np.sqrt(1.0 - ab[K])))
            out = dpm_solver_2m(f, x_init, schedule, grid, Parameterization.EPS)
            rows[(f"dpm2m{suffix}", steps)] = mae(out)
            print(json.dumps({"sampler": f"dpm2m{suffix}", "steps": steps,
                              "mae": round(rows[(f"dpm2m{suffix}", steps)], 5)}),
                  flush=True)

    d20 = rows[("ddim", 20)]
    summary = {
        "quality_matched": bool(rows[("dpm2m", 5)] <= d20 * 1.01),
        "ddim20_mae": round(d20, 5),
        "dpm2m5_mae": round(rows[("dpm2m", 5)], 5),
        "workdir": work,
    }
    if args.int8:
        summary["dpm2m5_int8_mae"] = round(rows[("dpm2m_int8", 5)], 5)
        summary["quality_matched_int8"] = bool(
            rows[("dpm2m_int8", 5)] <= d20 * 1.01)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
