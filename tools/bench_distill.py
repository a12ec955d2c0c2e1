"""Evidence run for the distilled few-step sampler (BENCH_NOTES.md).

Trains a soak teacher on synthetic patches (or loads --ckpt; --param picks
ε or v), distills it 16→8→4→2→1 steps with s1s2.train.distill (plus the
optional endpoint fine-tune), then scores GT-anchored reconstruction MAE
at t_start=200 for:

    teacher:  ddim-20 (the quality anchor), ddim-2, ddim-1 (undistilled
              few-step baselines), dpm2m-5
    student:  ddim-2, ddim-1, and (--int8) the quantized student at ddim-1

One JSON line per row + a summary line with
``quality_matched_distill1: student ddim-1 MAE <= teacher ddim-20 MAE*1.01``
— the claim behind bench.py's distilled throughput line. Soak models
establish ORDERING on a learnable task, not absolute quality (BENCH_NOTES.md).

Usage:
    python tools/bench_distill.py [--epochs 40] [--n 32] [--int8]
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40, help="teacher soak epochs")
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--t_start", type=int, default=200)
    ap.add_argument("--teacher_steps", type=int, default=16)
    ap.add_argument("--final_steps", type=int, default=1)
    ap.add_argument("--epochs_per_phase", type=int, default=8)
    ap.add_argument("--distill_lr", type=float, default=1e-4)
    ap.add_argument("--ckpt", default=None, help="skip teacher training")
    ap.add_argument("--param", choices=("eps", "v"), default="eps",
                    help="teacher parameterization (the student always "
                         "carries an eps head; distill converts internally)")
    ap.add_argument("--puregen", action="store_true",
                    help="distill/score the PURE-GENERATION map "
                         "(ddim_generate from unit noise; use with "
                         "--t_start 999). eps teachers only.")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--endpoint_epochs", type=int, default=0,
                    help="after the progressive phases, fine-tune the 1-step "
                         "student on teacher ddim-20 ENDPOINTS for this many "
                         "epochs (make_endpoint_distill_step)")
    ap.add_argument("--endpoint_seeds", type=int, default=4,
                    help="noise draws per patch for the endpoint target set")
    ap.add_argument("--skip_progressive", action="store_true",
                    help="endpoint-only: fine-tune straight from the teacher "
                         "(requires --endpoint_epochs > 0)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.skip_progressive and args.endpoint_epochs <= 0:
        ap.error("--skip_progressive needs --endpoint_epochs > 0 "
                 "(otherwise there is no student to score)")
    if args.puregen and args.param != "eps":
        ap.error("--puregen needs an eps teacher")

    import numpy as np
    import jax
    import jax.numpy as jnp

    from s1s2.core import Schedule
    from s1s2.core.parametrize import Parameterization, q_sample
    from s1s2.data.dataset import NpzPatchDataset
    from s1s2.data.synthetic import make_synthetic_patches
    from s1s2.models import UNetSmall
    from s1s2.sampling import (ddim_anchored, ddim_generate,
                               ddim_grid_sample, dpm_solver_2m,
                               make_denoise_fn)
    from s1s2.sampling.grids import round_unique_grid
    from s1s2.train.distill import DistillConfig, progressive_distill

    work = args.out or tempfile.mkdtemp(prefix="s1s2_distill_")
    patches = os.path.join(work, "patches")
    if not os.path.isdir(patches) or not os.listdir(patches):
        make_synthetic_patches(patches, n=args.n, size=args.size, seed=0)

    T = 1000
    schedule = Schedule.cosine(T)
    model = UNetSmall(out_ch=4, base_ch=96, compute_dtype=jnp.bfloat16)

    if args.ckpt:
        from s1s2.train.checkpoint import load_params

        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.size, args.size, 8), jnp.float32),
            jnp.zeros((1,), jnp.int32))
        teacher = load_params(args.ckpt, template=variables["params"])
    else:
        from s1s2.train.loop import TrainConfig
        from s1s2.train.trainer import RunConfig, train_loop

        run = RunConfig(patch_dir=patches,
                        model_path=os.path.join(work, "teacher.msgpack"),
                        epochs=args.epochs, batch_size=args.batch,
                        base_ch=96, seed=0)
        hist = train_loop(run, TrainConfig(T=T, pred_param=args.param),
                          progress=lambda d: d.get("avg_loss") is not None
                          and print(json.dumps(d), flush=True))
        teacher = hist["final_state"].ema_params

    npz_ds = NpzPatchDataset(patches)
    conds, gts, masks = [], [], []
    for i in range(len(npz_ds)):
        item = npz_ds[i]
        conds.append(item["cond"])
        gts.append(item["target"])
        m = item["mask"]
        masks.append(np.ones(item["target"].shape[:2], np.float32)
                     if m is None else m)
    cond = jnp.asarray(np.stack(conds))
    gt = jnp.asarray(np.stack(gts))
    mask = np.stack(masks)

    key = jax.random.PRNGKey(1234)
    noise = jax.random.normal(key, gt.shape)
    ab = schedule.alpha_bar_np()

    def mae(pred):
        pred = np.asarray(pred)
        m = mask[..., None]
        return float(np.abs((pred - np.asarray(gt)) * m).sum()
                     / (m.sum() * gt.shape[-1]))

    rows = {}

    def anchored_init(steps):
        grid = round_unique_grid(args.t_start, steps, T)
        K = int(grid[-1])
        return grid, q_sample(gt, noise, float(np.sqrt(ab[K])),
                              float(np.sqrt(1.0 - ab[K])))

    def score(tag, params, steps_list, dpm=False, param="eps"):
        fn = make_denoise_fn(model.apply, {"params": params}, cond)
        p = Parameterization(param)
        for steps in steps_list:
            if args.puregen:
                out = ddim_generate(fn, gt.shape, key, schedule,
                                    args.t_start, steps, noise=noise)
            elif param == "eps":
                out = ddim_anchored(fn, gt, key, schedule, args.t_start,
                                    steps, noise=noise)
            else:
                # v head has no linspace anchored sampler; use the
                # round-unique grid convention with the same anchored init
                grid, x_init = anchored_init(steps)
                out = ddim_grid_sample(fn, x_init, key, schedule, grid, p)
            rows[(tag, steps)] = mae(out)
            print(json.dumps({"model": tag, "sampler": "ddim", "steps": steps,
                              "mae": round(rows[(tag, steps)], 5)}), flush=True)
        if dpm:
            grid, x_init = anchored_init(5)
            out = dpm_solver_2m(fn, x_init, schedule, grid, p)
            rows[(tag, "dpm2m5")] = mae(out)
            print(json.dumps({"model": tag, "sampler": "dpm2m", "steps": 5,
                              "mae": round(rows[(tag, "dpm2m5")], 5)}),
                  flush=True)

    anchor_steps = 50 if args.puregen else 20
    score("teacher", teacher, (anchor_steps, 2, 1), dpm=not args.puregen,
          param=args.param)

    cfg = DistillConfig(  # noqa: E501  (shared by both distill modes)
        T=T, t_start=args.t_start, teacher_steps=args.teacher_steps,
        final_steps=args.final_steps, epochs_per_phase=args.epochs_per_phase,
        lr=args.distill_lr, teacher_param=args.param)
    from s1s2.train.checkpoint import save_model

    # the whole soak set fits in HBM (n×256²×8ch f32 ≈ 2MB/patch) — serve
    # distill batches by DEVICE-side gather instead of re-uploading ~100MB
    # per epoch over the remote-device tunnel
    n_ds = cond.shape[0]
    mask_d = jnp.asarray(mask)
    bsz = min(args.batch, n_ds)  # never zero batches on tiny sets

    def device_batches(seed):
        order = np.random.default_rng(seed).permutation(n_ds)
        for lo in range(0, n_ds - bsz + 1, bsz):
            idx = jnp.asarray(order[lo:lo + bsz])
            yield (jnp.take(cond, idx, axis=0), jnp.take(gt, idx, axis=0),
                   jnp.take(mask_d, idx, axis=0))

    if args.skip_progressive:
        student = jax.tree_util.tree_map(jnp.asarray, teacher)
    else:
        result = progressive_distill(
            model.apply, schedule, cfg, teacher,
            batches=lambda phase, epoch: device_batches(
                7 + phase * 10_000 + epoch),
            progress=lambda d: print(json.dumps(d), flush=True))
        student = result["params"]
        save_model(student, os.path.join(work, "student.msgpack"))
        score("student", student, (2, 1))

    if args.endpoint_epochs > 0:
        from s1s2.train.distill import endpoint_distill

        student = endpoint_distill(
            model.apply, schedule, cfg, student, teacher,
            cond, gt, mask,
            epochs=args.endpoint_epochs, batch_size=args.batch,
            teacher_steps=anchor_steps, n_seeds=args.endpoint_seeds,
            mode="puregen" if args.puregen else "anchored",
            progress=lambda d: print(json.dumps(d), flush=True))
        save_model(student, os.path.join(work, "student_endpoint.msgpack"))
        score("student_ep", student, (1,))

    best1 = min(v for (tag, s), v in rows.items()
                if s == 1 and tag != "teacher")
    summary = {
        "teacher_anchor_steps": anchor_steps,
        "teacher_ddim20_mae": round(rows[("teacher", anchor_steps)], 5),
        "teacher_ddim1_mae": round(rows[("teacher", 1)], 5),
        "student_ddim1_mae": round(best1, 5),
        "quality_matched_distill1": bool(
            best1 <= rows[("teacher", anchor_steps)] * 1.01),
        "workdir": work,
    }
    if ("student", 2) in rows:
        summary["student_ddim2_mae"] = round(rows[("student", 2)], 5)

    if args.int8:
        from s1s2.models.quant import make_quant_denoise_fn, quantize_unet

        calib = []
        for tval in (args.t_start, args.t_start // 2, 5):
            x_c = q_sample(gt[:8], noise[:8], float(np.sqrt(ab[tval])),
                           float(np.sqrt(1.0 - ab[tval])))
            calib.append((jnp.concatenate([x_c, cond[:8]], -1),
                          jnp.full((x_c.shape[0],), tval, jnp.int32)))
        qp = quantize_unet(student, calib)
        fn_q = make_quant_denoise_fn(qp, cond)
        if args.puregen:
            out = ddim_generate(fn_q, gt.shape, key, schedule, args.t_start,
                                1, noise=noise)
        else:
            out = ddim_anchored(fn_q, gt, key, schedule, args.t_start, 1,
                                noise=noise)
        m = mae(out)
        print(json.dumps({"model": "student_int8", "sampler": "ddim",
                          "steps": 1, "mae": round(m, 5)}), flush=True)
        summary["student_int8_ddim1_mae"] = round(m, 5)
        summary["quality_matched_distill1_int8"] = bool(
            m <= rows[("teacher", anchor_steps)] * 1.01)

    print(json.dumps(summary))


if __name__ == "__main__":
    main()
