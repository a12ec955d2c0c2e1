"""Offline post-training quantization: produce a deployable int8 artifact.

    python -m s1s2.cli.quantize --ckpt model.msgpack --patch_dir P \
        --out model.int8.msgpack [--t_start 200]

Calibrates activation scales on the first patches of --patch_dir at a
spread of sampler timesteps (same recipe as `evaluate --int8`), quantizes
the double-conv weights per-output-channel, and writes one msgpack blob
that `evaluate --int8_ckpt` / `models.quant.load_quant` serve WITHOUT
recalibration (~20 s saved per process on the v5e tunnel).
"""

import argparse
import json


def main(argv=None) -> None:
    ap = argparse.ArgumentParser("s1s2 quantize")
    ap.add_argument("--ckpt", required=True, help=".msgpack or reference .pth")
    ap.add_argument("--patch_dir", required=True, help="calibration patches")
    ap.add_argument("--out", required=True, help="output .int8.msgpack")
    ap.add_argument("--T", type=int, default=1000)
    ap.add_argument("--base_ch", type=int, default=96)
    ap.add_argument("--s2d", type=int, default=1,
                    help="checkpoint's UNetSmall.stem_s2d factor (stored in "
                         "the int8 artifact's meta; 1 = reference topology)")
    ap.add_argument("--t_start", type=int, default=200,
                    help="top of the calibration timestep spread")
    ap.add_argument("--n_calib", type=int, default=8)
    ap.add_argument("--seed", type=int, default=1234)
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from s1s2.core import Schedule
    from s1s2.core.parametrize import q_sample
    from s1s2.data.dataset import NpzPatchDataset
    from s1s2.models import UNetSmall
    from s1s2.models.quant import quantize_unet, save_quant

    ds = NpzPatchDataset(args.patch_dir)
    Cc, Ct, H, W = ds.probe_channels()
    if args.ckpt.endswith(".pth"):
        from s1s2.models.convert import load_pth_checkpoint

        params = load_pth_checkpoint(args.ckpt)["params"]
    else:
        from s1s2.train.checkpoint import load_model

        model = UNetSmall(out_ch=Ct, base_ch=args.base_ch,
                          stem_s2d=args.s2d)
        template = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, H, W, Cc + Ct)),
            jnp.zeros((1,), jnp.int32))["params"]
        params = load_model(template, args.ckpt)

    n = min(len(ds), args.n_calib)
    items = [ds[i] for i in range(n)]
    cond = jnp.asarray(np.stack([d["cond"] for d in items]))
    gt = jnp.asarray(np.stack([d["target"] for d in items]))
    schedule = Schedule.cosine(args.T)
    ab = schedule.alpha_bar_np()
    t_hi = min(max(args.t_start, 1), args.T - 1)
    key = jax.random.PRNGKey(args.seed)
    calib = []
    for tval in sorted({t_hi, max(t_hi // 2, 1), min(5, t_hi)}):
        key, sub = jax.random.split(key)
        x_t = q_sample(gt, jax.random.normal(sub, gt.shape),
                       float(np.sqrt(ab[tval])), float(np.sqrt(1.0 - ab[tval])))
        calib.append((jnp.concatenate([x_t, cond], -1),
                      jnp.full((n,), tval, jnp.int32)))
        calib.append((jnp.concatenate([x_t, jnp.zeros_like(cond)], -1),
                      jnp.full((n,), tval, jnp.int32)))  # CFG null-cond too

    qp = quantize_unet(params, calib, out_ch=Ct, base_ch=args.base_ch,
                       stem_s2d=args.s2d)
    save_quant(qp, args.out)
    print(json.dumps({"out": args.out, "conv_scales": len(qp.act_scale),
                      "calib_files": n}))


if __name__ == "__main__":
    main()
