"""Full-scene inference CLI — tile a large preprocessed scene, run the
batched DDIM sampler per tile, stitch with feathered blending (capability
the reference lacks; SURVEY.md §5 spatial-scale axis).

    python -m s1s2.cli.infer_scene --scene cond.npy --ckpt m.msgpack \
        --out_dir out --pred_param v --t_start 999 --ddim_steps 50

``--scene`` is a (H,W,4) or (4,H,W) .npy of S1 conditioning channels
(raw values with --normalize, else already Patch.py-normalized).
"""

import argparse
import json
import os


def main(argv=None) -> None:
    ap = argparse.ArgumentParser("s1s2 infer_scene")
    ap.add_argument("--scene", required=True, help=".npy cond scene")
    ap.add_argument("--mask", default=None, help="optional (H,W) .npy valid mask")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--T", type=int, default=1000)
    ap.add_argument("--base_ch", type=int, default=96)
    ap.add_argument("--out_ch", type=int, default=4)
    ap.add_argument("--pred_param", choices=["eps", "v"], default="eps")
    ap.add_argument("--t_start", type=int, default=999)
    ap.add_argument("--ddim_steps", type=int, default=50)
    ap.add_argument("--eta", type=float, default=0.0)
    ap.add_argument("--patch_size", type=int, default=256)
    ap.add_argument("--stride", type=int, default=192)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--normalize", action="store_true",
                    help="apply Patch.py per-tile normalization to raw S1")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--guidance_scale", type=float, default=None)
    ap.add_argument("--solver", choices=["ddim", "dpm2m"], default="ddim")
    ap.add_argument("--mesh_data", type=int, default=0,
                    help="shard tile batches over N devices' 'data' axis "
                         "(0 = single device); batch_size must divide by N")
    ap.add_argument("--fast_transfer", action="store_true",
                    help="remote-runtime transfer optimizations: draw the "
                         "init noise on device (deterministic per tile), "
                         "move cond/pred over the wire in f16, and keep 3 "
                         "batches in flight (2.3x scene speedup measured; "
                         "BENCH_NOTES.md 'Scene inference')")
    ap.add_argument("--stitch", choices=["host", "device"], default="host",
                    help="'device' feather-accumulates on the chip "
                         "(scene.make_device_stitcher): predictions never "
                         "download per batch, only the final scene once — "
                         "removes the single-core numpy stitch stage")
    ap.add_argument("--s2d", type=int, default=1,
                    help="checkpoint's UNetSmall.stem_s2d factor (1 = "
                         "reference topology; s2d-distilled students run "
                         "their body at patch_size/s2d resolution)")
    ap.add_argument("--int8", action="store_true",
                    help="quantized int8 inference (models/quant.py); "
                         "calibrated on the scene's first tile batch")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from s1s2.core import Parameterization, Schedule
    from s1s2.eval.scene import infer_scene
    from s1s2.models import UNetSmall
    from s1s2.sampling import (
        ddim_grid_sample,
        make_cfg_denoise_fn,
        make_denoise_fn,
        round_unique_grid,
    )
    from s1s2.sampling.samplers import _ddim_linspace_scan
    from s1s2.viz import save_rgb_triplet

    scene = np.load(args.scene).astype(np.float32)
    if scene.ndim != 3:
        raise ValueError("scene must be 3-D")
    if scene.shape[0] <= 8 and scene.shape[-1] > 8:
        scene = np.transpose(scene, (1, 2, 0))  # CHW → HWC
    mask = np.load(args.mask).astype(np.float32) if args.mask else None

    model = UNetSmall(out_ch=args.out_ch, base_ch=args.base_ch,
                      stem_s2d=args.s2d)
    schedule = Schedule.cosine(args.T)
    param = Parameterization(args.pred_param)

    # uniform checkpoint loading: .pth converter, msgpack, or orbax dir
    from s1s2.train.checkpoint import load_params

    ps = args.patch_size
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, ps, ps, scene.shape[-1] + args.out_ch)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    variables = {"params": load_params(args.ckpt, template=template)}

    grid = round_unique_grid(args.t_start, args.ddim_steps, args.T)
    ab = float(schedule.alpha_bar_np()[min(max(args.t_start, 1), args.T - 1)])
    vscale = float(np.sqrt(1.0 - ab))

    qp = None
    if args.int8:
        from s1s2.eval.scene import normalize_tile, tile_coords
        from s1s2.models.quant import quantize_unet

        ps_, t_hi = args.patch_size, min(max(args.t_start, 1), args.T - 1)
        coords = tile_coords(scene.shape[0], scene.shape[1], ps_, args.stride)
        tiles = []
        for r, c in coords[: min(8, len(coords))]:
            t = scene[r : r + ps_, c : c + ps_].astype(np.float32)
            if args.normalize:
                m = (mask[r : r + ps_, c : c + ps_] if mask is not None else None)
                t = normalize_tile(t, m)
            tiles.append(t)
        cond_c = jnp.asarray(np.stack(tiles))
        n = cond_c.shape[0]
        rng = np.random.default_rng(args.seed)
        calib = []
        # pure generation has no GT for q_sample: cover the trajectory's
        # range with noise at t_hi and near-[0,1] mixtures at low t
        for tval, amp, mu in ((t_hi, 1.0, 0.0),
                              (max(t_hi // 2, 1), 0.6, 0.2),
                              (5, 0.2, 0.5)):
            x_t = (rng.standard_normal((n, ps_, ps_, args.out_ch)) * amp
                   + mu).astype(np.float32)
            calib.append((jnp.concatenate([jnp.asarray(x_t), cond_c], -1),
                          jnp.full((n,), tval, jnp.int32)))
        qp = quantize_unet(variables["params"], calib, out_ch=args.out_ch,
                           base_ch=args.base_ch, stem_s2d=args.s2d)

    @jax.jit
    def predict_batch(cond_b, noise_b):
        cond_b = cond_b.astype(jnp.float32)
        seeds_tag = None
        if args.fast_transfer:
            # noise_b arrives as (B,) int32 seeds; draw on device
            seeds_tag = noise_b[0]
            ps_n = args.patch_size
            noise_b = jax.vmap(
                lambda s: jax.random.normal(
                    jax.random.PRNGKey(s), (ps_n, ps_n, args.out_ch),
                    jnp.float32))(noise_b)
        if qp is not None:
            from s1s2.models.quant import (
                make_quant_cfg_denoise_fn,
                make_quant_denoise_fn,
            )

            fn = (make_quant_cfg_denoise_fn(qp, cond_b, args.guidance_scale)
                  if args.guidance_scale is not None
                  else make_quant_denoise_fn(qp, cond_b))
        elif args.guidance_scale is not None:
            fn = make_cfg_denoise_fn(model.apply, variables, cond_b,
                                     args.guidance_scale)
        else:
            fn = make_denoise_fn(model.apply, variables, cond_b)
        if args.solver == "dpm2m":
            from s1s2.sampling import dpm_solver_2m

            x_init = noise_b if param is Parameterization.EPS else noise_b * vscale
            out = dpm_solver_2m(fn, x_init, schedule, grid, param)
        elif param is Parameterization.EPS:
            out = _ddim_linspace_scan(fn, noise_b, schedule, args.t_start,
                                      args.ddim_steps, (0.0, 1.0))
        else:
            # vary the stochastic-eta key per tile batch (deterministically):
            # fold in a tag derived from this batch's noise/seed payload
            if args.fast_transfer:
                tag = seeds_tag
            else:
                tag = jax.lax.bitcast_convert_type(
                    noise_b[0, 0, 0, 0], jnp.int32)
            out = ddim_grid_sample(fn, noise_b * vscale,
                                   jax.random.fold_in(
                                       jax.random.PRNGKey(args.seed), tag),
                                   schedule, grid, Parameterization.V,
                                   eta=args.eta)
        # f16 is a wire-format optimization only — skip it when predictions
        # stay on device for the device-side stitch
        if args.fast_transfer and args.stitch != "device":
            return out.astype(jnp.float16)
        return out

    predict = predict_batch
    if args.mesh_data:
        from s1s2.parallel import make_mesh, shard_predict_batch

        mesh = make_mesh(data=args.mesh_data, space=1,
                         devices=jax.devices()[: args.mesh_data])
        predict = shard_predict_batch(predict_batch, mesh)

    fast = dict(noise="device", transfer_dtype=np.float16,
                pipeline=3) if args.fast_transfer else {}
    out = infer_scene(
        predict, scene, args.out_ch, ps=args.patch_size,
        stride=args.stride, batch_size=args.batch_size, mask_scene=mask,
        normalize=args.normalize, rng_seed=args.seed, stitch=args.stitch,
        **fast,
    )

    os.makedirs(args.out_dir, exist_ok=True)
    np.save(os.path.join(args.out_dir, "scene_pred.npy"),
            np.transpose(out, (2, 0, 1)))
    if args.out_ch >= 4:
        save_rgb_triplet(out, os.path.join(args.out_dir, "scene_true.png"),
                         os.path.join(args.out_dir, "scene_cir.png"))
    print(json.dumps({"out": args.out_dir, "shape": list(out.shape),
                      "tiles": "feather-stitched"}))


if __name__ == "__main__":
    main()
