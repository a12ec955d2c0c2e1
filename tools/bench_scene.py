"""Full-scene stitched-inference throughput (the production serving path).

Times `s1s2.eval.scene.infer_scene` on a synthetic H×W×4 cond scene,
including the host-side tiling/feather-stitch work — the end-to-end scene
number (device sampler rate alone is bench.py). Warmup excluded via a
one-batch pre-call.

Model/sampler are parametric so the scene path can be measured at any
frontier point (throughput is weight-independent; random init):

  # r2 general-purpose config (historical table):
  python tools/bench_scene.py
  # r5 refresh — 1-call w24 v student (the quality-proven pure-gen scene
  # model, cf. serve) and the 16x2 headline topology:
  python tools/bench_scene.py --base_ch 24 --solver ddim --steps 1 \
      --pred_param v --t_start 999 --batch 128 --modes fast
  python tools/bench_scene.py --base_ch 16 --s2d 2 --solver ddim --steps 1 \
      --t_start 200 --batch 128 --modes fast

Scene inference is PURE GENERATION from S1 cond (no GT anchor exists for
an unseen scene), so the quality-proven operating point is the w24
guidance-distilled pure-gen student (BENCH_NOTES "Pure generation");
the 16x2/48x4 rungs are anchored-reconstruction students — their scene
run measures what the headline TOPOLOGY does end-to-end, not a certified
scene quality point (16x2 pure-gen was a measured negative, r4).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1536)
    ap.add_argument("--patch", type=int, default=256)
    ap.add_argument("--stride", type=int, default=192)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--t_start", type=int, default=200)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--base_ch", type=int, default=96)
    ap.add_argument("--s2d", type=int, default=1)
    ap.add_argument("--solver", choices=["dpm2m", "ddim"], default="dpm2m")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--pred_param", choices=["eps", "v"], default="eps")
    ap.add_argument("--modes", choices=["all", "fast"], default="all",
                    help="all = the full 6-row transfer-engineering table; "
                         "fast = only the two best rows (f16 both + "
                         "pipeline-3, device-stitch)")
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from s1s2.core import Schedule
    from s1s2.core.parametrize import Parameterization
    from s1s2.eval.scene import infer_scene, tile_coords
    from s1s2.models import UNetSmall
    from s1s2.models.quant import make_quant_denoise_fn, quantize_unet
    from s1s2.sampling import ddim_grid_sample, dpm_solver_2m
    from s1s2.sampling.grids import round_unique_grid

    H = W = args.size
    ps, CT = args.patch, 4
    param = Parameterization(args.pred_param)
    model = UNetSmall(out_ch=CT, base_ch=args.base_ch, stem_s2d=args.s2d,
                      compute_dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, ps, ps, 8), jnp.float32),
        jnp.zeros((1,), jnp.int32))
    schedule = Schedule.cosine(1000)
    grid = round_unique_grid(args.t_start, args.steps, 1000)
    vscale = float(np.sqrt(
        1.0 - schedule.alpha_bar_np()[min(max(args.t_start, 1), 999)]))

    rng = np.random.default_rng(0)
    scene = rng.standard_normal((H, W, 4)).astype(np.float32)

    calib = [(jnp.asarray(rng.standard_normal((8, ps, ps, 8)), jnp.float32),
              jnp.full((8,), t, jnp.int32))
             for t in (args.t_start, 100, 5)]
    qp = quantize_unet(variables["params"], calib, base_ch=args.base_ch,
                       stem_s2d=args.s2d)

    def sample(fn, noise_b):
        x0 = noise_b if param is Parameterization.EPS else noise_b * vscale
        if args.solver == "dpm2m":
            return dpm_solver_2m(fn, x0, schedule, grid, param)
        return ddim_grid_sample(fn, x0, jax.random.PRNGKey(0), schedule,
                                grid, param)

    @jax.jit
    def predict_host_noise(cond_b, noise_b):
        fn = make_quant_denoise_fn(qp, cond_b.astype(jnp.float32))
        return sample(fn, noise_b)

    @jax.jit
    def predict_device_noise(cond_b, seeds_b):
        fn = make_quant_denoise_fn(qp, cond_b.astype(jnp.float32))
        noise_b = jax.vmap(
            lambda s: jax.random.normal(jax.random.PRNGKey(s),
                                        (ps, ps, CT), jnp.float32))(seeds_b)
        return sample(fn, noise_b)

    @jax.jit
    def predict_f16_out(cond_b, seeds_b):
        return predict_device_noise.__wrapped__(
            cond_b, seeds_b).astype(jnp.float16)

    n_tiles = len(tile_coords(H, W, ps, args.stride))
    sampler_s = (f"{args.solver}-{args.steps} int8 base{args.base_ch}"
                 + (f" s2d{args.s2d}" if args.s2d > 1 else "")
                 + f" {args.pred_param} t{args.t_start}")

    def timed(predict, **kw):
        # warmup/compile
        infer_scene(predict, scene[:ps + 1, :ps + 1], CT, ps=ps,
                    stride=ps, batch_size=args.batch, **kw)
        best = None
        for r in range(args.repeats):
            t0 = time.perf_counter()
            out = infer_scene(predict, scene, CT, ps=ps,
                              stride=args.stride, batch_size=args.batch,
                              rng_seed=r, **kw)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best, out

    rows = (
        ("host-noise f32", predict_host_noise, {}),
        ("device-noise f32", predict_device_noise, {"noise": "device"}),
        ("device-noise f16-transfer", predict_device_noise,
         {"noise": "device", "transfer_dtype": np.float16}),
        ("device-noise f16 both ways", predict_f16_out,
         {"noise": "device", "transfer_dtype": np.float16}),
        ("f16 both + pipeline-3", predict_f16_out,
         {"noise": "device", "transfer_dtype": np.float16, "pipeline": 3}),
        ("device-stitch + pipeline-3", predict_device_noise,
         {"noise": "device", "transfer_dtype": np.float16, "pipeline": 3,
          "stitch": "device"}),
    )
    if args.modes == "fast":
        rows = rows[-2:]
    for label, predict, kw in rows:
        best, out = timed(predict, **kw)
        print(json.dumps({
            "mode": label, "scene": f"{H}x{W}", "tiles": n_tiles,
            "batch": args.batch, "sampler": sampler_s,
            "scene_seconds": round(best, 3),
            "tiles_per_s": round(n_tiles / best, 2),
            "mpx_per_s": round(H * W / best / 1e6, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
