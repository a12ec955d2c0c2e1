"""Full-scene stitched-inference throughput (the production serving path).

Times `s1s2.eval.scene.infer_scene` on a synthetic H×W×4 cond scene with
the quality-matched general-purpose sampler config: DPM-Solver++(2M)
5 steps through the int8 path (throughput is weight-independent; random
init). Includes the host-side tiling/feather-stitch work, so this is the
end-to-end scene number (device sampler throughput alone is bench.py
line 2). Warmup excluded via a one-batch pre-call.

Usage: python tools/bench_scene.py [--size 1536] [--batch 16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1536)
    ap.add_argument("--patch", type=int, default=256)
    ap.add_argument("--stride", type=int, default=192)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--t_start", type=int, default=200)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from s1s2.core import Schedule
    from s1s2.core.parametrize import Parameterization
    from s1s2.eval.scene import infer_scene, tile_coords
    from s1s2.models import UNetSmall
    from s1s2.models.quant import make_quant_denoise_fn, quantize_unet
    from s1s2.sampling import dpm_solver_2m
    from s1s2.sampling.grids import round_unique_grid

    H = W = args.size
    ps, CT = args.patch, 4
    model = UNetSmall(out_ch=CT, base_ch=96, compute_dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, ps, ps, 8), jnp.float32),
        jnp.zeros((1,), jnp.int32))
    schedule = Schedule.cosine(1000)
    grid = round_unique_grid(args.t_start, 5, 1000)

    rng = np.random.default_rng(0)
    scene = rng.standard_normal((H, W, 4)).astype(np.float32)

    calib = [(jnp.asarray(rng.standard_normal((8, ps, ps, 8)), jnp.float32)
              .astype(jnp.float32),
              jnp.full((8,), t, jnp.int32)) for t in (args.t_start, 100, 5)]
    qp = quantize_unet(variables["params"], calib)

    @jax.jit
    def predict_host_noise(cond_b, noise_b):
        fn = make_quant_denoise_fn(qp, cond_b.astype(jnp.float32))
        return dpm_solver_2m(fn, noise_b, schedule, grid,
                             Parameterization.EPS)

    @jax.jit
    def predict_device_noise(cond_b, seeds_b):
        fn = make_quant_denoise_fn(qp, cond_b.astype(jnp.float32))
        noise_b = jax.vmap(
            lambda s: jax.random.normal(jax.random.PRNGKey(s),
                                        (ps, ps, CT), jnp.float32))(seeds_b)
        return dpm_solver_2m(fn, noise_b, schedule, grid,
                             Parameterization.EPS)

    @jax.jit
    def predict_f16_out(cond_b, seeds_b):
        return predict_device_noise.__wrapped__(
            cond_b, seeds_b).astype(jnp.float16)

    n_tiles = len(tile_coords(H, W, ps, args.stride))

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

    for label, predict, kw in (
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
    ):
        best, out = timed(predict, **kw)
        print(json.dumps({
            "mode": label, "scene": f"{H}x{W}", "tiles": n_tiles,
            "batch": args.batch, "sampler": "dpm2m-5 int8",
            "scene_seconds": round(best, 3),
            "tiles_per_s": round(n_tiles / best, 2),
            "mpx_per_s": round(H * W / best / 1e6, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
