"""End-to-end int8-vs-bf16 benchmark: full 50-step DDIM on UNetSmall-96.

Times the fused sampler with the bf16 model and the quantized model
(models/quant.py), and — when given patches+ckpt — reports the MAE
delta so the speedup is tied to a quality cost.

Usage:
    python tools/bench_int8.py [--batch 64] [--ckpt soak.msgpack --patches D]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--patches", default=None)
    ap.add_argument("--quant_up", action="store_true",
                    help="also run the 2x2 transposed convs in int8")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from s1s2.core import Schedule
    from s1s2.core.parametrize import q_sample
    from s1s2.models import UNetSmall
    from s1s2.models.quant import make_quant_denoise_fn, quantize_unet
    from s1s2.sampling import ddim_anchored, make_denoise_fn

    B, H, W, CC, CT = args.batch, 256, 256, 4, 4
    model = UNetSmall(out_ch=CT, base_ch=96, compute_dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, CC + CT), jnp.float32),
        jnp.zeros((1,), jnp.int32))
    params = variables["params"]
    if args.ckpt:
        from s1s2.train.checkpoint import load_model

        params = load_model(params, args.ckpt)
        variables = {"params": params}

    schedule = Schedule.cosine(1000)
    if args.patches:
        from s1s2.data.dataset import NpzPatchDataset

        ds = NpzPatchDataset(args.patches)
        items = [ds[i] for i in range(min(len(ds), B))]
        cond = jnp.asarray(np.stack([d["cond"] for d in items]))
        gt = jnp.asarray(np.stack([d["target"] for d in items]))
        while cond.shape[0] < B:  # tile up to the bench batch
            cond = jnp.concatenate([cond, cond])[:B]
            gt = jnp.concatenate([gt, gt])[:B]
    else:
        cond = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, CC))
        gt = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, CT))

    # calibration: x_t at a spread of sampler timesteps (the tensors the
    # net actually sees during DDIM)
    ab = schedule.alpha_bar_np()
    calib = []
    key = jax.random.PRNGKey(3)
    for tval in (999, 600, 200, 50, 5):
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, gt.shape)
        x_t = q_sample(gt, noise, float(np.sqrt(ab[tval])),
                       float(np.sqrt(1.0 - ab[tval])))
        calib.append((jnp.concatenate([x_t, cond], -1)[: min(8, B)],
                      jnp.full((min(8, B),), tval, jnp.int32)))
    t0 = time.perf_counter()
    qp = quantize_unet(params, calib, quant_up=args.quant_up)
    print(f"quantize_unet: {time.perf_counter() - t0:.1f}s "
          f"({len(qp.act_scale)} conv scales)", flush=True)

    def bench(name, build_fn):
        @jax.jit
        def run(cond, gt, key):
            fn = build_fn(cond)
            return ddim_anchored(fn, gt, key, schedule, 999, args.steps)

        run(cond, gt, jax.random.PRNGKey(9)).block_until_ready()
        t0 = time.perf_counter()
        out = None
        for i in range(args.iters):
            out = run(cond, gt, jax.random.PRNGKey(10 + i))
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / args.iters
        pps = B / dt
        print(json.dumps({"path": name, "patches_per_s": round(pps, 2)}),
              flush=True)
        return out, pps

    out_bf16, pps_bf = bench("bf16", lambda c: make_denoise_fn(
        model.apply, variables, c))
    out_int8, pps_i8 = bench("int8", lambda c: make_quant_denoise_fn(qp, c))

    rep = {"speedup": round(pps_i8 / pps_bf, 3)}
    if args.patches:
        m = np.ones(gt.shape[:3] + (1,), np.float32)
        for name, out in (("bf16", out_bf16), ("int8", out_int8)):
            rep[f"mae_{name}"] = round(float(
                np.abs((np.asarray(out) - np.asarray(gt)) * m).mean()), 5)
    else:
        d = np.abs(np.asarray(out_int8) - np.asarray(out_bf16))
        rep["int8_vs_bf16_out_maxabs"] = round(float(d.max()), 5)
        rep["int8_vs_bf16_out_mae"] = round(float(d.mean()), 6)
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
