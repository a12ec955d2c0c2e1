"""Training-step throughput on the real chip: patches/sec for the fused
train step (fwd+bwd+AdamW+EMA) at 256², base_ch=96, bf16.

Usage: python tools/bench_train.py [batch_sizes...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from s1s2.core import Schedule
from s1s2.models import UNetSmall
from s1s2.train import TrainConfig, create_train_state, make_train_step


def bench(B, remat=False, iters=10):
    H = W = 256
    model = UNetSmall(out_ch=4, base_ch=96, remat=remat)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 8), jnp.float32),
        jnp.zeros((1,), jnp.int32),
    )
    cfg = TrainConfig(T=1000, pred_param="v")
    state = create_train_state(variables["params"], cfg)
    step = jax.jit(make_train_step(model.apply, Schedule.cosine(1000), cfg),
                   donate_argnums=(0,))
    batch = (
        jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 4)),
        jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, 4)),
        jnp.ones((B, H, W)),
    )
    key = jax.random.PRNGKey(3)
    state, m = step(state, batch, key)  # compile
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch, key)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    return B * iters / dt


def main():
    bs = [int(x) for x in sys.argv[1:]] or [4, 8, 16, 32]
    for B in bs:
        for remat in (False, True):
            try:
                pps = bench(B, remat)
                print(json.dumps({"B": B, "remat": remat,
                                  "train_patches_per_s": round(pps, 2)}), flush=True)
            except Exception as e:
                print(json.dumps({"B": B, "remat": remat, "error": str(e)[:120]}),
                      flush=True)


if __name__ == "__main__":
    main()
