"""Pallas TPU kernel: fused DDIM step update.

One VMEM pass computes

    x0̂  = (x_t − √(1−ᾱ_cur)·ε) / √(ᾱ_cur + 1e-8)
    x'  = √ᾱ_next·x0̂ + √(1−ᾱ_next)·ε

i.e. the elementwise tail of each DDIM iteration
(`Evaluation/DDIM_Multi-step.py:132-133`). XLA fuses this chain well
already — the kernel exists as the ops-layer exemplar and is benchmarked
against the XLA fusion in tests/bench; the sampler uses whichever wins
(currently XLA — see s1s2/sampling/samplers.py which keeps the plain jnp
form inside lax.scan).

Scalars arrive via SMEM (scalar-prefetch style (1,1) blocks); tensors are
processed in lane-aligned VMEM tiles over a flattened view.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(coef_ref, x_ref, eps_ref, x0_ref, xn_ref):
    s1mab_cur = coef_ref[0, 0]
    inv_sab_cur = coef_ref[0, 1]
    sab_next = coef_ref[0, 2]
    s1mab_next = coef_ref[0, 3]
    x = x_ref[:]
    e = eps_ref[:]
    x0 = (x - s1mab_cur * e) * inv_sab_cur
    x0_ref[:] = x0
    xn_ref[:] = sab_next * x0 + s1mab_next * e


def fused_ddim_update(x_t: jnp.ndarray, eps: jnp.ndarray,
                      a_cur: jnp.ndarray, a_next: jnp.ndarray):
    """→ (x0_hat, x_next); a_cur/a_next are scalar ᾱ values."""
    shape = x_t.shape
    n = x_t.size
    lanes = 128
    rows = n // lanes
    assert rows * lanes == n, "size must be lane-aligned (pad upstream)"
    xf = x_t.reshape(rows, lanes).astype(jnp.float32)
    ef = eps.reshape(rows, lanes).astype(jnp.float32)
    coef = jnp.stack([
        jnp.sqrt(1.0 - a_cur),
        1.0 / jnp.sqrt(a_cur + 1e-8),
        jnp.sqrt(a_next),
        jnp.sqrt(1.0 - a_next),
    ]).reshape(1, 4).astype(jnp.float32)

    x0, xn = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
            jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((1, 4), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )(coef, xf, ef)
    return x0.reshape(shape), xn.reshape(shape)
