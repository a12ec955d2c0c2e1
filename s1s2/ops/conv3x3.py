"""Pallas TPU kernel: fused 3×3 SAME conv + bias + ReLU.

The UNet's hot op, written as the classic TPU formulation: a 3×3 conv is
**nine shifted (H·W, Cin) × (Cin, Cout) matmuls** accumulated in f32 on the
MXU, fused with the bias add and ReLU in VMEM — no im2col materialization.

Blocking: grid over (batch, row-tiles). Each program DMAs its row tile plus
a 1-row halo from the padded input (kept whole in HBM/ANY; halos overlap so
they cannot be expressed as a BlockSpec partition), runs the 9 matmuls out
of VMEM scratch, and writes its (TH, W, Cout) tile.

Status: correctness-validated in Pallas interpreter mode
(tests/test_ops.py::TestPallasConv3x3). On this environment's axon
remote-compile TPU path the multi-dim halo DMA pattern crashes the TPU
worker (tools/bench_conv.py records the failure), and XLA's conv already
runs the UNet at the MXU roofline (BENCH_NOTES.md), so the kernel is kept
as the ops-layer reference for halo'd-DMA kernels rather than wired into
the model. Re-evaluate on a standard TPU runtime.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xp_hbm, w_ref, b_ref, out_ref, scratch, sem, *, TH, W, Cin, Cout,
            compute_dtype):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    # DMA this row-tile + halo: rows [i*TH, i*TH + TH+2) of the padded image.
    # xp stays un-blocked in ANY/HBM (halo windows overlap, which BlockSpec
    # partitioning cannot express), so the batch is indexed here.
    dma = pltpu.make_async_copy(
        xp_hbm.at[bi, pl.ds(i * TH, TH + 2), :, :], scratch, sem
    )
    dma.start()
    dma.wait()

    acc = jnp.zeros((TH * W, Cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            # (TH, W, Cin) window shifted by (dy, dx) over the padded tile
            win = scratch[pl.ds(dy, TH), pl.ds(dx, W), :]
            lhs = win.reshape(TH * W, Cin).astype(compute_dtype)
            rhs = w_ref[dy, dx, :, :].astype(compute_dtype)
            acc += jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)
    out = jnp.maximum(acc + b_ref[:].astype(jnp.float32), 0.0)
    out_ref[0] = out.reshape(TH, W, Cout).astype(out_ref.dtype)


def conv3x3_relu(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                 tile_rows: int = 16) -> jnp.ndarray:
    """x (B,H,W,Cin), w (3,3,Cin,Cout) [HWIO], b (Cout,) → relu(conv(x)+b),
    SAME padding, stride 1. H must be divisible by tile_rows."""
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    TH = min(tile_rows, H)
    assert H % TH == 0, (H, TH)
    compute_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    kernel = functools.partial(
        _kernel, TH=TH, W=W, Cin=Cin, Cout=Cout, compute_dtype=compute_dtype
    )
    return pl.pallas_call(
        kernel,
        grid=(B, H // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # whole padded input
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights, whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        ],
        out_specs=pl.BlockSpec((1, TH, W, Cout), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TH + 2, W + 2, Cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, w, b)
