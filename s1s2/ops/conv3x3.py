"""Pallas TPU kernel: fused 3×3 SAME conv + bias + ReLU.

The UNet's hot op, written as the classic TPU formulation: a 3×3 conv is
**nine shifted (H·W, Cin) × (Cin, Cout) matmuls** accumulated in f32 on the
MXU, fused with the bias add and ReLU in VMEM — no im2col materialization.

Blocking: grid over (batch, row-tiles). Each program DMAs its row tile plus
a 1-row halo from the padded input (kept whole in HBM/ANY; halos overlap so
they cannot be expressed as a BlockSpec partition), runs the 9 matmuls out
of VMEM scratch, and writes its (TH, W, Cout) tile.

Halo-DMA pattern (r2): the padded input is pre-flattened to a 3-D
(B·(H+2), W+2, Cin) ref and each program slices rows
[bi·(H+2) + i·TH, …+TH+2) — a dynamic FIRST-axis slice of a 3-D ref. The
round-1 formulation (dynamic 2nd-axis slice of a 4-D ref) CRASHED this
environment's axon remote-compile TPU worker; the 3-D form fails cleanly
instead (HTTP 500 from the compile helper) — an improvement, but still no
on-chip compile. The r2 bisect (/tmp-level probes, results recorded in
BENCH_NOTES.md) isolated the incompatibility: on this remote-compile stack
a kernel may EITHER do manual halo DMA (DMA-only kernels compile and run —
tools/probe_pallas_int8.py dma) OR matmul from VMEM blocks (plain-BlockSpec
3-D dot_general compiles and runs), but any kernel combining manual DMA
with an MXU dot fails to compile, in every formulation tried (ref-window
reshape, 3-D dot_general, copy-to-contiguous-scratch, value-level slices).
Since XLA's conv runs the UNet at 86% MFU and the int8 path at 92% of int8
peak (BENCH_NOTES.md), a split two-pass Pallas conv (DMA pass + compute
pass) would pay an extra HBM roundtrip and lose; the manual-DMA kernel
therefore remains the interpreter-validated ops-layer reference
(tests/test_ops.py::TestPallasConv3x3).

r3 breakthrough — :func:`conv3x3_relu_bs`: reformulating the halo as TWO
strip-shifted BlockSpec views of the same padded input (strip i = body,
strip i+1 sliced for the 2 halo rows) removes the manual DMA entirely,
landing in the "plain BlockSpec + dot" cell of the capability matrix —
and it COMPILES AND RUNS on this runtime's real TPU: the first Pallas
kernel with MXU FLOPs to execute here. Measured vs XLA's conv at the
UNet's four level shapes (tools/bench_pallas_conv.py, 20-step varying-
carry scan chains): 42.7→125.9 TFLOP/s bf16, i.e. 62–91% of XLA
(XLA 69.2→139.0) — XLA keeps the production path; the gap is the 2×
input fetch plus XLA's better-tuned conv schedule. Numbers in
BENCH_NOTES.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xp_hbm, w_ref, b_ref, out_ref, scratch, sem, *, TH, W, Cin, Cout,
            Hp, compute_dtype):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    # DMA this row-tile + halo: padded-row block [bi*Hp + i*TH, ...+TH+2) of
    # the flattened (B*Hp, W+2, Cin) input. First-axis dynamic slice of a
    # 3-D ref — the DMA form this TPU runtime accepts (see module docstring).
    dma = pltpu.make_async_copy(
        xp_hbm.at[pl.ds(bi * Hp + i * TH, TH + 2)], scratch, sem
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


def _kernel_bs(x0_ref, x1_ref, w_ref, b_ref, out_ref, *, R, W, Cin, Cout,
               compute_dtype, apply_relu):
    # Strip i plus the top 2 halo rows of strip i+1 — all delivered by the
    # BlockSpec pipeline, no manual DMA (the pattern this runtime compiles).
    x0 = x0_ref[0]                      # (R, W+2, Cin)
    x1 = jax.lax.slice(x1_ref[0], (0, 0, 0), (2, W + 2, Cin))
    xcat = jnp.concatenate([x0, x1], axis=0)  # (R+2, W+2, Cin)
    acc = jnp.zeros((R, W, Cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            win = jax.lax.slice(
                xcat, (dy, dx, 0), (dy + R, dx + W, Cin)).astype(compute_dtype)
            acc = acc + jax.lax.dot_general(
                win, w_ref[dy, dx].astype(compute_dtype),
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    out = acc + b_ref[:].astype(jnp.float32)
    if apply_relu:
        out = jnp.maximum(out, 0.0)
    out_ref[0] = out.astype(out_ref.dtype)


def conv3x3_relu_bs(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                    tile_rows: int = 32, apply_relu: bool = True) -> jnp.ndarray:
    """BlockSpec-only 3×3 SAME conv + bias (+ ReLU) — no manual DMA.

    Same math as :func:`conv3x3_relu`, reformulated for the axon
    remote-compile runtime where manual DMA + MXU dot in one kernel fails
    (module docstring): the halo is obtained by passing the row-padded
    input TWICE with strip-shifted BlockSpec index maps (strip i and strip
    i+1), concatenating in VMEM, and running the nine shifted
    (R,W,Cin)×(Cin,Cout) `dot_general`s — exactly the plain-BlockSpec+dot
    pattern the r2 bisect proved compiles and runs here. Costs a 2× input
    fetch (strips are read as both "body" and "halo source"), which is
    immaterial for these MXU-bound shapes.

    x (B,H,W,Cin), w (3,3,Cin,Cout) [HWIO], b (Cout,). H % tile_rows == 0.
    """
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    R = min(tile_rows, H)
    assert H % R == 0, (H, R)
    n = H // R
    compute_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32

    # Rows padded to (n+1)*R so the i+1 halo strip exists for the last i.
    xp = jnp.pad(x, ((0, 0), (1, (n + 1) * R - H - 1), (1, 1), (0, 0)))

    kernel = functools.partial(
        _kernel_bs, R=R, W=W, Cin=Cin, Cout=Cout,
        compute_dtype=compute_dtype, apply_relu=apply_relu)
    return pl.pallas_call(
        kernel,
        grid=(B, n),
        in_specs=[
            pl.BlockSpec((1, R, W + 2, Cin), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((1, R, W + 2, Cin), lambda bi, i: (bi, i + 1, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # weights, whole
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias
        ],
        out_specs=pl.BlockSpec((1, R, W, Cout), lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
    )(xp, xp, w, b)


def conv3x3_relu(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                 tile_rows: int = 16) -> jnp.ndarray:
    """x (B,H,W,Cin), w (3,3,Cin,Cout) [HWIO], b (Cout,) → relu(conv(x)+b),
    SAME padding, stride 1. H must be divisible by tile_rows."""
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    TH = min(tile_rows, H)
    assert H % TH == 0, (H, TH)
    compute_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32

    Hp = H + 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xp = xp.reshape(B * Hp, W + 2, Cin)  # batch folded into rows for the DMA

    kernel = functools.partial(
        _kernel, TH=TH, W=W, Cin=Cin, Cout=Cout, Hp=Hp,
        compute_dtype=compute_dtype
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
