"""2×2 stride-2 transposed convolution as ONE matmul + pixel shuffle.

For the UNet's non-overlapping upsample (kernel 2×2 == stride), each input
pixel independently produces a 2×2 output block:

    out[2i+di, 2j+dj, o] = Σ_c x[i,j,c] · K[di,dj,c,o]

so the whole op is a single (B·H·W, Cin) × (Cin, 4·Cout) matmul — a clean
MXU shape — followed by a depth→space reshape, instead of XLA's generic
transposed-conv lowering (input dilation + padded conv). Used by
``UNetSmall(up_impl="ps")``; parity with flax nn.ConvTranspose (and hence
the converted PyTorch ``up{k}`` weights) is covered in tests/test_ops.py.

Kernel layout matches flax ConvTranspose storage (kH, kW, Cin, Cout) —
remember that layout holds the SPATIALLY FLIPPED taps relative to the
adjoint/PyTorch view (s1s2/models/convert.py), so the block offset (di, dj)
reads K[1-di, 1-dj].
"""

from __future__ import annotations

import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """(B,H,W,C) → (B,H/s,W/s,s·s·C), block-major (di,dj,c) channel order.

    TPU rationale: folds an s×s spatial block onto the channel (lane) axis,
    so a narrow-channel full-resolution tensor becomes a wider reduced-
    resolution one — better MXU lane utilization for the convs that follow
    and s² fewer VPU positions for their elementwise tails. Inverse of
    ``depth_to_space`` (round-trip tested in tests/test_ops.py)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // s, s, W // s, s, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // s, W // s, s * s * C)


def depth_to_space(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """(B,H,W,s·s·C) → (B,s·H,s·W,C) — inverse of ``space_to_depth``
    (same block-major (di,dj,c) channel order)."""
    B, H, W, K = x.shape
    C = K // (s * s)
    x = x.reshape(B, H, W, s, s, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, s * H, s * W, C)


def ps_conv_transpose_2x2(x: jnp.ndarray, kernel: jnp.ndarray,
                          bias: jnp.ndarray) -> jnp.ndarray:
    """x (B,H,W,Ci), kernel (2,2,Ci,Co) [flax ConvTranspose layout],
    bias (Co,) → (B,2H,2W,Co)."""
    B, H, W, Ci = x.shape
    Co = kernel.shape[-1]
    # block offsets (di,dj) ← flipped taps; order rows as (di, dj) blocks
    k = kernel[::-1, ::-1]  # (di, dj, Ci, Co)
    k_flat = k.transpose(2, 0, 1, 3).reshape(Ci, 4 * Co)
    y = jnp.einsum("bhwc,ck->bhwk", x, k_flat.astype(x.dtype))
    y = y.reshape(B, H, W, 2, 2, Co)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, Co)
    return y + bias.astype(y.dtype)
