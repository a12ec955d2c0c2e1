"""UNetSmall — the conditional DDPM denoiser, designed TPU-first.

Capability parity with the reference architecture (defined 13× over the
reference tree; canonical copy `Train_Orignal.py:94-148`):

* 3-level encoder/decoder, blocks = (Conv3×3 → ReLU) ×2
* 2×2 max-pool downsampling, 2×2 stride-2 transposed-conv upsampling
* skip concatenations ordered [decoder, encoder] (reference cat order)
* the timestep enters as ONE extra channel carrying the **raw integer t**
  broadcast over H×W — the reference warns "Do NOT normalize"
  (`Evaluation/Limitation_Test.py:95-96`); we reproduce that contract so
  converted .pth checkpoints are drop-in.
* output head is a 1×1 conv; channels are base·(1,2,4,8) = 96/192/384/768
  at the default base_ch=96 (`Train_Orignal.py:350`), ≈17M params.

TPU-first design decisions (this is where we diverge from the torch code):

* **NHWC layout** end-to-end — the native layout for TPU convolutions; the
  channel axis lands on the 128-wide lane dimension of the MXU/VPU.
* **bf16 compute / f32 params** via ``compute_dtype``: activations and conv
  FLOPs run in bfloat16 on the MXU, parameters and the loss stay float32.
  ``compute_dtype=float32`` gives a bit-strict parity mode for checkpoint
  validation (the t-channel value 999 is exact in f32/f16 but rounds in
  bf16; see models/convert.py).
* Static shapes only — the module is shape-polymorphic at trace time but
  every jit instance compiles one static (B, H, W) so XLA tiles convs onto
  the MXU without dynamic padding.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class _UpPS(nn.Module):
    """2×2 stride-2 upsample via matmul + pixel shuffle (s1s2.ops). Param
    tree is identical to nn.ConvTranspose (kernel (2,2,Ci,Co), bias) so
    checkpoints are interchangeable between up_impl settings."""

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from s1s2.ops.pixel_shuffle import ps_conv_transpose_2x2

        ci = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(), in_axis=(0, 1, 2)),
            (2, 2, ci, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return ps_conv_transpose_2x2(x.astype(self.dtype), kernel.astype(self.dtype),
                                     bias)


class _DoubleConv(nn.Module):
    """(Conv3×3 → ReLU) ×2 — reference `conv_block`, `Train_Orignal.py:102-108`."""

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(x)
        return nn.relu(x)


class UNetSmall(nn.Module):
    """Conditional denoiser: ``(x_t ‖ cond ‖ t·𝟙) → prediction`` (ε or v).

    Args at call time:
      x_and_cond: (B, H, W, C_xt + C_cond) NHWC — x_t concatenated with the
                  conditioning channels along the LAST axis, in that order
                  (reference concat order `Train_Orignal.py:290`).
      t_idx:      (B,) integer timesteps; injected raw as an extra channel
                  (`Train_Orignal.py:126-129`).
    """

    out_ch: int
    base_ch: int = 96
    compute_dtype: Any = jnp.bfloat16
    # 'convt' (XLA conv_transpose) | 'ps' (matmul+pixel-shuffle, s1s2.ops).
    # Measured on TPU v5e @256², 50-step DDIM: convt 9.8 patches/s vs ps 9.5
    # (tools/bench_variants.py) — XLA's transposed-conv lowering wins; 'ps'
    # is kept as the benchmarked alternative.
    up_impl: str = "convt"
    # rematerialize encoder/decoder blocks in the backward pass (trade ~30%
    # extra FLOPs for activation memory → larger train batches at 256²)
    remat: bool = False
    # Space-to-depth stem factor s (1 = off, exact reference topology).
    # s>1 folds each s×s input block onto the channel axis, runs the WHOLE
    # UNet at (H/s, W/s), and restores full resolution with a sub-pixel
    # (out_ch·s² 1×1 conv → depth-to-space) head. At matched FLOPs
    # (base_ch·s vs base_ch) this trades the memory-/lane-bound
    # full-resolution stages for MXU-friendly wide-channel ones — the
    # narrow-width distilled students' throughput lever (BENCH_NOTES.md
    # "s2d students"). Param tree keeps the same layer names; only inc /
    # outc shapes change, so quant/convert plumbing is shared.
    stem_s2d: int = 1

    def _block(self, features, name):
        cls = nn.remat(_DoubleConv) if self.remat else _DoubleConv
        return cls(features, self.compute_dtype, name=name)

    def _up(self, features, name):
        if self.up_impl == "ps":
            return _UpPS(features, self.compute_dtype, name=name)
        return nn.ConvTranspose(features, (2, 2), strides=(2, 2), padding="VALID",
                                dtype=self.compute_dtype, param_dtype=jnp.float32,
                                name=name)

    @nn.compact
    def __call__(self, x_and_cond: jnp.ndarray, t_idx: jnp.ndarray) -> jnp.ndarray:
        b = self.base_ch
        dt = self.compute_dtype
        s = self.stem_s2d
        B, H, W, _ = x_and_cond.shape

        xf = x_and_cond.astype(jnp.float32)
        if s > 1:
            from s1s2.ops.pixel_shuffle import space_to_depth

            xf = space_to_depth(xf, s)  # (B, H/s, W/s, C·s²)

        # Raw integer timestep as ONE constant channel (at body resolution).
        # Cast to f32 FIRST so the integer is exact, then to compute dtype
        # (matches reference .float()).
        Hb, Wb = xf.shape[1:3]
        t_map = jnp.broadcast_to(
            t_idx.astype(jnp.float32).reshape(B, 1, 1, 1), (B, Hb, Wb, 1)
        )
        x = jnp.concatenate([xf, t_map], axis=-1)
        x = x.astype(dt)

        # Encoder — `inc`/`down1..3` (`Train_Orignal.py:110-113`)
        e1 = nn.relu(
            nn.Conv(b, (3, 3), padding="SAME", dtype=dt,
                    param_dtype=jnp.float32, name="inc")(x)
        )
        e2 = nn.max_pool(self._block(b * 2, "down1")(e1), (2, 2), (2, 2))
        e3 = nn.max_pool(self._block(b * 4, "down2")(e2), (2, 2), (2, 2))
        e4 = nn.max_pool(self._block(b * 8, "down3")(e3), (2, 2), (2, 2))

        # Decoder — transposed conv then double conv over [up ‖ skip]
        # (`Train_Orignal.py:115-124`, forward `:136-147`)
        u3 = self._up(b * 4, "up3")(e4)
        d3 = self._block(b * 4, "conv3")(
            jnp.concatenate([u3, e3], axis=-1)
        )
        u2 = self._up(b * 2, "up2")(d3)
        d2 = self._block(b * 2, "conv2")(
            jnp.concatenate([u2, e2], axis=-1)
        )
        u1 = self._up(b, "up1")(d2)
        d1 = self._block(b, "conv1")(
            jnp.concatenate([u1, e1], axis=-1)
        )

        # 1×1 output head — prediction leaves in float32 for the loss/sampler.
        # With an s2d stem the head is sub-pixel: out_ch·s² channels at body
        # resolution, then depth-to-space back to (H, W, out_ch).
        out = nn.Conv(self.out_ch * s * s, (1, 1), dtype=dt,
                      param_dtype=jnp.float32, name="outc")(d1)
        if s > 1:
            from s1s2.ops.pixel_shuffle import depth_to_space

            out = depth_to_space(out, s)
        return out.astype(jnp.float32)


def count_params(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
