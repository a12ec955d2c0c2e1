"""Training losses (pure jnp, NHWC).

One implementation of the per-channel pixel-weighted MSE replaces the
reference's two copies (`Train_Orignal.py:154-189`,
`Train_v_Prediction.py:162-185`). Computed in float32 even when the model
forward ran bf16 — mirroring the reference where the loss sits inside
autocast but reduces over f32-upcast values.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def masked_mse_per_channel(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    band_weights: Optional[jnp.ndarray] = None,
    mask_as_weights: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted per-channel MSE → (scalar loss, per-channel losses (C,)).

    * mask is binarized (>0) unless ``mask_as_weights``, in which case the
      binarized mask is normalized by its clamped mean (the v-trainer builds
      w from the binarized mask before normalizing, `Train_v_Prediction.py:162-172`).
    * denominator = Σw clamped to 1e-6, shared by every channel
      (`Train_Orignal.py:178`).
    * optional per-channel band weights (`Train_Orignal.py:182-184`).
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    B, H, W, C = pred.shape

    if mask is None:
        w = jnp.ones((B, H, W, 1), jnp.float32)
    else:
        if mask.ndim == 3:
            mask = mask[..., None]
        w = (mask > 0).astype(jnp.float32)
    if mask_as_weights:
        w = w / jnp.clip(w.mean(), 1e-6, None)

    se = (pred - target) ** 2 * w
    denom = jnp.clip(w.sum(), 1e-6, None)
    ch_losses = se.sum(axis=(0, 1, 2)) / denom

    if band_weights is not None:
        bw = jnp.asarray(band_weights, jnp.float32).reshape(C)
        total = (ch_losses * bw).sum() / jnp.clip(bw.sum(), 1e-6, None)
    else:
        total = ch_losses.mean()
    return total, ch_losses
