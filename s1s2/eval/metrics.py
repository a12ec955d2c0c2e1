"""Masked image-quality metrics (pure jnp, NHWC, jit-friendly).

Reproduces BOTH masked-metric normalization conventions the reference mixes
(SURVEY.md §7 "hard parts"):

* **global-sum** — Σw·err / (Σw · C), ε=1e-8 in the denominator
  (`Evaluation/DDIM_Multi-step.py:72-90`); used by most eval scripts.
* **per-sample-mean** — mean over batch of per-sample numerators divided by
  mean of per-sample denominators (`Evaluation/Onestep_v_Prediction.py:74-92`).

Plus: PSNR with the 99.0 cap (`Evaluation/DDIM_Multi-step.py:92-95`), the
global (non-windowed) SSIM surrogate (`:97-101`), SAM
(`Evaluation/Comparison_Original.py:235-249`), ERGAS (`:251-261`), the
streaming channelwise accumulators (`Evaluation/Limitation_Test.py:119-159`)
and ε/v prediction diagnostics (`Evaluation/DDIM_Multi-step.py:139-153`,
`Evaluation/DDIM_Multi-step_v_Prediction.py:181-208`).

All functions return jnp scalars/arrays; call-sites wrap with float() after
device sync. Tensors are (B, H, W, C); masks are (B, H, W) or (B, H, W, 1),
binarized with (mask > 0) exactly like the reference.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp


def _weights(pred: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """(B, H, W, 1) binary weights from an optional mask."""
    B, H, W, _ = pred.shape
    if mask is None:
        return jnp.ones((B, H, W, 1), jnp.float32)
    if mask.ndim == 3:
        mask = mask[..., None]
    return (mask > 0).astype(jnp.float32)


# -- global-sum convention ---------------------------------------------------


def masked_mae(pred, tgt, mask=None) -> jnp.ndarray:
    w = _weights(pred, mask)
    num = (w * jnp.abs(pred - tgt)).sum()
    den = w.sum() * pred.shape[-1]
    return num / (den + 1e-8)


def masked_mse(pred, tgt, mask=None) -> jnp.ndarray:
    w = _weights(pred, mask)
    num = (w * (pred - tgt) ** 2).sum()
    den = w.sum() * pred.shape[-1]
    return num / (den + 1e-8)


# -- per-sample-mean convention ----------------------------------------------


def masked_mae_per_sample(pred, tgt, mask=None) -> jnp.ndarray:
    w = _weights(pred, mask)
    num = (w * jnp.abs(pred - tgt)).sum(axis=(1, 2, 3)).mean()
    den = (jnp.clip(w.sum(axis=(1, 2, 3)), 1e-8, None) * pred.shape[-1]).mean()
    return num / den


def masked_mse_per_sample(pred, tgt, mask=None) -> jnp.ndarray:
    w = _weights(pred, mask)
    num = (w * (pred - tgt) ** 2).sum(axis=(1, 2, 3)).mean()
    den = (jnp.clip(w.sum(axis=(1, 2, 3)), 1e-8, None) * pred.shape[-1]).mean()
    return num / den


def per_file_mae_mse(pred, tgt, mask=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample (B,) MAE/MSE in the global-sum convention — equals the
    reference's per-FILE numbers (it evaluates each file at batch=1) while we
    batch many files per forward."""
    w = _weights(pred, mask)
    den = w.sum(axis=(1, 2, 3)) * pred.shape[-1] + 1e-8
    mae = (w * jnp.abs(pred - tgt)).sum(axis=(1, 2, 3)) / den
    mse = (w * (pred - tgt) ** 2).sum(axis=(1, 2, 3)) / den
    return mae, mse


# -- derived scores ----------------------------------------------------------


def psnr(pred, tgt, mask=None) -> jnp.ndarray:
    """10·log10(1/MSE) with the reference's 99.0 cap for MSE ≤ 1e-12."""
    m = masked_mse(pred, tgt, mask)
    return jnp.where(m <= 1e-12, 99.0, 10.0 * jnp.log10(1.0 / jnp.maximum(m, 1e-30)))


def psnr_from_mse(mse: float) -> float:
    """Host-side PSNR used by streaming aggregation."""
    return 99.0 if mse <= 1e-12 else 10.0 * math.log10(1.0 / mse)


def ssim_simple(pred, tgt, C1: float = 0.01**2, C2: float = 0.03**2) -> jnp.ndarray:
    """Global (non-windowed) SSIM-like index over the whole tensor, with the
    reference's torch.var (unbiased) variance."""
    mu_x, mu_y = pred.mean(), tgt.mean()
    n = pred.size
    bessel = n / max(n - 1, 1)
    vx = ((pred - mu_x) ** 2).mean() * bessel
    vy = ((tgt - mu_y) ** 2).mean() * bessel
    cxy = ((pred - mu_x) * (tgt - mu_y)).mean()
    return ((2 * mu_x * mu_y + C1) * (2 * cxy + C2)) / (
        (mu_x**2 + mu_y**2 + C1) * (vx + vy + C2) + 1e-8
    )


def sam(pred, tgt, mask=None) -> jnp.ndarray:
    """Spectral Angle Mapper (radians), averaged over masked pixels."""
    w = _weights(pred, mask)[..., 0]  # (B,H,W)
    dot = (pred * tgt).sum(axis=-1)
    p_norm = jnp.clip(jnp.sqrt((pred**2).sum(axis=-1)), 1e-8, None)
    g_norm = jnp.clip(jnp.sqrt((tgt**2).sum(axis=-1)), 1e-8, None)
    cos = jnp.clip(dot / (p_norm * g_norm), -1.0, 1.0)
    angle = jnp.arccos(cos)
    return (angle * w).sum() / jnp.clip(w.sum(), 1.0, None)


def ergas(pred, tgt, mask=None, scale_ratio: float = 4.0) -> jnp.ndarray:
    """ERGAS; per-band RMSE is MASKED but the band mean is over ALL pixels
    (+1e-8), faithfully matching `Evaluation/Comparison_Original.py:251-261`."""
    C = pred.shape[-1]
    w = _weights(pred, mask)
    num = (w * (pred - tgt) ** 2).sum(axis=(0, 1, 2))
    den = w.sum() + 1e-8  # per-band masked MSE (w has one channel)
    rmse_c = jnp.sqrt(jnp.clip(num / den, 0.0, None))
    mean_c = tgt.mean(axis=(0, 1, 2)) + 1e-8
    return 100.0 * jnp.sqrt((1.0 / C) * ((rmse_c / mean_c) ** 2).sum()) * scale_ratio


# -- streaming dataset aggregation -------------------------------------------


def channelwise_error_sums(
    pred, tgt, mask=None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-channel |err| and err² sums over masked pixels + valid-pixel count
    (`Evaluation/Limitation_Test.py:119-133`). Accumulate across batches,
    finalize with aggregate_final."""
    w = _weights(pred, mask)
    abs_sum_c = (w * jnp.abs(pred - tgt)).sum(axis=(0, 1, 2))
    sq_sum_c = (w * (pred - tgt) ** 2).sum(axis=(0, 1, 2))
    return abs_sum_c, sq_sum_c, w.sum()


def aggregate_final(abs_sum_c, sq_sum_c, pix_sum, band_weights=None):
    """Finalize streaming sums → (MAE, MSE, PSNR, mae_c, mse_c, psnr_c)
    (`Evaluation/Limitation_Test.py:135-159`). Host-side numpy in/out."""
    import numpy as np

    abs_sum_c = np.asarray(abs_sum_c, np.float64)
    sq_sum_c = np.asarray(sq_sum_c, np.float64)
    denom = max(float(pix_sum), 1e-8)
    mae_c = abs_sum_c / denom
    mse_c = sq_sum_c / denom
    if band_weights is None:
        mae, mse = float(mae_c.mean()), float(mse_c.mean())
    else:
        bw = np.asarray(band_weights, np.float64)
        bw = bw / max(bw.sum(), 1e-8)
        mae, mse = float((mae_c * bw).sum()), float((mse_c * bw).sum())
    psnr_v = psnr_from_mse(mse)
    psnr_c = np.where(mse_c <= 1e-12, 99.0, 10.0 * np.log10(1.0 / np.maximum(mse_c, 1e-300)))
    return mae, mse, psnr_v, mae_c, mse_c, psnr_c


# -- prediction diagnostics ---------------------------------------------------


def _cosine(a, b) -> jnp.ndarray:
    return (a * b).sum() / (
        jnp.sqrt((a**2).sum()) * jnp.sqrt((b**2).sum()) + 1e-8
    )


def eps_diagnostics(pred_eps, true_eps) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(ε-MSE, cosine(pred, true)) — unmasked, whole-tensor
    (`Evaluation/DDIM_Multi-step.py:139-153`)."""
    return ((pred_eps - true_eps) ** 2).mean(), _cosine(pred_eps, true_eps)


def v_diagnostics(pred_v, true_v, eps_pred=None, true_eps=None):
    """(v-MSE, v-cos[, derived-ε cos])
    (`Evaluation/DDIM_Multi-step_v_Prediction.py:181-208`)."""
    v_mse = ((pred_v - true_v) ** 2).mean()
    v_cos = _cosine(pred_v, true_v)
    if eps_pred is None:
        return v_mse, v_cos
    return v_mse, v_cos, _cosine(eps_pred, true_eps)
