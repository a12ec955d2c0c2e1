"""Classical baselines that bound what the diffusion model must beat
(`Evaluation_Updated/Evaluation_Pure_Generation.py:347-439`; SURVEY.md §2
item 31 — note the reference's ``baseline_linear_from_s1`` is dead code and
is intentionally not reproduced).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def baseline_bicubic(x_gt: jnp.ndarray, scale_factor: int = 4) -> jnp.ndarray:
    """SISR sanity baseline: bicubic down ×scale then back up, on GT itself
    (`Evaluation_Pure_Generation.py:348-354`). Uses jax.image cubic resize
    (kernel differs slightly from torch's bicubic; it is a baseline, not a
    parity surface)."""
    B, H, W, C = x_gt.shape
    lr = jax.image.resize(
        x_gt, (B, H // scale_factor, W // scale_factor, C), method="cubic"
    )
    sr = jax.image.resize(lr, (B, H, W, C), method="cubic")
    return jnp.clip(sr, 0.0, 1.0)


def baseline_linear_fit_predict(
    cond: np.ndarray,
    gt: np.ndarray,
    mask: Optional[np.ndarray],
    subsample_max: int = 200_000,
    ridge: float = 1e-4,
    seed: int = 0,
) -> np.ndarray:
    """Per-band ridge regression S1→S2 fit on the SAME image (optimistic
    diagnostic baseline, `Evaluation_Pure_Generation.py:394-439`).

    cond (H,W,Cc), gt (H,W,Ct), mask (H,W)|None → prediction (H,W,Ct),
    zeros outside the mask, clipped to [0,1]. Normal equations solved with
    jnp.linalg.solve (the reference inverts explicitly)."""
    H, W, Cc = cond.shape
    Ct = gt.shape[-1]
    m = (
        (mask > 0).reshape(-1)
        if mask is not None
        else np.ones(H * W, bool)
    )
    X = cond.reshape(-1, Cc)[m]
    Xb = np.concatenate([X, np.ones((X.shape[0], 1), np.float32)], axis=1)
    ys = gt.reshape(-1, Ct)[m]

    if Xb.shape[0] > subsample_max:
        idx = np.random.default_rng(seed).choice(
            Xb.shape[0], subsample_max, replace=False
        )
        Xb_fit, ys_fit = Xb[idx], ys[idx]
    else:
        Xb_fit, ys_fit = Xb, ys

    XtX = jnp.asarray(Xb_fit.T @ Xb_fit) + ridge * jnp.eye(Cc + 1)
    Xty = jnp.asarray(Xb_fit.T @ ys_fit)  # (Cc+1, Ct)
    Wmat = np.asarray(jnp.linalg.solve(XtX, Xty))  # all bands in one solve

    yhat = (Xb @ Wmat).astype(np.float32)  # (Nmask, Ct)
    pred = np.zeros((H * W, Ct), np.float32)
    pred[m] = yhat
    return np.clip(pred.reshape(H, W, Ct), 0.0, 1.0)
