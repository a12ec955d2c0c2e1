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


def _cubic_weights(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic-convolution kernel with torch's a=-0.75 (Keys 1981; the value
    PyTorch hard-codes for ``mode='bicubic'`` — jax.image uses a=-0.5,
    which is why this module carries its own resize)."""
    ax = np.abs(x)
    return np.where(
        ax <= 1.0,
        (a + 2.0) * ax**3 - (a + 3.0) * ax**2 + 1.0,
        np.where(ax < 2.0, a * (ax**3 - 5.0 * ax**2 + 8.0 * ax - 4.0), 0.0),
    )


def _bicubic_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) interpolation matrix reproducing torch
    ``F.interpolate(mode='bicubic', align_corners=False)``: source
    coordinate (d+0.5)·(n_in/n_out)−0.5, 4 clamped taps (replicate
    border), no antialias widening on downscale."""
    src = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
    i0 = np.floor(src).astype(np.int64)
    mat = np.zeros((n_out, n_in), np.float32)
    for k in range(-1, 3):
        idx = np.clip(i0 + k, 0, n_in - 1)
        w = _cubic_weights(src - (i0 + k)).astype(np.float32)
        np.add.at(mat, (np.arange(n_out), idx), w)
    return mat


def _bicubic_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Separable torch-exact bicubic resize of NHWC ``x``."""
    mh = jnp.asarray(_bicubic_matrix(x.shape[1], out_h))
    mw = jnp.asarray(_bicubic_matrix(x.shape[2], out_w))
    x = jnp.einsum("hj,bjwc->bhwc", mh, x, precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("wk,bhkc->bhwc", mw, x,
                      precision=jax.lax.Precision.HIGHEST)


def baseline_bicubic(x_gt: jnp.ndarray, scale_factor: int = 4) -> jnp.ndarray:
    """SISR sanity baseline: bicubic down ×scale then back up, on GT itself
    (`Evaluation_Pure_Generation.py:348-354`). Torch-exact kernel (a=-0.75,
    half-pixel mapping, clamped taps) so the table is a certified parity
    surface (tools/ref_crossval.py baselines section)."""
    B, H, W, C = x_gt.shape
    lr = _bicubic_resize(x_gt, H // scale_factor, W // scale_factor)
    sr = _bicubic_resize(lr, H, W)
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
