"""DPM-Solver++(2M) — second-order multistep ODE sampler (s1s2 EXTENSION).

Not present in the reference (which only has DDIM/ancestral DDPM); added
because it reaches a given reconstruction quality in ~2-5× fewer model
calls than DDIM, which directly multiplies the patches/sec-at-quality
throughput of the 50-step headline workload (Lu et al., arXiv:2211.01095 —
data-prediction multistep variant). Works with ε- and v-parameterized
checkpoints via the shared pred→x0 algebra.

Same TPU architecture as the other samplers: descending timestep grid,
host-precomputed per-step coefficients, one fused lax.scan.

Math (λ = log(α/σ), α=√ᾱ, σ=√(1−ᾱ); step s→t with h = λ_t − λ_s > 0):
    first step :  x_t = (σ_t/σ_s)·x_s − α_t·(e^{−h}−1)·x0(x_s)
    later steps:  D   = (1 + 1/(2r))·x0(x_s) − 1/(2r)·x0_prev,  r = h_prev/h
                  x_t = (σ_t/σ_s)·x_s − α_t·(e^{−h}−1)·D
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from s1s2.core.parametrize import Parameterization, pred_to_x0_eps
from s1s2.core.schedule import Schedule
from s1s2.sampling.samplers import DenoiseFn


def dpm_solver_2m(
    denoise_fn: DenoiseFn,
    x_init: jnp.ndarray,
    schedule: Schedule,
    grid: np.ndarray,
    param: Parameterization = Parameterization.EPS,
    clip: Tuple[float, float] = (0.0, 1.0),
) -> jnp.ndarray:
    """Solve from grid[-1] (noisiest) down grid (ascending ints incl. the
    start time); returns the final x0 prediction, clamped.

    ``x_init`` must be at the noise level of grid[-1] (e.g. unit noise for
    a full-range grid, or a q_sample'd GT for anchored reconstruction).
    """
    grid = np.asarray(grid, np.int64)
    ab = schedule.alpha_bar_np().astype(np.float64)[grid]  # ascending in ᾱ? no: grid ascending t → ab descending
    alpha = np.sqrt(ab)
    sigma = np.sqrt(1.0 - ab)
    lam = np.log(np.clip(alpha, 1e-12, None)) - np.log(np.clip(sigma, 1e-12, None))

    # iterate i = n-1 … 1: step from grid[i] (s) to grid[i-1] (t)
    order = np.arange(len(grid) - 1, 0, -1)
    t_s = grid[order]
    lam_s, lam_t = lam[order], lam[order - 1]
    h = lam_t - lam_s  # > 0 (less noise → larger λ)
    h_prev = np.concatenate([[h[0]], h[:-1]])  # previous step's h (2M memory)
    r = h_prev / h
    sig_ratio = sigma[order - 1] / np.clip(sigma[order], 1e-12, None)
    alpha_t = alpha[order - 1]
    phi = np.expm1(-h)  # e^{-h} - 1  (negative)
    is_first = np.zeros(len(order), np.float32)
    is_first[0] = 1.0

    xs = (
        jnp.asarray(t_s, jnp.int32),
        jnp.asarray(np.sqrt(ab[order]), jnp.float32),
        jnp.asarray(np.sqrt(1.0 - ab[order]), jnp.float32),
        jnp.asarray(sig_ratio, jnp.float32),
        jnp.asarray(alpha_t, jnp.float32),
        jnp.asarray(phi, jnp.float32),
        jnp.asarray(1.0 / (2.0 * r), jnp.float32),
        jnp.asarray(is_first, jnp.float32),
    )
    B = x_init.shape[0]
    param = Parameterization(param)

    def step(carry, x):
        x_t, x0_prev = carry
        t, sab, s1mab, sr, a_t, ph, inv2r, first = x
        pred = denoise_fn(x_t, jnp.full((B,), t, jnp.int32))
        x0, _ = pred_to_x0_eps(param, x_t, pred, sab[None], s1mab[None])
        d = jnp.where(
            first > 0.5, x0, (1.0 + inv2r) * x0 - inv2r * x0_prev
        )
        x_next = sr * x_t - a_t * ph * d
        return (x_next, x0), x0

    (x_final, _), x0_hist = jax.lax.scan(step, (x_init, x_init), xs)

    # final x0 at the lowest grid time: one more model call at grid[0]
    t0 = jnp.full((B,), int(grid[0]), jnp.int32)
    sab0 = jnp.asarray(np.sqrt(ab[0]), jnp.float32)
    s1m0 = jnp.asarray(np.sqrt(1.0 - ab[0]), jnp.float32)
    pred = denoise_fn(x_final, t0)
    x0, _ = pred_to_x0_eps(param, x_final, pred, sab0[None], s1m0[None])
    return jnp.clip(x0, clip[0], clip[1])
