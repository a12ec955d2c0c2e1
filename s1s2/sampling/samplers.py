"""Diffusion samplers, re-designed for TPU as fused ``lax.scan`` loops.

Every reference sampler is reproduced (behavioral parity, file:line cited per
function) but the architecture is new:

* The step loop is a ``lax.scan`` whose per-step schedule coefficients are
  precomputed host-side and fed as scan ``xs`` — no gathers inside the loop,
  the whole multi-step chain compiles to ONE fused XLA program that stays
  resident on-chip (the reference re-launches a Python-driven kernel chain
  per step).
* Samplers are **batched**: (B,H,W,C) throughout. The reference evaluates
  one patch per forward pass (`Evaluation/DDIM_Multi-step.py:224`); here a
  whole batch of patches rides each UNet call, which is where most of the
  TPU throughput win comes from.
* The denoiser is abstracted as ``denoise_fn(x_t, t) -> pred`` so the same
  scan drivers serve ε-models, v-models and CFG-guided models
  (``make_cfg_denoise_fn`` folds the cond/uncond pair into one forward by
  stacking along batch — one MXU pass instead of two).

RNG: explicit keys; per-step noise keys are pre-split and fed as scan xs.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from s1s2.core.parametrize import (
    Parameterization,
    pred_to_x0_eps,
    q_sample,
)
from s1s2.core.schedule import Schedule
from s1s2.sampling.grids import clamp_t, linspace_grid

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def make_denoise_fn(apply_fn, variables, cond: jnp.ndarray) -> DenoiseFn:
    """Bind a Flax apply + params + conditioning into ``(x_t, t) -> pred``.

    Concatenation order [x_t, cond] matches `Train_Orignal.py:290`.
    """

    def fn(x_t, t):
        return apply_fn(variables, jnp.concatenate([x_t, cond], axis=-1), t)

    return fn


def make_cfg_denoise_fn(
    apply_fn,
    variables,
    cond: jnp.ndarray,
    guidance_scale: float,
    null_cond: Optional[jnp.ndarray] = None,
) -> DenoiseFn:
    """Classifier-free guidance: pred = uncond + g·(cond − uncond).

    The reference's ``cfg_v`` model family has no surviving sampler script
    (SURVEY.md §0); this implements the standard Ho & Salimans rule with the
    cond and null-cond passes STACKED along batch so guidance costs one
    forward, not two (BASELINE.json north star).
    """
    if null_cond is None:
        null_cond = jnp.zeros_like(cond)
    both = jnp.concatenate([cond, null_cond], axis=0)
    g = float(guidance_scale)

    def fn(x_t, t):
        x2 = jnp.concatenate([x_t, x_t], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        pred = apply_fn(variables, jnp.concatenate([x2, both], axis=-1), t2)
        pc, pu = jnp.split(pred, 2, axis=0)
        return pu + g * (pc - pu)

    return fn


def _coef(schedule: Schedule, idx: np.ndarray) -> np.ndarray:
    """Gather host-side float32 ᾱ values at integer timesteps."""
    return schedule.alpha_bar_np().astype(np.float64)[idx]


# ---------------------------------------------------------------------------
# ε-model, linspace convention (GT-anchored recon & pure generation)
# ---------------------------------------------------------------------------


def _ddim_linspace_scan(
    denoise_fn: DenoiseFn,
    x_init: jnp.ndarray,
    schedule: Schedule,
    t_start: int,
    steps: int,
    clip: Tuple[float, float],
    return_traj: bool = False,
):
    """Shared driver for the reference's ε/linspace DDIM loop
    (`Evaluation/DDIM_Multi-step.py:124-134`): iterate (t_cur → t_next) pairs,
    return the LAST x0̂ (not x_t), clamped.

    ``return_traj=True`` additionally returns ``(ts, traj)`` — the integer
    timesteps and the x_t INPUT state the denoiser saw at each step — for
    trajectory-matched int8 calibration (models/quant.make_cfg_rollout_calib
    ε family); traj is only materialized when requested.
    """
    ts = linspace_grid(t_start, steps, schedule.T)  # length steps+1, descending
    a_cur = _coef(schedule, ts[:-1])
    a_next = _coef(schedule, ts[1:])
    xs = (
        jnp.asarray(ts[:-1], jnp.int32),
        jnp.asarray(np.sqrt(1.0 - a_cur), jnp.float32),
        jnp.asarray(np.sqrt(a_cur + 1e-8), jnp.float32),
        jnp.asarray(np.sqrt(a_next), jnp.float32),
        jnp.asarray(np.sqrt(1.0 - a_next), jnp.float32),
    )
    B = x_init.shape[0]

    def step(carry, x):
        x_in, _ = carry
        t, s1mab, sab_guard, sab_n, s1mab_n = x
        eps = denoise_fn(x_in, jnp.full((B,), t, jnp.int32))
        x0_hat = (x_in - s1mab * eps) / sab_guard
        x_t = sab_n * x0_hat + s1mab_n * eps
        return (x_t, x0_hat), (x_in if return_traj else None)

    (_, x0_hat), traj = jax.lax.scan(step, (x_init, x_init), xs)
    out = jnp.clip(x0_hat, clip[0], clip[1])
    if return_traj:
        return out, (xs[0], traj)
    return out


def ddim_anchored(
    denoise_fn: DenoiseFn,
    x_gt: jnp.ndarray,
    key: jax.Array,
    schedule: Schedule,
    t_start: int = 200,
    steps: int = 20,
    clip: Tuple[float, float] = (0.0, 1.0),
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """GT-anchored deterministic DDIM (ε): forward-diffuse GT to t_start then
    denoise down the linspace grid (`Evaluation/DDIM_Multi-step.py:116-137`).

    ``noise`` may be supplied for fixed-noise sweeps (the reference's
    per-file ``torch.manual_seed(seed_base+i)``, `Evaluation/DDIM_Sweep.py:404`).
    """
    t_start = clamp_t(t_start, schedule.T)
    B = x_gt.shape[0]
    t = jnp.full((B,), t_start, jnp.int32)
    if noise is None:
        noise = jax.random.normal(key, x_gt.shape, jnp.float32)
    x_t = q_sample(
        x_gt, noise, schedule.sqrt_alpha_bar[t], schedule.sqrt_one_minus_alpha_bar[t]
    )
    return _ddim_linspace_scan(denoise_fn, x_t, schedule, t_start, steps, clip)


def ddim_generate(
    denoise_fn: DenoiseFn,
    shape: Tuple[int, ...],
    key: jax.Array,
    schedule: Schedule,
    t_start: int = 200,
    steps: int = 20,
    clip: Tuple[float, float] = (0.0, 1.0),
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Pure generation (ε): x_t ~ N(0, I) full scale, DDIM down the linspace
    grid, conditioned only through denoise_fn
    (`Evaluation_Updated/Evaluation_Pure_Generation.py:278-292`).

    ``noise`` may be supplied as the stored init draw (fixed-noise sweeps
    and distillation targets), mirroring ``ddim_anchored``.

    NOTE: faithfully does NOT clamp t_start (the reference indexes
    alpha_bar[linspace(t_start,0,...)] directly, e.g. t_start=999)."""
    x_t = (jax.random.normal(key, shape, jnp.float32)
           if noise is None else jnp.asarray(noise, jnp.float32))
    return _ddim_linspace_scan(denoise_fn, x_t, schedule, t_start, steps, clip)


# ---------------------------------------------------------------------------
# round-unique grid convention (ε and v, deterministic or stochastic η)
# ---------------------------------------------------------------------------


def ddim_grid_sample(
    denoise_fn: DenoiseFn,
    x_init: jnp.ndarray,
    key: jax.Array,
    schedule: Schedule,
    grid: np.ndarray,
    param: Parameterization = Parameterization.V,
    eta: float = 0.0,
    clip: Tuple[float, float] = (0.0, 1.0),
    return_traj: bool = False,
) -> Union[jnp.ndarray, Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]]:
    """Descending sweep over an ascending unique grid; at the lowest grid
    point x_t ← x0̂ — returns that final array, or with ``return_traj=True``
    the pair ``(x0, (t_cur, traj))`` of per-step timesteps and visited
    states (int8 rollout calibration). Covers:

    * v-model pure-noise DDIM with η (`Evaluation/DDIM_Multi-step_v_Prediction.py:137-178`)
    * full-range ε DDIM (`Evaluation/Limitation_Test.py:227-249`)
    * full-range v DDIM with η and optional t_start
      (`Evaluation/Limitation_Test_v_Prediction.py:229-254`)

    ``x_init`` is caller-built (√(1−ᾱ_K)-scaled or unit noise), ``grid`` from
    s1s2.sampling.grids. η>0 adds the stochastic DDIM term with
    σ = η·√((1−ᾱ_prev)/(1−ᾱ_cur+1e-8)·max(0, 1−ᾱ_cur/ᾱ_prev)).

    ``key`` may be a single PRNG key (one stream for the whole batch — a
    file's η draws then depend on its batch slot) or a **batch of per-file
    keys** with shape (B, 2): each file gets its own independent per-step
    η stream, so results are invariant to batch composition — matching the
    reference's per-file `torch.manual_seed` semantics
    (`Evaluation/DDIM_Multi-step_v_Prediction.py:172-174`).
    """
    grid = np.asarray(grid, np.int64)
    n = len(grid)
    a = _coef(schedule, grid)  # ascending
    # iterate i = n-1 … 0; at step i>0 the "prev" is grid[i-1]
    order = np.arange(n - 1, -1, -1)
    t_cur = grid[order]
    a_cur = a[order]
    a_prev = np.where(order > 0, a[np.maximum(order - 1, 0)], 1.0)  # dummy at last
    is_last = (order == 0).astype(np.float32)

    sigma = float(eta) * np.sqrt(
        (1.0 - a_prev) / (1.0 - a_cur + 1e-8) * np.clip(1.0 - a_cur / a_prev, 0.0, None)
    )
    dir_term = np.sqrt(np.clip((1.0 - a_prev) - sigma**2, 0.0, None))

    # A batch of per-file keys is (B, 2) for raw uint32 keys, or (B,) for
    # new-style typed keys (jax.random.key); a single key is (2,) / scalar.
    key_ndim = getattr(key, "ndim", 1)
    if jnp.issubdtype(getattr(key, "dtype", jnp.uint32), jax.dtypes.prng_key):
        per_file_keys = key_ndim == 1
    else:
        per_file_keys = key_ndim == 2
    if per_file_keys:
        # (B, n, 2) → (n, B, 2): step-major for the scan, one stream per file
        step_keys = jnp.swapaxes(
            jax.vmap(lambda kk: jax.random.split(kk, n))(key), 0, 1)
    else:
        step_keys = jax.random.split(key, n)
    xs = (
        jnp.asarray(t_cur, jnp.int32),
        jnp.asarray(np.sqrt(a_cur), jnp.float32),
        jnp.asarray(np.sqrt(1.0 - a_cur), jnp.float32),
        jnp.asarray(np.sqrt(a_prev), jnp.float32),
        jnp.asarray(dir_term, jnp.float32),
        jnp.asarray(sigma, jnp.float32),
        jnp.asarray(is_last, jnp.float32),
        step_keys,
    )
    B = x_init.shape[0]
    param = Parameterization(param)

    def step(x_t, x):
        x_in = x_t
        t, sab, s1mab, sab_p, dirt, sig, last, k = x
        pred = denoise_fn(x_t, jnp.full((B,), t, jnp.int32))
        x0_pred, eps_pred = pred_to_x0_eps(
            param, x_t, pred, sab[None], s1mab[None]
        )
        if per_file_keys:
            z = jax.vmap(
                lambda kk: jax.random.normal(kk, x_t.shape[1:], jnp.float32)
            )(k)
        else:
            z = jax.random.normal(k, x_t.shape, jnp.float32)
        x_next = sab_p * x0_pred + dirt * eps_pred + sig * z
        x_t = last * x0_pred + (1.0 - last) * x_next
        return x_t, x_in if return_traj else None

    x_t, traj = jax.lax.scan(step, x_init, xs)
    x_t = jnp.clip(x_t, clip[0], clip[1])
    if return_traj:
        # per-step denoiser INPUT states (step-major, descending t) + the
        # integer t each state was evaluated at — calibration surface for
        # quantization (models/quant.make_cfg_rollout_calib)
        return x_t, (jnp.asarray(t_cur, jnp.int32), traj)
    return x_t


def scaled_noise_init(
    key: jax.Array, shape: Tuple[int, ...], schedule: Schedule, t_start: int
) -> jnp.ndarray:
    """x_t = randn·√(1−ᾱ_{t_start}) — the v-sampler's mean-free init
    (`Evaluation/DDIM_Multi-step_v_Prediction.py:154`)."""
    a_t = float(schedule.alpha_bar_np()[clamp_t(t_start, schedule.T)])
    return jax.random.normal(key, shape, jnp.float32) * np.sqrt(1.0 - a_t)


# ---------------------------------------------------------------------------
# ancestral DDPM (all T steps)
# ---------------------------------------------------------------------------


def ddpm_ancestral(
    denoise_fn: DenoiseFn,
    shape: Tuple[int, ...],
    key: jax.Array,
    schedule: Schedule,
    param: Parameterization = Parameterization.EPS,
    clip: Tuple[float, float] = (0.0, 1.0),
    noise: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Full ancestral DDPM from pure noise, T model calls
    (`Evaluation/Limitation_Test.py:209-224`; v variant
    `Evaluation/Limitation_Test_v_Prediction.py:210-226`).

    ``noise`` (optional) replays an external draw stream in the reference's
    consumption order: shape ``(T,) + shape`` where ``noise[0]`` is the pure-
    noise init (`Limitation_Test.py:212`) and ``noise[j]`` (j=1..T-1) the
    post-mean draw of step j, i.e. ``randn_like`` at t = T-j
    (`Limitation_Test.py:221`; no draw at t=0). When given, ``key`` is unused.
    """
    T = schedule.T
    betas = np.asarray(schedule.betas, np.float64)
    alphas = 1.0 - betas
    ab = schedule.alpha_bar_np().astype(np.float64)
    order = np.arange(T - 1, -1, -1)

    if noise is None:
        keys = jax.random.split(key, T + 1)
        x_t = jax.random.normal(keys[0], shape, jnp.float32)
        draws = keys[1:]
    else:
        if noise.shape != (T,) + tuple(shape):
            raise ValueError(
                f"ddpm replay noise must be (T,)+shape = {(T,) + tuple(shape)}, "
                f"got {noise.shape}")
        x_t = noise[0].astype(jnp.float32)
        # step j consumes noise[j+1]; the t=0 step has noise_scale 0, so its
        # (never-drawn-by-torch) slot is a zero placeholder
        draws = jnp.concatenate(
            [noise[1:].astype(jnp.float32),
             jnp.zeros((1,) + tuple(shape), jnp.float32)], axis=0)
    xs = (
        jnp.asarray(order, jnp.int32),
        jnp.asarray(1.0 / np.sqrt(alphas[order]), jnp.float32),
        jnp.asarray(betas[order] / np.sqrt(1.0 - ab[order] + 1e-8), jnp.float32),
        jnp.asarray(np.sqrt(ab[order]), jnp.float32),
        jnp.asarray(np.sqrt(1.0 - ab[order]), jnp.float32),
        jnp.asarray(np.where(order > 0, np.sqrt(betas[order]), 0.0), jnp.float32),
        draws,
    )
    B = shape[0]
    param = Parameterization(param)

    def step(x_t, x):
        t, inv_sa, coef, sab, s1mab, noise_scale, k = x
        pred = denoise_fn(x_t, jnp.full((B,), t, jnp.int32))
        if param is Parameterization.EPS:
            eps = pred
        else:
            _, eps = pred_to_x0_eps(param, x_t, pred, sab[None], s1mab[None])
        mean = inv_sa * (x_t - coef * eps)
        z = k if noise is not None else jax.random.normal(k, x_t.shape, jnp.float32)
        return mean + noise_scale * z, None

    x_t, _ = jax.lax.scan(step, x_t, xs)
    return jnp.clip(x_t, clip[0], clip[1])


# ---------------------------------------------------------------------------
# diagnostics
# ---------------------------------------------------------------------------


def partial_ddim_from_gt(
    denoise_fn: DenoiseFn,
    x_gt: jnp.ndarray,
    key: jax.Array,
    schedule: Schedule,
    k: int,
    clip: Tuple[float, float] = (0.0, 1.0),
    noise: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Forward-diffuse GT to t=k, reverse k→0 stride-1 deterministic DDIM;
    final = x_t after the k→0 chain (`Evaluation/Limitation_Test.py:252-270`).
    ``noise`` overrides the forward-diffusion draw (torch-stream replay)."""
    k = int(max(0, min(k, schedule.T - 1)))
    B = x_gt.shape[0]
    t = jnp.full((B,), k, jnp.int32)
    if noise is None:
        noise = jax.random.normal(key, x_gt.shape, jnp.float32)
    x_t = q_sample(
        x_gt, noise, schedule.sqrt_alpha_bar[t], schedule.sqrt_one_minus_alpha_bar[t]
    )
    if k == 0:
        return jnp.clip(x_t, clip[0], clip[1])
    grid = np.arange(k, -1, -1)
    a_cur = _coef(schedule, grid[:-1])
    a_next = _coef(schedule, grid[1:])
    xs = (
        jnp.asarray(grid[:-1], jnp.int32),
        jnp.asarray(np.sqrt(1.0 - a_cur), jnp.float32),
        jnp.asarray(np.sqrt(a_cur + 1e-8), jnp.float32),
        jnp.asarray(np.sqrt(a_next), jnp.float32),
        jnp.asarray(np.sqrt(1.0 - a_next), jnp.float32),
    )

    def step(x_t, x):
        t, s1mab, sab_guard, sab_n, s1mab_n = x
        eps = denoise_fn(x_t, jnp.full((B,), t, jnp.int32))
        x0 = (x_t - s1mab * eps) / sab_guard
        return sab_n * x0 + s1mab_n * eps, None

    x_t, _ = jax.lax.scan(step, x_t, xs)
    return jnp.clip(x_t, clip[0], clip[1])


def one_step_recon(
    denoise_fn: DenoiseFn,
    x_gt: jnp.ndarray,
    key: jax.Array,
    schedule: Schedule,
    t_small: int = 20,
    param: Parameterization = Parameterization.EPS,
    clip: Tuple[float, float] = (0.0, 1.0),
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Single-step x0 reconstruction at small t
    (`Evaluation/DDIM_Multi-step.py:155-170`; v variant
    `Evaluation/DDIM_Multi-step_v_Prediction.py:211-226`)."""
    t_small = clamp_t(t_small, schedule.T)
    B = x_gt.shape[0]
    t = jnp.full((B,), t_small, jnp.int32)
    if noise is None:
        noise = jax.random.normal(key, x_gt.shape, jnp.float32)
    sab = schedule.sqrt_alpha_bar[t]
    s1mab = schedule.sqrt_one_minus_alpha_bar[t]
    x_t = q_sample(x_gt, noise, sab, s1mab)
    pred = denoise_fn(x_t, t)
    x0_hat, _ = pred_to_x0_eps(param, x_t, pred, sab, s1mab)
    return jnp.clip(x0_hat, clip[0], clip[1])
