"""Diffusion parameterization algebra: eps / v / x0 conversions.

One module replaces the reference's scattered conversion functions
(`Train_Orignal.py:43-52` q_sample, `Train_v_Prediction.py:200-219`
v_from_x0_eps / x0_eps_from_v_x, `Evaluation/Onestep_v_Prediction.py:58-71`
v_to_x0_eps, `Train_v_Prediction.py:188-196` snr_p2_weight).

All functions are pure jnp, layout-agnostic: the alpha-bar coefficients are
broadcast from shape ``(B,)`` against NHWC tensors ``(B, H, W, C)``.
Everything computes in float32 regardless of input dtype (bf16 activations
are upcast at these boundaries, mirroring the reference's autocast behavior
where schedule tables stay f32).
"""

from __future__ import annotations

import enum

import jax.numpy as jnp


class Parameterization(str, enum.Enum):
    """What the denoiser network predicts."""

    EPS = "eps"
    V = "v"


def _bcast(coef: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a per-sample (B,) coefficient against a (B, ...) tensor."""
    coef = jnp.asarray(coef, dtype=jnp.float32)
    return coef.reshape(coef.shape + (1,) * (like.ndim - coef.ndim))


def q_sample(x0, noise, sqrt_ab, sqrt_1mab):
    """Forward diffusion: x_t = √ᾱ_t·x0 + √(1−ᾱ_t)·ε  (`Train_Orignal.py:43-52`)."""
    return _bcast(sqrt_ab, x0) * x0.astype(jnp.float32) + _bcast(
        sqrt_1mab, x0
    ) * noise.astype(jnp.float32)


def v_from_x0_eps(x0, eps, sqrt_ab, sqrt_1mab):
    """v = √ᾱ·ε − √(1−ᾱ)·x0  (`Train_v_Prediction.py:200-206`)."""
    return _bcast(sqrt_ab, eps) * eps.astype(jnp.float32) - _bcast(
        sqrt_1mab, x0
    ) * x0.astype(jnp.float32)


def x0_eps_from_v(x_t, v, sqrt_ab, sqrt_1mab):
    """Invert the v system: x0 = √ᾱ·x_t − √(1−ᾱ)·v ; ε = √(1−ᾱ)·x_t + √ᾱ·v
    (`Train_v_Prediction.py:209-219`, `Evaluation/Onestep_v_Prediction.py:58-71`)."""
    a = _bcast(sqrt_ab, x_t)
    b = _bcast(sqrt_1mab, x_t)
    x_t = x_t.astype(jnp.float32)
    v = v.astype(jnp.float32)
    x0 = a * x_t - b * v
    eps = b * x_t + a * v
    return x0, eps


def x0_from_eps(x_t, eps, sqrt_ab, sqrt_1mab, eps_guard: float = 1e-8):
    """x0 = (x_t − √(1−ᾱ)·ε) / √(ᾱ + guard).

    The guard sits inside the sqrt of the *squared* coefficient, matching the
    reference's ``/ torch.sqrt(a_t + 1e-8)`` (`Evaluation/DDIM_Multi-step.py:132`):
    we reconstruct ᾱ from its sqrt to apply the identical expression.
    """
    a = _bcast(sqrt_ab, x_t).astype(jnp.float32)
    b = _bcast(sqrt_1mab, x_t).astype(jnp.float32)
    denom = jnp.sqrt(a * a + eps_guard)
    return (x_t.astype(jnp.float32) - b * eps.astype(jnp.float32)) / denom


def eps_from_x0(x_t, x0, sqrt_ab, sqrt_1mab, eps_guard: float = 1e-8):
    """ε = (x_t − √ᾱ·x0) / √(1−ᾱ + guard)."""
    a = _bcast(sqrt_ab, x_t).astype(jnp.float32)
    b = _bcast(sqrt_1mab, x_t).astype(jnp.float32)
    denom = jnp.sqrt(b * b + eps_guard)
    return (x_t.astype(jnp.float32) - a * x0.astype(jnp.float32)) / denom


def snr(alpha_bar_t, clamp_min: float = 1e-8):
    """Signal-to-noise ratio SNR(t) = ᾱ/(1−ᾱ)  (`Train_v_Prediction.py:188-196`)."""
    ab = jnp.asarray(alpha_bar_t, dtype=jnp.float32)
    return ab / jnp.clip(1.0 - ab, clamp_min, None)


def p2_weight(alpha_bar_t, gamma: float = 1.0, k: float = 1e-3):
    """p2/SNR loss reweighting: w = (k + SNR)^(−γ)  (`Train_v_Prediction.py:188-196`)."""
    return jnp.power(k + snr(alpha_bar_t), -gamma)


def target_for(param: Parameterization, x0, noise, sqrt_ab, sqrt_1mab):
    """Training target for the chosen parameterization
    (`Train_v_Prediction.py:367-372`)."""
    param = Parameterization(param)
    if param is Parameterization.EPS:
        return noise.astype(jnp.float32)
    return v_from_x0_eps(x0, noise, sqrt_ab, sqrt_1mab)


def pred_to_x0_eps(param: Parameterization, x_t, pred, sqrt_ab, sqrt_1mab):
    """Convert a network prediction into (x0̂, ε̂) under either parameterization."""
    param = Parameterization(param)
    if param is Parameterization.EPS:
        x0 = x0_from_eps(x_t, pred, sqrt_ab, sqrt_1mab)
        return x0, pred.astype(jnp.float32)
    return x0_eps_from_v(x_t, pred, sqrt_ab, sqrt_1mab)
