"""Diffusion beta schedules and derived tables.

Capability parity with the reference's schedule definitions
(`Train_Orignal.py:29-40` cosine, `Evaluation/Limitation_Test.py:22-31`
linear + selector), re-designed as a single immutable table object so every
trainer/sampler shares one copy instead of the reference's 13 re-declarations.

Tables are generated in float64 on the host (numpy) for bit-stable
accuracy, then stored as float32 device constants — the same precision
path the reference uses (torch.float64 linspace → .float()).
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np


def cosine_beta_schedule(T: int, s: float = 0.008) -> np.ndarray:
    """Nichol & Dhariwal "Improved DDPM" cosine schedule.

    Betas are clipped to [1e-5, 0.999] (reference `Train_Orignal.py:29-40`).
    Returns a float32 numpy array of length ``T`` — host-side on purpose so
    the table is a compile-time constant under jit.
    """
    t = np.linspace(0.0, T, T + 1, dtype=np.float64)
    f = np.cos(((t / T + s) / (1.0 + s)) * math.pi / 2.0) ** 2
    alpha_bar = f / f[0]
    betas = 1.0 - (alpha_bar[1:] / alpha_bar[:-1])
    return np.clip(betas, 1e-5, 0.999).astype(np.float32)


def linear_beta_schedule(
    T: int, beta_start: float = 1e-4, beta_end: float = 0.02
) -> np.ndarray:
    """Ho et al. linear schedule (reference `Evaluation/Limitation_Test.py:22-23`)."""
    return np.linspace(beta_start, beta_end, T, dtype=np.float64).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class Schedule:
    """Immutable diffusion schedule tables (all float32, length ``T``).

    Attributes are jnp arrays so they live on-device once and are folded
    into jitted programs as constants when closed over.
    """

    T: int
    betas: jnp.ndarray
    alphas: jnp.ndarray
    alpha_bar: jnp.ndarray
    sqrt_alpha_bar: jnp.ndarray
    sqrt_one_minus_alpha_bar: jnp.ndarray

    @classmethod
    def from_betas(cls, betas: np.ndarray) -> "Schedule":
        # Derive in float64 to keep the cumulative product accurate at large T,
        # then store float32 (matches the reference: f32 betas → f32 cumprod,
        # but the extra headroom costs nothing at table-build time).
        b64 = betas.astype(np.float64)
        alphas = 1.0 - b64
        alpha_bar = np.cumprod(alphas)
        return cls(
            T=int(betas.shape[0]),
            betas=jnp.asarray(betas, dtype=jnp.float32),
            alphas=jnp.asarray(alphas, dtype=jnp.float32),
            alpha_bar=jnp.asarray(alpha_bar, dtype=jnp.float32),
            sqrt_alpha_bar=jnp.asarray(np.sqrt(alpha_bar), dtype=jnp.float32),
            sqrt_one_minus_alpha_bar=jnp.asarray(
                np.sqrt(1.0 - alpha_bar), dtype=jnp.float32
            ),
        )

    @classmethod
    def cosine(cls, T: int = 1000, s: float = 0.008) -> "Schedule":
        return cls.from_betas(cosine_beta_schedule(T, s))

    @classmethod
    def linear(
        cls, T: int = 1000, beta_start: float = 1e-4, beta_end: float = 0.02
    ) -> "Schedule":
        return cls.from_betas(linear_beta_schedule(T, beta_start, beta_end))

    # numpy mirror of alpha_bar for host-side grid/sigma precomputation
    def alpha_bar_np(self) -> np.ndarray:
        return np.asarray(self.alpha_bar)


def make_schedule(T: int = 1000, kind: str = "cosine", **kw) -> Schedule:
    """Schedule selector (reference `Evaluation/Limitation_Test.py:25-31`)."""
    if kind == "cosine":
        return Schedule.cosine(T, **kw)
    if kind == "linear":
        return Schedule.linear(T, **kw)
    raise ValueError(f"unknown schedule kind: {kind!r} (expected cosine|linear)")
