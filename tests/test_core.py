"""Golden tests for the diffusion math core.

Strategy per SURVEY.md §4: the reference formulas are re-derived
independently here (with numpy/torch) and compared against the s1s2 jnp
implementations at fixed seeds.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from s1s2.core import (
    Parameterization,
    Schedule,
    cosine_beta_schedule,
    linear_beta_schedule,
    make_schedule,
    p2_weight,
    q_sample,
    snr,
    v_from_x0_eps,
    x0_eps_from_v,
)
from s1s2.core.parametrize import pred_to_x0_eps, target_for, x0_from_eps


def torch_cosine_betas(T, s=0.008):
    """Independent torch re-derivation of the Nichol-Dhariwal cosine schedule
    (formula of `Train_Orignal.py:29-40`)."""
    import torch

    steps = torch.linspace(0, T, T + 1, dtype=torch.float64)
    f = torch.cos(((steps / T + s) / (1 + s)) * math.pi / 2) ** 2
    ab = f / f[0]
    betas = 1 - (ab[1:] / ab[:-1])
    return torch.clip(betas, 1e-5, 0.999).float().numpy()


class TestSchedule:
    def test_cosine_matches_torch_golden(self):
        for T in (10, 100, 1000):
            ours = cosine_beta_schedule(T)
            golden = torch_cosine_betas(T)
            np.testing.assert_allclose(ours, golden, rtol=0, atol=1e-7)

    def test_cosine_clipping_bounds(self):
        b = cosine_beta_schedule(1000)
        assert b.min() >= 1e-5 and b.max() <= 0.999

    def test_linear(self):
        b = linear_beta_schedule(1000)
        assert b[0] == pytest.approx(1e-4) and b[-1] == pytest.approx(0.02)

    def test_alpha_bar_monotone_decreasing(self):
        s = Schedule.cosine(1000)
        ab = np.asarray(s.alpha_bar)
        assert np.all(np.diff(ab) < 0)
        assert ab[0] > 0.9999  # beta_0 ≈ 4.1e-5 for cosine @ T=1000
        assert ab[-1] < 1e-3

    def test_selector(self):
        assert make_schedule(100, "cosine").T == 100
        assert make_schedule(100, "linear").T == 100
        with pytest.raises(ValueError):
            make_schedule(100, "nope")

    def test_sqrt_tables_consistent(self):
        s = Schedule.cosine(500)
        np.testing.assert_allclose(
            np.asarray(s.sqrt_alpha_bar) ** 2, np.asarray(s.alpha_bar), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(s.sqrt_one_minus_alpha_bar) ** 2,
            1 - np.asarray(s.alpha_bar),
            atol=1e-6,
        )


class TestParametrize:
    @pytest.fixture
    def batch(self, rng):
        B, H, W, C = 3, 8, 8, 4
        x0 = rng.standard_normal((B, H, W, C), dtype=np.float32)
        eps = rng.standard_normal((B, H, W, C), dtype=np.float32)
        t = np.array([5, 250, 900])
        s = Schedule.cosine(1000)
        sab = s.sqrt_alpha_bar[t]
        s1m = s.sqrt_one_minus_alpha_bar[t]
        return x0, eps, sab, s1m

    def test_q_sample_formula(self, batch):
        x0, eps, sab, s1m = batch
        xt = np.asarray(q_sample(x0, eps, sab, s1m))
        expect = (
            np.asarray(sab)[:, None, None, None] * x0
            + np.asarray(s1m)[:, None, None, None] * eps
        )
        np.testing.assert_allclose(xt, expect, atol=1e-6)

    def test_v_round_trip(self, batch):
        """v ↔ (x0, ε) inversion must be exact: the t=0-identity analog for
        the v system (`Train_v_Prediction.py:209-219`)."""
        x0, eps, sab, s1m = batch
        xt = q_sample(x0, eps, sab, s1m)
        v = v_from_x0_eps(x0, eps, sab, s1m)
        x0r, epsr = x0_eps_from_v(xt, v, sab, s1m)
        np.testing.assert_allclose(np.asarray(x0r), x0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(epsr), eps, atol=1e-4)

    def test_t0_identity(self, rng):
        """At t=0, √ᾱ≈1 so x_t≈x0 and eps-reconstruction returns x0
        (executable assertion from `Evaluation/Onestep.py:133-147`)."""
        s = Schedule.cosine(1000)
        x0 = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
        eps = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
        t = np.array([0])
        xt = q_sample(x0, eps, s.sqrt_alpha_bar[t], s.sqrt_one_minus_alpha_bar[t])
        x0r = x0_from_eps(
            xt, eps, s.sqrt_alpha_bar[t], s.sqrt_one_minus_alpha_bar[t]
        )
        # beta_0 = 1e-5 → √(1-ᾱ_0) ≈ 3e-3; identity holds to that order
        assert float(jnp.abs(x0r - x0).mean()) < 1e-2
        assert float(jnp.abs(xt - x0).mean()) < 1e-2

    def test_eps_x0_inverse_consistency(self, batch):
        x0, eps, sab, s1m = batch
        xt = q_sample(x0, eps, sab, s1m)
        x0r = x0_from_eps(xt, eps, sab, s1m)
        np.testing.assert_allclose(np.asarray(x0r), x0, atol=1e-4)

    def test_eps_from_x0_inverse(self, batch):
        from s1s2.core import eps_from_x0

        x0, eps, sab, s1m = batch
        xt = q_sample(x0, eps, sab, s1m)
        epsr = eps_from_x0(xt, x0, sab, s1m)
        np.testing.assert_allclose(np.asarray(epsr), eps, atol=1e-4)

    def test_snr_p2(self):
        s = Schedule.cosine(1000)
        ab = s.alpha_bar[jnp.array([10, 500, 990])]
        snr_v = np.asarray(snr(ab))
        expect = np.asarray(ab) / np.clip(1 - np.asarray(ab), 1e-8, None)
        np.testing.assert_allclose(snr_v, expect, rtol=1e-6)
        w = np.asarray(p2_weight(ab, gamma=1.0, k=1e-3))
        np.testing.assert_allclose(w, (1e-3 + expect) ** -1.0, rtol=1e-5)
        # weight grows with t (low SNR → high weight)
        assert w[0] < w[1] < w[2]

    def test_target_and_pred_round_trip(self, batch):
        x0, eps, sab, s1m = batch
        xt = q_sample(x0, eps, sab, s1m)
        for param in (Parameterization.EPS, Parameterization.V):
            tgt = target_for(param, x0, eps, sab, s1m)
            x0r, epsr = pred_to_x0_eps(param, xt, tgt, sab, s1m)
            np.testing.assert_allclose(np.asarray(epsr), eps, atol=1e-4)
            np.testing.assert_allclose(np.asarray(x0r), x0, atol=2e-4)
