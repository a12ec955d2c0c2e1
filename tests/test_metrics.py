"""Metrics golden tests vs independent torch/numpy implementations of the
reference formulas (cited in s1s2/eval/metrics.py)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from s1s2.eval import (  # noqa: E402
    aggregate_final,
    channelwise_error_sums,
    eps_diagnostics,
    ergas,
    masked_mae,
    masked_mae_per_sample,
    masked_mse,
    masked_mse_per_sample,
    psnr,
    sam,
    ssim_simple,
    v_diagnostics,
)
from s1s2.train import masked_mse_per_channel  # noqa: E402


@pytest.fixture
def data(rng):
    B, H, W, C = 2, 12, 12, 4
    pred = rng.uniform(0, 1, (B, H, W, C)).astype(np.float32)
    tgt = rng.uniform(0, 1, (B, H, W, C)).astype(np.float32)
    mask = (rng.uniform(0, 1, (B, H, W)) > 0.3).astype(np.float32)
    return pred, tgt, mask


def to_torch_nchw(a):
    return torch.from_numpy(np.transpose(a, (0, 3, 1, 2)))


def torch_masked_mae(pred, tgt, mask):
    """`Evaluation/DDIM_Multi-step.py:72-80` re-derived."""
    p, g = to_torch_nchw(pred), to_torch_nchw(tgt)
    w = (torch.from_numpy(mask).unsqueeze(1) > 0).float()
    num = (w * (p - g).abs()).sum()
    den = w.sum() * p.size(1)
    return (num / (den + 1e-8)).item()


class TestMaskedMetrics:
    def test_mae_global(self, data):
        pred, tgt, mask = data
        got = float(masked_mae(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask)))
        assert got == pytest.approx(torch_masked_mae(pred, tgt, mask), rel=1e-5)

    def test_mse_global(self, data):
        pred, tgt, mask = data
        p, g = to_torch_nchw(pred), to_torch_nchw(tgt)
        w = (torch.from_numpy(mask).unsqueeze(1) > 0).float()
        expect = ((w * (p - g) ** 2).sum() / (w.sum() * p.size(1) + 1e-8)).item()
        got = float(masked_mse(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask)))
        assert got == pytest.approx(expect, rel=1e-5)

    def test_no_mask_means_plain(self, data):
        pred, tgt, _ = data
        got = float(masked_mae(jnp.asarray(pred), jnp.asarray(tgt)))
        assert got == pytest.approx(float(np.abs(pred - tgt).mean()), rel=1e-5)

    def test_per_sample_convention(self, data):
        """`Evaluation/Onestep_v_Prediction.py:74-92`: mean-of-numerators over
        mean-of-denominators."""
        pred, tgt, mask = data
        p, g = to_torch_nchw(pred), to_torch_nchw(tgt)
        w = (torch.from_numpy(mask).unsqueeze(1) > 0).float()
        num = (w * (p - g).abs()).sum(dim=(1, 2, 3)).mean()
        den = (w.sum(dim=(1, 2, 3)).clamp_min(1e-8) * p.size(1)).mean()
        expect = (num / den).item()
        got = float(
            masked_mae_per_sample(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask))
        )
        assert got == pytest.approx(expect, rel=1e-5)
        # mse flavor
        num = (w * (p - g) ** 2).sum(dim=(1, 2, 3)).mean()
        expect = (num / den).item()
        got = float(
            masked_mse_per_sample(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask))
        )
        assert got == pytest.approx(expect, rel=1e-5)


class TestDerived:
    def test_psnr(self, data):
        pred, tgt, mask = data
        m = float(masked_mse(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask)))
        # f32 log10 on device vs f64 host: ~1e-4 dB, far inside the 0.1 dB budget
        assert float(psnr(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask))) == (
            pytest.approx(10 * math.log10(1 / m), rel=1e-4)
        )
        assert float(psnr(jnp.asarray(pred), jnp.asarray(pred))) == 99.0

    def test_ssim_simple(self, data):
        pred, tgt, _ = data
        p, g = to_torch_nchw(pred), to_torch_nchw(tgt)
        C1, C2 = 0.01**2, 0.03**2
        mu_x, mu_y = p.mean().item(), g.mean().item()
        vx, vy = p.var().item(), g.var().item()
        cxy = ((p - p.mean()) * (g - g.mean())).mean().item()
        expect = ((2 * mu_x * mu_y + C1) * (2 * cxy + C2)) / (
            (mu_x**2 + mu_y**2 + C1) * (vx + vy + C2) + 1e-8
        )
        got = float(ssim_simple(jnp.asarray(pred), jnp.asarray(tgt)))
        assert got == pytest.approx(expect, rel=1e-4)

    def test_sam(self, data):
        pred, tgt, mask = data
        # torch re-derivation (`Evaluation/Comparison_Original.py:235-249`),
        # single sample since reference squeezes batch 1
        p = to_torch_nchw(pred)[0]
        g = to_torch_nchw(tgt)[0]
        m = torch.from_numpy(mask)[0] > 0
        pm, gm = p[:, m], g[:, m]
        dot = (pm * gm).sum(dim=0)
        cos = torch.clamp(
            dot / (pm.norm(dim=0).clamp(min=1e-8) * gm.norm(dim=0).clamp(min=1e-8)),
            -1, 1,
        )
        expect = torch.arccos(cos).mean().item()
        got = float(
            sam(jnp.asarray(pred[:1]), jnp.asarray(tgt[:1]), jnp.asarray(mask[:1]))
        )
        assert got == pytest.approx(expect, rel=1e-4)

    def test_ergas(self, data):
        pred, tgt, mask = data
        p1, t1, m1 = pred[:1], tgt[:1], mask[:1]
        # reference formula: masked per-band RMSE, unmasked band mean
        rmse_sq = 0.0
        for c in range(4):
            num = (m1[..., None] * (p1[..., c : c + 1] - t1[..., c : c + 1]) ** 2).sum()
            den = m1.sum() * 1 + 1e-8
            rmse = math.sqrt(max(num / den, 0))
            mean_c = t1[..., c].mean() + 1e-8
            rmse_sq += (rmse / mean_c) ** 2
        expect = 100.0 * math.sqrt(rmse_sq / 4) * 4.0
        got = float(ergas(jnp.asarray(p1), jnp.asarray(t1), jnp.asarray(m1)))
        assert got == pytest.approx(expect, rel=1e-3)


class TestStreaming:
    def test_accumulate_matches_direct(self, data):
        pred, tgt, mask = data
        a1, s1, w1 = channelwise_error_sums(
            jnp.asarray(pred[:1]), jnp.asarray(tgt[:1]), jnp.asarray(mask[:1])
        )
        a2, s2, w2 = channelwise_error_sums(
            jnp.asarray(pred[1:]), jnp.asarray(tgt[1:]), jnp.asarray(mask[1:])
        )
        mae, mse, psnr_v, mae_c, mse_c, psnr_c = aggregate_final(
            np.asarray(a1) + np.asarray(a2),
            np.asarray(s1) + np.asarray(s2),
            float(w1) + float(w2),
        )
        w = mask[..., None]
        expect_mae_c = (w * np.abs(pred - tgt)).sum(axis=(0, 1, 2)) / w.sum()
        np.testing.assert_allclose(mae_c, expect_mae_c, rtol=1e-5)
        assert mae == pytest.approx(expect_mae_c.mean(), rel=1e-5)
        assert psnr_v == pytest.approx(10 * math.log10(1 / mse), rel=1e-6)
        # band weights path
        mae_w, *_ = aggregate_final(
            np.asarray(a1) + np.asarray(a2),
            np.asarray(s1) + np.asarray(s2),
            float(w1) + float(w2),
            band_weights=[1, 1, 2, 2],
        )[:1]
        bw = np.array([1, 1, 2, 2]) / 6.0
        assert mae_w == pytest.approx((expect_mae_c * bw).sum(), rel=1e-5)


class TestDiagnostics:
    def test_eps_diag(self, data):
        pred, tgt, _ = data
        mse, cos = eps_diagnostics(jnp.asarray(pred), jnp.asarray(tgt))
        assert float(mse) == pytest.approx(((pred - tgt) ** 2).mean(), rel=1e-5)
        expect_cos = (pred * tgt).sum() / (
            np.sqrt((pred**2).sum()) * np.sqrt((tgt**2).sum()) + 1e-8
        )
        assert float(cos) == pytest.approx(expect_cos, rel=1e-5)
        _, cos_self = eps_diagnostics(jnp.asarray(pred), jnp.asarray(pred))
        assert float(cos_self) == pytest.approx(1.0, abs=1e-5)

    def test_v_diag_with_eps(self, data):
        pred, tgt, _ = data
        out = v_diagnostics(
            jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(tgt), jnp.asarray(tgt)
        )
        assert len(out) == 3 and float(out[2]) == pytest.approx(1.0, abs=1e-5)


class TestTrainLoss:
    def test_vs_torch(self, data):
        """Golden vs `Train_Orignal.py:154-189` re-derived in torch."""
        pred, tgt, mask = data
        p, g = to_torch_nchw(pred), to_torch_nchw(tgt)
        w = (torch.from_numpy(mask).unsqueeze(1) > 0).float()
        se = (p - g) ** 2 * w
        denom = w.sum(dim=(0, 2, 3)).clamp_min(1e-6).repeat(4)
        ch = se.sum(dim=(0, 2, 3)) / denom
        expect_total = ch.mean().item()

        total, ch_losses = masked_mse_per_channel(
            jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask)
        )
        assert float(total) == pytest.approx(expect_total, rel=1e-5)
        np.testing.assert_allclose(np.asarray(ch_losses), ch.numpy(), rtol=1e-5)

        # band-weighted
        bw = torch.tensor([1.0, 2.0, 3.0, 4.0])
        expect_w = ((ch * bw).sum() / bw.sum()).item()
        total_w, _ = masked_mse_per_channel(
            jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask),
            band_weights=jnp.array([1.0, 2.0, 3.0, 4.0]),
        )
        assert float(total_w) == pytest.approx(expect_w, rel=1e-5)

        # mask_as_weights
        wm = w / w.mean().clamp(min=1e-6)
        se = (p - g) ** 2 * wm
        denom = wm.sum(dim=(0, 2, 3)).clamp_min(1e-6).repeat(4)
        expect_soft = (se.sum(dim=(0, 2, 3)) / denom).mean().item()
        total_soft, _ = masked_mse_per_channel(
            jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask), mask_as_weights=True
        )
        assert float(total_soft) == pytest.approx(expect_soft, rel=1e-5)
