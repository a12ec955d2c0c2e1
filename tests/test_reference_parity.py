"""End-to-end reference parity: torch model + torch-formula sampler loop vs
converted weights + s1s2 fused scan sampler, with IDENTICAL injected noise.

This is the strongest checkpoint-parity statement possible without the
stripped .pth blobs (SURVEY.md §0): if the real reference checkpoints were
present, the same code path (convert → ddim_anchored) reproduces the
reference's published per-file metrics up to float32 accumulation order.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from s1s2.core import Schedule  # noqa: E402
from s1s2.eval.metrics import masked_mae, masked_mse  # noqa: E402
from s1s2.models import UNetSmall, torch_state_dict_to_params  # noqa: E402
from s1s2.sampling import ddim_anchored, make_denoise_fn, one_step_recon  # noqa: E402

from test_model_parity import build_torch_unet  # noqa: E402

T = 100
IN_CH, OUT_CH, BASE = 4, 4, 6  # 4 cond + 4 target


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(11)
    tm = build_torch_unet(IN_CH + OUT_CH, OUT_CH, BASE)
    tm.eval()
    variables = torch_state_dict_to_params(tm.state_dict())
    fm = UNetSmall(out_ch=OUT_CH, base_ch=BASE, compute_dtype=jnp.float32)
    return tm, fm, variables


def torch_schedule(T):
    import math

    t = torch.linspace(0, T, T + 1, dtype=torch.float64)
    f = torch.cos(((t / T + 0.008) / 1.008) * math.pi / 2) ** 2
    ab = f / f[0]
    betas = torch.clip(1 - ab[1:] / ab[:-1], 1e-5, 0.999).float()
    return torch.cumprod(1 - betas, dim=0)


def torch_ddim_anchored(tm, x_gt, x_cond, alpha_bar, noise, t_start, steps):
    """Reference GT-anchored DDIM loop in torch
    (`Evaluation/DDIM_Multi-step.py:116-134`)."""
    t_start = max(1, min(t_start, len(alpha_bar) - 1))
    a_t = alpha_bar[t_start]
    x_t = torch.sqrt(a_t) * x_gt + torch.sqrt(1 - a_t) * noise
    ts = torch.linspace(t_start, 0, steps + 1, dtype=torch.long)
    x0 = None
    with torch.no_grad():
        for i in range(steps):
            a_cur = alpha_bar[ts[i]]
            a_next = alpha_bar[ts[i + 1]]
            eps = tm(torch.cat([x_t, x_cond], dim=1), ts[i].view(1))
            x0 = (x_t - torch.sqrt(1 - a_cur) * eps) / torch.sqrt(a_cur + 1e-8)
            x_t = torch.sqrt(a_next) * x0 + torch.sqrt(1 - a_next) * eps
    return torch.clamp(x0, 0, 1)


def torch_ddim_v_grid(tm, x_init, x_cond, alpha_bar, t_start, steps):
    """Reference pure-noise v-DDIM loop
    (`Evaluation/DDIM_Multi-step_v_Prediction.py:137-175`), η=0."""
    grid = torch.unique(
        torch.round(torch.linspace(0, t_start, steps)).to(torch.long), sorted=True
    )
    if grid[-1].item() != t_start:
        grid = torch.unique(torch.cat([grid, torch.tensor([t_start])]), sorted=True)
    x_t = x_init.clone()
    with torch.no_grad():
        for i in reversed(range(len(grid))):
            t = int(grid[i])
            a = alpha_bar[t]
            sab, s1m = torch.sqrt(a), torch.sqrt(1 - a)
            v = tm(torch.cat([x_t, x_cond], dim=1), torch.tensor([t]))
            x0 = sab * x_t - s1m * v
            eps = s1m * x_t + sab * v
            if i == 0:
                x_t = x0
            else:
                a_prev = alpha_bar[int(grid[i - 1])]
                x_t = torch.sqrt(a_prev) * x0 + torch.sqrt(1 - a_prev) * eps
    return torch.clamp(x_t, 0, 1)


class TestEndToEndParity:
    def test_ddim_anchored_matches_torch(self, models, rng):
        tm, fm, variables = models
        H = W = 16
        x_gt = rng.uniform(0, 1, (1, OUT_CH, H, W)).astype(np.float32)
        x_cond = rng.standard_normal((1, IN_CH, H, W)).astype(np.float32)
        noise = rng.standard_normal((1, OUT_CH, H, W)).astype(np.float32)

        ab = torch_schedule(T)
        ref = torch_ddim_anchored(
            tm, torch.from_numpy(x_gt), torch.from_numpy(x_cond), ab,
            torch.from_numpy(noise), t_start=60, steps=8,
        ).numpy()

        sched = Schedule.cosine(T)
        fn = make_denoise_fn(
            fm.apply, variables, jnp.asarray(np.transpose(x_cond, (0, 2, 3, 1)))
        )
        got = ddim_anchored(
            fn, jnp.asarray(np.transpose(x_gt, (0, 2, 3, 1))),
            None, sched, t_start=60, steps=8,
            noise=jnp.asarray(np.transpose(noise, (0, 2, 3, 1))),
        )
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))
        np.testing.assert_allclose(got, ref, atol=2e-4)

    def test_ddim_v_grid_matches_torch(self, models, rng):
        """Round-unique-grid v sampler (η=0) vs the torch reference loop,
        identical scaled-noise init."""
        from s1s2.core import Parameterization
        from s1s2.sampling import ddim_grid_sample, round_unique_grid

        tm, fm, variables = models
        H = W = 16
        t_start, steps = 60, 7
        x_cond = rng.standard_normal((1, IN_CH, H, W)).astype(np.float32)
        noise = rng.standard_normal((1, OUT_CH, H, W)).astype(np.float32)

        ab = torch_schedule(T)
        x_init = torch.from_numpy(noise) * torch.sqrt(1 - ab[t_start])
        ref = torch_ddim_v_grid(
            tm, x_init, torch.from_numpy(x_cond), ab, t_start, steps
        ).numpy()

        sched = Schedule.cosine(T)
        grid = round_unique_grid(t_start, steps, T)
        fn = make_denoise_fn(
            fm.apply, variables, jnp.asarray(np.transpose(x_cond, (0, 2, 3, 1)))
        )
        x_init_j = jnp.asarray(np.transpose(x_init.numpy(), (0, 2, 3, 1)))
        import jax

        got = ddim_grid_sample(
            fn, x_init_j, jax.random.PRNGKey(0), sched, grid,
            Parameterization.V, eta=0.0,
        )
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))
        np.testing.assert_allclose(got, ref, atol=2e-4)

    def test_onestep_metrics_match_torch(self, models, rng):
        """Per-file MAE/MSE after one-step recon match the reference numbers."""
        tm, fm, variables = models
        H = W = 16
        x_gt = rng.uniform(0, 1, (1, OUT_CH, H, W)).astype(np.float32)
        x_cond = rng.standard_normal((1, IN_CH, H, W)).astype(np.float32)
        noise = rng.standard_normal((1, OUT_CH, H, W)).astype(np.float32)
        mask = (rng.uniform(0, 1, (1, H, W)) > 0.25).astype(np.float32)
        t_small = 20

        ab = torch_schedule(T)
        a_t = ab[t_small]
        with torch.no_grad():
            x_t = torch.sqrt(a_t) * torch.from_numpy(x_gt) + torch.sqrt(
                1 - a_t
            ) * torch.from_numpy(noise)
            eps = tm(torch.cat([x_t, torch.from_numpy(x_cond)], dim=1),
                     torch.tensor([t_small]))
            x0 = torch.clamp(
                (x_t - torch.sqrt(1 - a_t) * eps) / torch.sqrt(a_t + 1e-8), 0, 1
            )
        w = torch.from_numpy(mask).unsqueeze(1)
        num = (w * (x0 - torch.from_numpy(x_gt)).abs()).sum()
        ref_mae = (num / (w.sum() * OUT_CH + 1e-8)).item()

        sched = Schedule.cosine(T)
        fn = make_denoise_fn(
            fm.apply, variables, jnp.asarray(np.transpose(x_cond, (0, 2, 3, 1)))
        )
        got_x0 = one_step_recon(
            fn, jnp.asarray(np.transpose(x_gt, (0, 2, 3, 1))), None, sched,
            t_small=t_small, noise=jnp.asarray(np.transpose(noise, (0, 2, 3, 1))),
        )
        got_mae = float(
            masked_mae(got_x0, jnp.asarray(np.transpose(x_gt, (0, 2, 3, 1))),
                       jnp.asarray(mask))
        )
        assert got_mae == pytest.approx(ref_mae, rel=1e-4)


class TestBaselineBicubicParity:
    """baseline_bicubic is torch-exact (a=-0.75 kernel, half-pixel mapping,
    clamped taps — `Evaluation_Pure_Generation.py:348-354`), making the
    classical-baseline tables a certified parity surface."""

    @pytest.mark.parametrize("shape", [(32, 32), (64, 48)])
    def test_matches_torch_interpolate(self, shape):
        import torch.nn.functional as F

        from s1s2.eval.baselines import baseline_bicubic

        H, W = shape
        x = np.random.default_rng(3).random((2, H, W, 4)).astype(np.float32)
        got = np.asarray(baseline_bicubic(jnp.asarray(x)))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        lr = F.interpolate(xt, scale_factor=0.25, mode="bicubic",
                           align_corners=False, recompute_scale_factor=True)
        sr = F.interpolate(lr, size=(H, W), mode="bicubic",
                           align_corners=False)
        ref = torch.clamp(sr, 0, 1).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, ref, atol=2e-6)
