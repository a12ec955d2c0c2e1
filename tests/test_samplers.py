"""Sampler regression tests.

Each lax.scan driver is compared against a naive Python step-by-step loop
written directly from the reference formulas (cited per test), using a fixed
nonlinear fake denoiser — validating grid construction, coefficient
alignment, final-step handling and clamping.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s1s2.core import Parameterization, Schedule
from s1s2.sampling import (
    ddim_anchored,
    ddim_generate,
    ddim_grid_sample,
    ddpm_ancestral,
    full_range_grid,
    linspace_grid,
    make_cfg_denoise_fn,
    make_denoise_fn,
    one_step_recon,
    partial_ddim_from_gt,
    round_unique_grid,
)
from s1s2.sampling.samplers import scaled_noise_init

T = 100
SCHED = Schedule.cosine(T)
SHAPE = (2, 8, 8, 4)


def fake_denoise(x_t, t):
    """Deterministic, nonlinear, t-dependent stand-in for the UNet."""
    tt = t.astype(jnp.float32).reshape(-1, 1, 1, 1) / T
    return jnp.tanh(x_t) * 0.7 - 0.2 * tt + 0.05


class TestGrids:
    def test_linspace_truncates_like_torch(self):
        import torch

        for t_start, steps in [(20, 7), (99, 10), (50, 50)]:
            ours = linspace_grid(t_start, steps, T)
            ref = torch.linspace(t_start, 0, steps + 1, dtype=torch.long).numpy()
            np.testing.assert_array_equal(ours, ref)

    def test_round_unique_matches_torch(self):
        import torch

        for t_hi, steps in [(20, 30), (99, 10), (37, 5)]:
            ours = round_unique_grid(t_hi, steps, T)
            g = torch.linspace(0, t_hi, steps)
            idxs = torch.unique(torch.round(g).to(torch.long), sorted=True)
            if idxs[-1].item() != t_hi:
                idxs = torch.unique(torch.cat([idxs, torch.tensor([t_hi])]), sorted=True)
            np.testing.assert_array_equal(ours, idxs.numpy())

    def test_full_range(self):
        g = full_range_grid(T, 10)
        assert g[0] == 0 and g[-1] == T - 1 and np.all(np.diff(g) > 0)


def naive_ddim_anchored(x_gt, noise, ab, t_start, steps):
    """Reference loop `Evaluation/DDIM_Multi-step.py:116-137` (numpy)."""
    t_start = max(1, min(t_start, len(ab) - 1))
    a_t = ab[t_start]
    x_t = np.sqrt(a_t) * x_gt + np.sqrt(1 - a_t) * noise
    ts = np.linspace(t_start, 0, steps + 1).astype(np.int64)
    x0_hat = None
    for i in range(steps):
        a_cur, a_next = ab[ts[i]], ab[ts[i + 1]]
        eps = np.asarray(fake_denoise(jnp.asarray(x_t), jnp.full((x_t.shape[0],), ts[i])))
        x0_hat = (x_t - np.sqrt(1 - a_cur) * eps) / np.sqrt(a_cur + 1e-8)
        x_t = np.sqrt(a_next) * x0_hat + np.sqrt(1 - a_next) * eps
    return np.clip(x0_hat, 0.0, 1.0)


class TestDDIMLinspace:
    @pytest.mark.parametrize("t_start,steps", [(50, 10), (99, 20), (20, 3)])
    def test_anchored_matches_naive(self, rng, t_start, steps):
        x_gt = rng.uniform(0, 1, SHAPE).astype(np.float32)
        key = jax.random.PRNGKey(42)
        got = np.asarray(
            ddim_anchored(fake_denoise, jnp.asarray(x_gt), key, SCHED, t_start, steps)
        )
        noise = np.asarray(jax.random.normal(key, SHAPE, jnp.float32))
        expect = naive_ddim_anchored(x_gt, noise, SCHED.alpha_bar_np(), t_start, steps)
        np.testing.assert_allclose(got, expect, atol=1e-4)

    def test_generate_matches_naive(self):
        key = jax.random.PRNGKey(7)
        got = np.asarray(ddim_generate(fake_denoise, SHAPE, key, SCHED, 99, 10))
        # naive: pure-noise init then the same linspace loop
        x_t = np.asarray(jax.random.normal(key, SHAPE, jnp.float32))
        ab = SCHED.alpha_bar_np()
        ts = np.linspace(99, 0, 11).astype(np.int64)
        x0 = None
        for i in range(10):
            a_cur, a_next = ab[ts[i]], ab[ts[i + 1]]
            eps = np.asarray(fake_denoise(jnp.asarray(x_t), jnp.full((2,), ts[i])))
            x0 = (x_t - np.sqrt(1 - a_cur) * eps) / np.sqrt(a_cur + 1e-8)
            x_t = np.sqrt(a_next) * x0 + np.sqrt(1 - a_next) * eps
        np.testing.assert_allclose(got, np.clip(x0, 0, 1), atol=1e-4)

    def test_jittable(self):
        f = jax.jit(
            lambda k: ddim_anchored(
                fake_denoise, jnp.zeros(SHAPE), k, SCHED, 50, 5
            )
        )
        out = f(jax.random.PRNGKey(0))
        assert out.shape == SHAPE and bool(jnp.isfinite(out).all())


def naive_grid_v(x_t, ab, grid, eta=0.0):
    """Reference loop `Evaluation/DDIM_Multi-step_v_Prediction.py:155-175`."""
    x_t = x_t.copy()
    for i in reversed(range(len(grid))):
        t = int(grid[i])
        a_cur = ab[t]
        v = np.asarray(fake_denoise(jnp.asarray(x_t), jnp.full((x_t.shape[0],), t)))
        sab, s1m = np.sqrt(a_cur), np.sqrt(1 - a_cur)
        x0 = sab * x_t - s1m * v
        eps = s1m * x_t + sab * v
        if i == 0:
            x_t = x0
        else:
            a_prev = ab[int(grid[i - 1])]
            assert eta == 0.0
            x_t = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps
    return np.clip(x_t, 0.0, 1.0)


def naive_grid_eps(x_t, ab, grid):
    """Reference loop `Evaluation/Limitation_Test.py:238-249`."""
    x_t = x_t.copy()
    for i in reversed(range(len(grid))):
        t = int(grid[i])
        a_t = ab[t]
        eps = np.asarray(fake_denoise(jnp.asarray(x_t), jnp.full((x_t.shape[0],), t)))
        x0 = (x_t - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t + 1e-8)
        if i == 0:
            x_t = x0
        else:
            a_prev = ab[int(grid[i - 1])]
            x_t = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps
    return np.clip(x_t, 0.0, 1.0)


class TestDDIMGrid:
    def test_v_param_matches_naive(self):
        key = jax.random.PRNGKey(3)
        grid = round_unique_grid(80, 15, T)
        x_init = scaled_noise_init(key, SHAPE, SCHED, 80)
        got = np.asarray(
            ddim_grid_sample(
                fake_denoise, x_init, key, SCHED, grid, Parameterization.V, eta=0.0
            )
        )
        expect = naive_grid_v(np.asarray(x_init), SCHED.alpha_bar_np(), grid)
        np.testing.assert_allclose(got, expect, atol=1e-4)

    def test_eps_full_range_matches_naive(self):
        key = jax.random.PRNGKey(9)
        grid = full_range_grid(T, 12)
        x_init = jax.random.normal(key, SHAPE, jnp.float32)
        got = np.asarray(
            ddim_grid_sample(
                fake_denoise, x_init, key, SCHED, grid, Parameterization.EPS, eta=0.0
            )
        )
        expect = naive_grid_eps(np.asarray(x_init), SCHED.alpha_bar_np(), grid)
        np.testing.assert_allclose(got, expect, atol=1e-4)

    def test_eta_reproducible_and_stochastic(self):
        grid = round_unique_grid(80, 10, T)
        x_init = scaled_noise_init(jax.random.PRNGKey(0), SHAPE, SCHED, 80)
        run = lambda k: np.asarray(
            ddim_grid_sample(
                fake_denoise, x_init, k, SCHED, grid, Parameterization.V, eta=0.5
            )
        )
        a, b = run(jax.random.PRNGKey(1)), run(jax.random.PRNGKey(1))
        c = run(jax.random.PRNGKey(2))
        np.testing.assert_array_equal(a, b)
        assert np.abs(a - c).max() > 1e-6


class TestDDPM:
    def test_runs_and_bounded(self):
        out = np.asarray(
            ddpm_ancestral(fake_denoise, SHAPE, jax.random.PRNGKey(0), SCHED)
        )
        assert out.shape == SHAPE
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_v_param_runs(self):
        out = np.asarray(
            ddpm_ancestral(
                fake_denoise, SHAPE, jax.random.PRNGKey(0), SCHED, Parameterization.V
            )
        )
        assert np.isfinite(out).all()

    def test_noise_replay_matches_keyed_run(self):
        """Feeding the keyed run's own draws through the replay path must
        reproduce it to float rounding (same consumption order as
        `Evaluation/Limitation_Test.py:209-224`: init + one draw per t>0;
        the two compiled programs may fuse mean+scale*z differently, so
        equality is up to per-step FMA rounding, ~4e-7 over T=100)."""
        key = jax.random.PRNGKey(7)
        keyed = np.asarray(ddpm_ancestral(fake_denoise, SHAPE, key, SCHED))
        keys = jax.random.split(key, T + 1)
        stream = jnp.stack(
            [jax.random.normal(keys[0], SHAPE, jnp.float32)]
            + [jax.random.normal(k, SHAPE, jnp.float32) for k in keys[1:T]]
        )
        replay = np.asarray(
            ddpm_ancestral(fake_denoise, SHAPE, jax.random.PRNGKey(999), SCHED,
                           noise=stream)
        )
        np.testing.assert_allclose(keyed, replay, atol=1e-5)

    def test_noise_replay_shape_validated(self):
        bad = jnp.zeros((T - 1,) + SHAPE, jnp.float32)
        with pytest.raises(ValueError):
            ddpm_ancestral(fake_denoise, SHAPE, jax.random.PRNGKey(0), SCHED,
                           noise=bad)


class TestDiagnostics:
    def test_partial_reverse_near_gt_for_small_k(self, rng):
        x_gt = rng.uniform(0.2, 0.8, SHAPE).astype(np.float32)
        out = np.asarray(
            partial_ddim_from_gt(
                fake_denoise, jnp.asarray(x_gt), jax.random.PRNGKey(0), SCHED, k=3
            )
        )
        # k=3 adds little noise; even a bad model can't drift far
        assert np.abs(out - x_gt).mean() < 0.3

    def test_one_step_t0_identity(self, rng):
        """t→0 ⇒ x0̂ → GT regardless of model (`Evaluation/Onestep.py:133-147`)."""
        x_gt = rng.uniform(0.2, 0.8, SHAPE).astype(np.float32)
        out = np.asarray(
            one_step_recon(
                fake_denoise, jnp.asarray(x_gt), jax.random.PRNGKey(0), SCHED, t_small=1
            )
        )
        assert np.abs(out - x_gt).mean() < 0.05


class TestCFG:
    def test_guidance_one_equals_cond(self, rng):
        cond = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
        apply_fn = lambda variables, x, t: jnp.tanh(x[..., :4]) + t.astype(
            jnp.float32
        ).reshape(-1, 1, 1, 1) * 0.01

        plain = make_denoise_fn(apply_fn, {}, cond)
        cfg1 = make_cfg_denoise_fn(apply_fn, {}, cond, guidance_scale=1.0)
        x = jnp.asarray(rng.standard_normal(SHAPE).astype(np.float32))
        t = jnp.array([5, 50])
        np.testing.assert_allclose(
            np.asarray(plain(x, t)), np.asarray(cfg1(x, t)), atol=1e-5
        )

    def test_guidance_zero_equals_uncond(self, rng):
        cond = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
        apply_fn = lambda variables, x, t: x[..., :4] * 0.5 + x[..., 4:7].sum(
            -1, keepdims=True
        )
        cfg0 = make_cfg_denoise_fn(apply_fn, {}, cond, guidance_scale=0.0)
        null = make_denoise_fn(apply_fn, {}, jnp.zeros_like(cond))
        x = jnp.asarray(rng.standard_normal(SHAPE).astype(np.float32))
        t = jnp.array([5, 50])
        np.testing.assert_allclose(
            np.asarray(cfg0(x, t)), np.asarray(null(x, t)), atol=1e-5
        )
