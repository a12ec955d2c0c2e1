"""DPM-Solver++(2M) correctness: must track the probability-flow ODE better
than DDIM at equal step counts (DDIM is the 1st-order solver of the same
ODE; a dense stride-1 DDIM is the ground-truth trajectory)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s1s2.core import Parameterization, Schedule
from s1s2.sampling import ddim_grid_sample, round_unique_grid
from s1s2.sampling.dpm_solver import dpm_solver_2m

T = 200
SCHED = Schedule.cosine(T)
SHAPE = (1, 8, 8, 4)


def fake_denoise(x_t, t):
    tt = t.astype(jnp.float32).reshape(-1, 1, 1, 1) / T
    return jnp.tanh(0.8 * x_t) * (0.6 + 0.3 * tt) + 0.05


@pytest.fixture(scope="module")
def reference_solution():
    """Dense DDIM (stride-1 from T-1) ≈ exact ODE solution."""
    key = jax.random.PRNGKey(0)
    x_init = jax.random.normal(key, SHAPE, jnp.float32)
    grid = np.arange(0, T)  # every step
    out = ddim_grid_sample(
        fake_denoise, x_init, key, SCHED, grid, Parameterization.EPS, eta=0.0,
        clip=(-10.0, 10.0),
    )
    return np.asarray(out), x_init


@pytest.mark.parametrize("steps", [8, 16])
def test_dpm2m_beats_ddim_at_equal_steps(reference_solution, steps):
    ref, x_init = reference_solution
    grid = round_unique_grid(T - 1, steps, T)
    key = jax.random.PRNGKey(0)
    ddim = np.asarray(
        ddim_grid_sample(fake_denoise, x_init, key, SCHED, grid,
                         Parameterization.EPS, clip=(-10.0, 10.0))
    )
    dpm = np.asarray(
        dpm_solver_2m(fake_denoise, x_init, SCHED, grid,
                      Parameterization.EPS, clip=(-10.0, 10.0))
    )
    err_ddim = np.abs(ddim - ref).mean()
    err_dpm = np.abs(dpm - ref).mean()
    assert err_dpm < err_ddim, (err_dpm, err_ddim)


def test_dpm2m_v_param_runs_and_bounded():
    grid = round_unique_grid(T - 1, 10, T)
    x_init = jax.random.normal(jax.random.PRNGKey(1), SHAPE, jnp.float32)
    out = np.asarray(
        dpm_solver_2m(fake_denoise, x_init, SCHED, grid, Parameterization.V)
    )
    assert out.shape == SHAPE
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert np.isfinite(out).all()


def test_dpm2m_jittable():
    grid = round_unique_grid(T - 1, 6, T)
    f = jax.jit(
        lambda x: dpm_solver_2m(fake_denoise, x, SCHED, grid, Parameterization.EPS)
    )
    out = f(jnp.zeros(SHAPE))
    assert bool(jnp.isfinite(out).all())
