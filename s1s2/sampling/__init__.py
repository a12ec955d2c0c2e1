"""DDIM/DDPM samplers as jit-able lax.scan loops (batched, CFG-capable)."""

from s1s2.sampling.grids import (
    linspace_grid,
    round_unique_grid,
    full_range_grid,
)
from s1s2.sampling.dpm_solver import dpm_solver_2m
from s1s2.sampling.samplers import (
    ddim_anchored,
    ddim_generate,
    ddim_grid_sample,
    ddpm_ancestral,
    partial_ddim_from_gt,
    one_step_recon,
    make_denoise_fn,
    make_cfg_denoise_fn,
)

__all__ = [
    "dpm_solver_2m",
    "linspace_grid",
    "round_unique_grid",
    "full_range_grid",
    "ddim_anchored",
    "ddim_generate",
    "ddim_grid_sample",
    "ddpm_ancestral",
    "partial_ddim_from_gt",
    "one_step_recon",
    "make_denoise_fn",
    "make_cfg_denoise_fn",
]
