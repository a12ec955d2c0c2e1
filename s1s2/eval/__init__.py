"""Evaluation: metrics, streaming accumulators, harness, baselines."""

from s1s2.eval.metrics import (
    masked_mae,
    masked_mse,
    masked_mae_per_sample,
    masked_mse_per_sample,
    psnr,
    ssim_simple,
    sam,
    ergas,
    channelwise_error_sums,
    aggregate_final,
    eps_diagnostics,
    v_diagnostics,
)

__all__ = [
    "masked_mae",
    "masked_mse",
    "masked_mae_per_sample",
    "masked_mse_per_sample",
    "psnr",
    "ssim_simple",
    "sam",
    "ergas",
    "channelwise_error_sums",
    "aggregate_final",
    "eps_diagnostics",
    "v_diagnostics",
]
