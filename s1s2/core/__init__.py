"""Diffusion math core: schedules, forward process, parameterization algebra."""

from s1s2.core.schedule import (
    Schedule,
    cosine_beta_schedule,
    linear_beta_schedule,
    make_schedule,
)
from s1s2.core.parametrize import (
    Parameterization,
    q_sample,
    v_from_x0_eps,
    x0_eps_from_v,
    x0_from_eps,
    eps_from_x0,
    snr,
    p2_weight,
)

__all__ = [
    "Schedule",
    "cosine_beta_schedule",
    "linear_beta_schedule",
    "make_schedule",
    "Parameterization",
    "q_sample",
    "v_from_x0_eps",
    "x0_eps_from_v",
    "x0_from_eps",
    "eps_from_x0",
    "snr",
    "p2_weight",
]
