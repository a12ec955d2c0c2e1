"""Denoiser models and PyTorch checkpoint conversion."""

from s1s2.models.unet import UNetSmall, count_params
from s1s2.models.convert import torch_state_dict_to_params, load_pth_checkpoint

__all__ = [
    "UNetSmall",
    "count_params",
    "torch_state_dict_to_params",
    "load_pth_checkpoint",
]
