"""One-way PyTorch ``.pth`` → Flax pytree weight converter.

The reference ships three trained model families as torch ``state_dict``
checkpoints (`.MISSING_LARGE_BLOBS:505-513`): ``ddpm_s1_to_s2_v3`` (ε),
``ddpm_s1_to_s2_upgraded_v`` (v), ``ddpm_s1_to_s2_cfg_v`` (CFG-v), each with
``_best`` / ``_last`` variants saved under EMA weights
(`Train_Orignal.py:324-335`). This module maps those state_dicts onto the
NHWC Flax ``UNetSmall`` so published PSNR/SSIM numbers can be validated on
TPU (BASELINE.md).

Layout translation:
* ``nn.Conv2d``          OIHW → HWIO  (transpose (2,3,1,0))
* ``nn.ConvTranspose2d`` (in, out, kH, kW), *adjoint-of-conv* semantics →
  flax ``nn.ConvTranspose`` (kH, kW, in, out), *fractionally-strided-conv*
  semantics. The adjoint applies the kernel as a scatter; the fractionally
  strided conv correlates, so the spatial taps must be FLIPPED:
  ``W_flax[h,w,i,o] = W_pt[i,o,kH-1-h,kW-1-w]``.
  (Verified bit-for-bit against torch in tests/test_model_parity.py.)

Key naming derives from the reference module tree (`Train_Orignal.py:110-124`):
``inc.0``, ``down{k}.0.{0,2}``, ``up{k}``, ``conv{k}.{0,2}``, ``outc``.
Loading tolerates ``{"model": ...}`` / ``{"state_dict": ...}`` wrappers
(`Evaluation/Onestep_v_Prediction.py:153-157`).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _conv(w: np.ndarray) -> np.ndarray:
    """OIHW → HWIO."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _conv_transpose(w: np.ndarray) -> np.ndarray:
    """(in, out, kH, kW) adjoint kernel → (kH, kW, in, out) flipped."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def _block(sd: Mapping[str, np.ndarray], prefix: str) -> Dict:
    """A reference conv_block = Sequential(Conv, ReLU, Conv, ReLU) →
    our `_DoubleConv` {conv1, conv2}."""
    return {
        "conv1": {
            "kernel": _conv(sd[f"{prefix}.0.weight"]),
            "bias": np.asarray(sd[f"{prefix}.0.bias"]),
        },
        "conv2": {
            "kernel": _conv(sd[f"{prefix}.2.weight"]),
            "bias": np.asarray(sd[f"{prefix}.2.bias"]),
        },
    }


def torch_state_dict_to_params(state_dict: Mapping) -> Dict:
    """Convert a reference UNetSmall ``state_dict`` to Flax ``{'params': ...}``.

    Accepts torch tensors or numpy arrays as values; returns float32 numpy
    leaves (wrap with ``jax.device_put`` / use directly in ``apply``).
    """
    sd = {}
    for k, v in dict(state_dict).items():
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        sd[k] = arr.astype(np.float32)

    params = {
        "inc": {
            "kernel": _conv(sd["inc.0.weight"]),
            "bias": sd["inc.0.bias"],
        },
        "outc": {
            "kernel": _conv(sd["outc.weight"]),
            "bias": sd["outc.bias"],
        },
    }
    for k in (1, 2, 3):
        # encoder stage: down{k} = Sequential(conv_block, MaxPool) → keys down{k}.0.*
        params[f"down{k}"] = _block(sd, f"down{k}.0")
        # decoder stage
        params[f"up{k}"] = {
            "kernel": _conv_transpose(sd[f"up{k}.weight"]),
            "bias": sd[f"up{k}.bias"],
        }
        params[f"conv{k}"] = _block(sd, f"conv{k}")
    return {"params": params}


def unwrap_state_dict(obj) -> Mapping:
    """Tolerate {"model": sd} / {"state_dict": sd} wrappers
    (`Evaluation/Onestep_v_Prediction.py:153-157`)."""
    if isinstance(obj, Mapping):
        for key in ("model", "state_dict"):
            inner = obj.get(key)
            if isinstance(inner, Mapping) and any(
                hasattr(v, "shape") for v in inner.values()
            ):
                return inner
    return obj


def load_pth_checkpoint(path: str) -> Dict:
    """Load a reference ``.pth`` file and convert to Flax params.

    Requires torch (CPU build is enough); import is local so the rest of the
    framework never depends on torch.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    return torch_state_dict_to_params(unwrap_state_dict(obj))


def infer_arch_from_state_dict(state_dict: Mapping) -> Dict[str, int]:
    """Recover (in_ch, out_ch, base_ch) from checkpoint shapes."""
    sd = unwrap_state_dict(state_dict)
    w_inc = sd["inc.0.weight"]
    w_out = sd["outc.weight"]
    shape = getattr(w_inc, "shape", None)
    base_ch, in_ch_p1 = int(shape[0]), int(shape[1])
    return {
        "in_ch": in_ch_p1 - 1,  # the +1 is the timestep channel
        "out_ch": int(w_out.shape[0]),
        "base_ch": base_ch,
    }
