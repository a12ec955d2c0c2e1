"""Torch twin of UNetSmall — EXISTS ONLY FOR PARITY VALIDATION.

The framework's compute path never uses torch; this module reconstructs a
PyTorch module with the reference's state_dict key layout
(`Train_Orignal.py:94-148`: Sequential indices → keys like ``inc.0.weight``,
``down1.0.0.weight``) so that, given a real reference ``.pth``, we can run
the original forward next to the converted-JAX forward and certify the
converter end-to-end (BASELINE.md requires PSNR within 0.1 dB of the torch
reference; the checkpoint blobs are stripped from this snapshot, so the
harness is validated against freshly initialized torch weights in tests).
"""

from __future__ import annotations

from typing import Dict


def build_torch_unet(in_ch: int, out_ch: int, base_ch: int):
    """Torch module whose state_dict keys/shapes match the reference."""
    import torch
    import torch.nn as nn

    def block(cin, cout):
        return nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1), nn.ReLU(),
            nn.Conv2d(cout, cout, 3, padding=1), nn.ReLU(),
        )

    class TorchTwin(nn.Module):
        def __init__(self):
            super().__init__()
            b = base_ch
            self.inc = nn.Sequential(nn.Conv2d(in_ch + 1, b, 3, padding=1), nn.ReLU())
            self.down1 = nn.Sequential(block(b, b * 2), nn.MaxPool2d(2))
            self.down2 = nn.Sequential(block(b * 2, b * 4), nn.MaxPool2d(2))
            self.down3 = nn.Sequential(block(b * 4, b * 8), nn.MaxPool2d(2))
            self.up3 = nn.ConvTranspose2d(b * 8, b * 4, 2, stride=2)
            self.conv3 = block(b * 8, b * 4)
            self.up2 = nn.ConvTranspose2d(b * 4, b * 2, 2, stride=2)
            self.conv2 = block(b * 4, b * 2)
            self.up1 = nn.ConvTranspose2d(b * 2, b, 2, stride=2)
            self.conv1 = block(b * 2, b)
            self.outc = nn.Conv2d(b, out_ch, 1)

        def forward(self, x, t):
            B, _, H, W = x.shape
            tm = t.view(B, 1, 1, 1).float().expand(B, 1, H, W)
            h = torch.cat([x, tm], dim=1)
            e1 = self.inc(h)
            e2 = self.down1(e1)
            e3 = self.down2(e2)
            e4 = self.down3(e3)
            d3 = self.conv3(torch.cat([self.up3(e4), e3], dim=1))
            d2 = self.conv2(torch.cat([self.up2(d3), e2], dim=1))
            d1 = self.conv1(torch.cat([self.up1(d2), e1], dim=1))
            return self.outc(d1)

    return TorchTwin()


def validate_pth_parity(
    pth_path: str,
    image_size: int = 64,
    batch: int = 2,
    seed: int = 0,
) -> Dict[str, float]:
    """Load a reference ``.pth``, run torch forward vs converted-JAX forward
    on identical random inputs → deviation report.

    Returns {max_abs, mean_abs, rel, in_ch, out_ch, base_ch}; max_abs should
    be ≲1e-4 at f32 (converter contract, tests/test_model_parity.py)."""
    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    # TPU "f32" convs default to bf16 passes; certification needs true f32
    jax.config.update("jax_default_matmul_precision", "highest")

    from s1s2.models.convert import (
        infer_arch_from_state_dict,
        torch_state_dict_to_params,
        unwrap_state_dict,
    )
    from s1s2.models.unet import UNetSmall

    sd = unwrap_state_dict(torch.load(pth_path, map_location="cpu",
                                      weights_only=True))
    arch = infer_arch_from_state_dict(sd)
    tm = build_torch_unet(**arch)
    tm.load_state_dict(sd, strict=True)
    tm.eval()

    rng = np.random.default_rng(seed)
    x = rng.standard_normal(
        (batch, arch["in_ch"], image_size, image_size)
    ).astype(np.float32)
    t = rng.integers(0, 1000, batch)

    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(t)).numpy()

    variables = torch_state_dict_to_params(sd)
    fm = UNetSmall(out_ch=arch["out_ch"], base_ch=arch["base_ch"],
                   compute_dtype=jnp.float32)
    got = fm.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                   jnp.asarray(t))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))

    diff = np.abs(got - ref)
    scale = np.abs(ref).mean() + 1e-12
    return {
        "max_abs": float(diff.max()),
        "mean_abs": float(diff.mean()),
        "rel": float(diff.mean() / scale),
        **{k: float(v) for k, v in arch.items()},
    }
