"""s1s2 — TPU-native Sentinel-1 → Sentinel-2 diffusion super-resolution framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
project ``ChenghanXia/S1-to-S2_Super-Resolution_Project-Code`` (14 standalone
PyTorch scripts; see SURVEY.md).  The duplicated core of the reference —
schedule, UNet denoiser, samplers, metrics, data pipeline — is factored into
one library whose compute path is jitted, scanned and sharded for TPU.

Layer map (mirrors SURVEY.md §1):

    s1s2.core       — diffusion math: schedules, q_sample, eps/v/x0 algebra
    s1s2.models     — Flax UNetSmall denoiser (NHWC) + .pth weight converter
    s1s2.ops        — Pallas TPU kernels for fused hot ops
    s1s2.parallel   — device mesh, shardings, data-parallel utilities
    s1s2.data       — patch extraction pipeline, npz dataset, batched loader
    s1s2.train      — jitted train steps (eps/v), EMA, checkpointing
    s1s2.sampling   — DDIM/DDPM samplers as lax.scan loops (incl. CFG)
    s1s2.eval       — metrics, streaming accumulators, eval harness, baselines
    s1s2.viz        — host-side PNG/panel rendering
    s1s2.cli        — thin argparse entry points mirroring the reference CLIs
"""

__version__ = "0.1.0"
