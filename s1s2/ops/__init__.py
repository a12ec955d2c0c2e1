"""TPU op implementations: alternative lowerings + Pallas kernels for the
hot paths, benchmarked against XLA's defaults (see tests and bench notes)."""

from s1s2.ops.pixel_shuffle import ps_conv_transpose_2x2
from s1s2.ops.fused_elementwise import fused_ddim_update

__all__ = ["ps_conv_transpose_2x2", "fused_ddim_update"]
