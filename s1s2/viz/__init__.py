"""Host-side visualization (numpy/PIL)."""

from s1s2.viz.render import (
    percentile_stretch_uint8,
    make_rgb,
    true_color,
    cir_color,
    save_rgb_triplet,
    stretch_fixed,
    per_image_lo_hi,
    dataset_fixed_lo_hi,
    s1_preview,
    hstack_compare,
    save_pred_gt,
    save_panel,
)

__all__ = [
    "percentile_stretch_uint8",
    "make_rgb",
    "true_color",
    "cir_color",
    "save_rgb_triplet",
    "stretch_fixed",
    "per_image_lo_hi",
    "dataset_fixed_lo_hi",
    "s1_preview",
    "hstack_compare",
    "save_pred_gt",
    "save_panel",
]
