"""PNG rendering utilities (host-side numpy + PIL).

Covers every visualization style in the reference (SURVEY.md §2 item 32):
percentile 2–98 stretch previews (`Patch.py:64-78`), true-color/CIR triplets
(`Evaluation/Onestep.py:56-70`), per-image and dataset-fixed ranges
(`Evaluation/Onestep_v_Prediction.py:95-123`,
`Evaluation/Limitation_Test_v_Prediction.py:160-198`), S1 heuristic RGB and
multi-tile comparison panels with top-k-error zoom crops
(`Evaluation/Comparison_Original.py:77-200`), and side-by-side compare
strips (`Evaluation/Limitation_Test.py:179-197`).

All inputs are channels-last numpy (H, W, C); band order [B2, B3, B4, B8].
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image, ImageDraw


def percentile_stretch_uint8(a: np.ndarray, p_lo: float = 2, p_hi: float = 98) -> np.ndarray:
    """2–98 percentile stretch → uint8 (`Patch.py:64-71`)."""
    a = np.nan_to_num(np.asarray(a, np.float32), nan=0.0, posinf=0.0, neginf=0.0)
    lo, hi = np.percentile(a, [p_lo, p_hi])
    if hi - lo < 1e-6:
        hi = lo + 1.0
    return (np.clip((a - lo) / (hi - lo), 0, 1) * 255).astype(np.uint8)


def make_rgb(b1, b2, b3) -> np.ndarray:
    return np.dstack([percentile_stretch_uint8(b) for b in (b1, b2, b3)])


def true_color(t4_hwc: np.ndarray) -> np.ndarray:
    """True color = (B4, B3, B2) (`Evaluation/Onestep.py:64-70`)."""
    return make_rgb(t4_hwc[..., 2], t4_hwc[..., 1], t4_hwc[..., 0])


def cir_color(t4_hwc: np.ndarray) -> np.ndarray:
    """CIR = (B8, B4, B3)."""
    return make_rgb(t4_hwc[..., 3], t4_hwc[..., 2], t4_hwc[..., 1])


def save_rgb_triplet(t4_hwc: np.ndarray, path_true: str, path_cir: str) -> None:
    Image.fromarray(true_color(t4_hwc)).save(path_true)
    Image.fromarray(cir_color(t4_hwc)).save(path_cir)


# -- fixed-range rendering -----------------------------------------------------


def stretch_fixed(x_hwc: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Per-band fixed [lo,hi] → uint8 (H,W,C)
    (`Evaluation/Onestep_v_Prediction.py:95-103`)."""
    y = (x_hwc - lo[None, None, :]) / (hi - lo + 1e-8)[None, None, :]
    return (np.clip(y, 0, 1) * 255).astype(np.uint8)


def per_image_lo_hi(gt_hwc: np.ndarray, q_low=2.0, q_high=98.0):
    """GT-derived per-band ranges (`Evaluation/Onestep_v_Prediction.py:105-116`)."""
    C = gt_hwc.shape[-1]
    lo = np.array([np.percentile(gt_hwc[..., c], q_low) for c in range(C)], np.float32)
    hi = np.array([np.percentile(gt_hwc[..., c], q_high) for c in range(C)], np.float32)
    hi = np.where(hi - lo < 1e-6, lo + 1.0, hi)
    return lo, hi


def dataset_fixed_lo_hi(gts: Sequence[np.ndarray], q_low=1.0, q_high=99.0):
    """Dataset-wide per-band min/max of per-image percentiles
    (`Evaluation/Limitation_Test_v_Prediction.py:160-180`)."""
    lo = hi = None
    for g in gts:
        l, h = per_image_lo_hi(g, q_low, q_high)
        lo = l if lo is None else np.minimum(lo, l)
        hi = h if hi is None else np.maximum(hi, h)
    hi = np.where(hi - lo < 1e-6, lo + 1.0, hi)
    return lo.astype(np.float32), hi.astype(np.float32)


def fixed_true_cir(t4_hwc: np.ndarray, lo, hi):
    u8 = stretch_fixed(t4_hwc, lo, hi)
    return (
        np.dstack([u8[..., 2], u8[..., 1], u8[..., 0]]),
        np.dstack([u8[..., 3], u8[..., 2], u8[..., 1]]),
    )


# -- composite views -----------------------------------------------------------


def s1_preview(cond_hwc: np.ndarray) -> np.ndarray:
    """Heuristic SAR RGB (`Evaluation/Comparison_Original.py:77-88`)."""
    C = cond_hwc.shape[-1]
    st = percentile_stretch_uint8
    if C == 2:
        return np.dstack([st(cond_hwc[..., 0]), st(cond_hwc[..., 1]), st(cond_hwc[..., 0])])
    if C == 1:
        ch = st(cond_hwc[..., 0])
        return np.dstack([ch, ch, ch])
    return np.dstack([st(cond_hwc[..., i]) for i in range(3)])


def hstack_compare(left_u8: np.ndarray, right_u8: np.ndarray, gap: int = 6) -> np.ndarray:
    """Side-by-side strip (`Evaluation/Limitation_Test.py:179-184`)."""
    h, w, _ = left_u8.shape
    canvas = np.full((h, w * 2 + gap, 3), 255, np.uint8)
    canvas[:, :w] = left_u8
    canvas[:, w + gap :] = right_u8
    return canvas


def save_pred_gt(pred_hwc: np.ndarray, gt_hwc: np.ndarray, out_dir: str, stem: str) -> None:
    """Six-file pred/GT set (`Evaluation/Limitation_Test.py:186-197`)."""
    os.makedirs(out_dir, exist_ok=True)
    pt, pc = true_color(pred_hwc), cir_color(pred_hwc)
    gt, gc = true_color(gt_hwc), cir_color(gt_hwc)
    Image.fromarray(pt).save(os.path.join(out_dir, f"{stem}_pred_true.png"))
    Image.fromarray(gt).save(os.path.join(out_dir, f"{stem}_gt_true.png"))
    Image.fromarray(pc).save(os.path.join(out_dir, f"{stem}_pred_cir.png"))
    Image.fromarray(gc).save(os.path.join(out_dir, f"{stem}_gt_cir.png"))
    Image.fromarray(hstack_compare(pt, gt)).save(
        os.path.join(out_dir, f"{stem}_compare_true.png")
    )
    Image.fromarray(hstack_compare(pc, gc)).save(
        os.path.join(out_dir, f"{stem}_compare_cir.png")
    )


def _resize_width(im: np.ndarray, width: int) -> np.ndarray:
    h, w = im.shape[:2]
    if w == width:
        return im
    return np.array(
        Image.fromarray(im).resize((width, int(h * width / w)), Image.BILINEAR)
    )


def save_panel(
    pred_hwc: np.ndarray,
    gt_hwc: Optional[np.ndarray],
    cond_hwc: np.ndarray,
    out_path: str,
    title: str = "",
    zoom: int = 0,
    zoom_k: int = 0,
    tile_width: int = 512,
    rng_seed: int = 0,
) -> None:
    """2×3 comparison panel (S1 | GT | Pred | CIR | error) with optional
    top-k-error zoom crops (`Evaluation/Comparison_Original.py:90-200`).
    Window search is deterministic here (seeded) unlike the reference's
    global `random`."""
    s1_rgb = s1_preview(cond_hwc)
    pred_true, pred_cir = true_color(pred_hwc), cir_color(pred_hwc)
    if gt_hwc is not None:
        gt_true, gt_cir = true_color(gt_hwc), cir_color(gt_hwc)
        err_map = np.abs(pred_hwc - gt_hwc).mean(axis=-1)
        err_u8 = percentile_stretch_uint8(err_map)
        err_img = np.dstack([err_u8] * 3)
        row1 = [s1_rgb, gt_true, pred_true]
        row2 = [gt_cir, pred_cir, err_img]
    else:
        row1 = [s1_rgb, pred_true, pred_cir]
        row2 = None

    def hstack(ims: List[np.ndarray]) -> np.ndarray:
        ims = [_resize_width(im, tile_width) for im in ims]
        h = max(im.shape[0] for im in ims)
        ims = [
            np.array(Image.fromarray(im).resize((im.shape[1], h), Image.BILINEAR))
            if im.shape[0] != h
            else im
            for im in ims
        ]
        return np.concatenate(ims, axis=1)

    panel = hstack(row1)
    if row2 is not None:
        panel = np.concatenate([panel, hstack(row2)], axis=0)

    canvas = Image.fromarray(panel)
    if title:
        ImageDraw.Draw(canvas).text((10, 5), title, fill=(255, 255, 0))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    canvas.save(out_path)

    if zoom > 0 and zoom_k > 0 and gt_hwc is not None:
        err = np.abs(pred_hwc - gt_hwc).mean(axis=-1)
        H, W = err.shape
        rng = np.random.default_rng(rng_seed)
        scores = []
        for _ in range(1000):
            i = int(rng.integers(0, max(1, H - zoom + 1)))
            j = int(rng.integers(0, max(1, W - zoom + 1)))
            scores.append((float(err[i : i + zoom, j : j + zoom].mean()), i, j))
        scores.sort(reverse=True)
        for k in range(min(zoom_k, len(scores))):
            _, i, j = scores[k]

            def crop_save(arr_u8: np.ndarray, name: str):
                crop = Image.fromarray(arr_u8).crop((j, i, j + zoom, i + zoom))
                crop = crop.resize((zoom * 2, zoom * 2), Image.NEAREST)
                crop.save(out_path.replace(".png", f"_{name}_zoom{k}.png"))

            crop_save(s1_rgb, "s1")
            crop_save(gt_true, "gt_true")
            crop_save(pred_true, "pred_true")
