"""Patch pipeline tests on synthetic .npy rasters (rasterio-free)."""

import json
import os

import numpy as np
import pytest

from s1s2.data.patchify import (
    PatchifyConfig,
    build_mask,
    dark_fraction,
    laplacian_var,
    maybe_scale_s2_to_01,
    patch_iter,
    run_patchify,
    scene_window_stats,
    zscore,
)


class TestPrimitives:
    def test_maybe_scale(self):
        band = np.full((8, 8), 5000.0, np.float32)
        out = maybe_scale_s2_to_01(band)
        assert out.max() == pytest.approx(0.5)
        band01 = np.full((8, 8), 0.3, np.float32)
        np.testing.assert_allclose(maybe_scale_s2_to_01(band01), band01)
        allnan = np.full((4, 4), np.nan, np.float32)
        assert maybe_scale_s2_to_01(allnan).sum() == 0

    def test_build_mask(self):
        inputs = np.ones((2, 4, 4), np.float32)
        target = np.ones((2, 4, 4), np.float32)
        inputs[0, 0, 0] = np.nan
        colloc = np.ones((4, 4), np.float32)
        colloc[1, 1] = 0
        m = build_mask(inputs, target, colloc)
        assert not m[0, 0] and not m[1, 1] and m[2, 2]

    def test_zscore(self, rng):
        x = rng.standard_normal((32, 32)).astype(np.float32) * 5 + 3
        m = np.ones((32, 32), bool)
        z = zscore(x, m)
        assert abs(z.mean()) < 1e-5 and abs(z.std() - 1) < 1e-4
        # degenerate: constant field → sigma 1
        z2 = zscore(np.ones((4, 4), np.float32), np.ones((4, 4), bool))
        assert np.allclose(z2, 0)

    def test_dark_fraction(self):
        Y = np.zeros((4, 8, 8), np.float32)  # all dark
        M = np.ones((8, 8), bool)
        assert dark_fraction(Y, M) == 1.0
        Y[:] = 0.5
        assert dark_fraction(Y, M) == 0.0
        assert dark_fraction(Y, np.zeros((8, 8), bool)) == 1.0

    def test_laplacian_var_vs_scipy(self, rng):
        from scipy.signal import convolve2d

        img = rng.standard_normal((16, 16)).astype(np.float32)
        M = np.ones((16, 16), bool)
        k = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], np.float32)
        L = convolve2d(img, k, mode="same", boundary="symm")
        expect = float(np.nanvar(L[M]))
        assert laplacian_var(img, M) == pytest.approx(expect, rel=1e-5)


class TestWindowStats:
    def test_matches_per_window_filters(self, rng):
        """Integral-image stats must equal direct per-window computation."""
        H = W = 48
        ps, stride = 16, 8
        target = rng.uniform(0, 1, (4, H, W)).astype(np.float32)
        target[0, :10] = 0.01  # some dark area
        mask = rng.uniform(0, 1, (H, W)) > 0.2
        stats = scene_window_stats(target, mask, ps, stride, dark_thr=0.10)
        for i, r in enumerate(stats.rows):
            for j, c in enumerate(stats.cols):
                M = mask[r : r + ps, c : c + ps]
                Y = target[:, r : r + ps, c : c + ps]
                assert stats.valid_ratio[i, j] == pytest.approx(M.mean(), abs=1e-9)
                assert stats.dark_ratio[i, j] == pytest.approx(
                    dark_fraction(Y, M), abs=1e-9
                )
                for ch in range(4):
                    if M.any():
                        expect = float(np.var(Y[ch][M]))
                        assert stats.var_per_band[ch, i, j] == pytest.approx(
                            expect, rel=1e-6, abs=1e-12
                        )


def _write_scene(folder: str, H=96, W=96, seed=0):
    """Synthetic collocated scene as .npy band files."""
    os.makedirs(folder, exist_ok=True)
    rng = np.random.default_rng(seed)
    base = rng.uniform(0.1, 0.9, (H, W)).astype(np.float32)
    for name in ["B2.img", "B3.img", "B4.img", "B8.img"]:
        band = np.clip(base + rng.normal(0, 0.2, (H, W)), 0, 1).astype(np.float32)
        np.save(os.path.join(folder, name + ".npy"), band)
    for name in ["Sigma0_HH_db_m.img", "Sigma0_HV_db_m.img"]:
        np.save(os.path.join(folder, name + ".npy"),
                rng.normal(-10, 3, (H, W)).astype(np.float32))
    np.save(os.path.join(folder, "projectedLocalIncidenceAngle_m.img.npy"),
            rng.uniform(20, 50, (H, W)).astype(np.float32))
    np.save(os.path.join(folder, "elevation_ref_egm2008.img.npy"),
            rng.uniform(0, 500, (H, W)).astype(np.float32))
    np.save(os.path.join(folder, "collocationFlags.img.npy"),
            np.ones((H, W), np.float32))


class TestPipeline:
    def test_end_to_end(self, tmp_path):
        base = tmp_path / "raw"
        _write_scene(str(base / "scene_a.data"))
        _write_scene(str(base / "scene_b.data"), seed=1)
        out = tmp_path / "patches"
        res = run_patchify(PatchifyConfig(
            base_dir=str(base), output_dir=str(out),
            patch_size=32, stride=32, max_patches=20,
            write_previews=True,
        ))
        assert res["total_patches"] > 0
        manifest = json.loads((out / "manifest.json").read_text())
        assert manifest["total_patches"] == res["total_patches"]
        # npz contract
        first = manifest["patches"][0]
        with np.load(out / first["npz"]) as d:
            assert d["inputs"].shape == (4, 32, 32)
            assert d["target"].shape == (4, 32, 32)
            assert d["mask"].dtype == np.uint8
            assert np.isfinite(d["inputs"]).all()
            # HH is z-scored on valid pixels
            m = d["mask"].astype(bool)
            assert abs(d["inputs"][0][m].mean()) < 0.2
        # previews exist
        assert (out / first["preview_dir"] / "true_color.png").exists()
        assert (out / first["preview_dir"] / "false_color_CIR.png").exists()

    def test_filters_reject_dark_scene(self, tmp_path):
        base = tmp_path / "raw"
        folder = base / "dark.data"
        _write_scene(str(folder))
        # overwrite targets with darkness
        for name in ["B2.img", "B3.img", "B4.img", "B8.img"]:
            np.save(str(folder / (name + ".npy")), np.full((96, 96), 0.01, np.float32))
        out = tmp_path / "patches"
        res = run_patchify(PatchifyConfig(
            base_dir=str(base), output_dir=str(out),
            patch_size=32, stride=32, write_previews=False,
        ))
        assert res["total_patches"] == 0
        assert res["dark_skipped"] + res["var_skipped"] + res["texture_skipped"] > 0

    def test_exact_filters_mode(self, tmp_path):
        base = tmp_path / "raw"
        _write_scene(str(base / "s.data"))
        out1, out2 = tmp_path / "p1", tmp_path / "p2"
        r1 = run_patchify(PatchifyConfig(str(base), str(out1), patch_size=32,
                                         stride=16, write_previews=False))
        r2 = run_patchify(PatchifyConfig(str(base), str(out2), patch_size=32,
                                         stride=16, write_previews=False,
                                         exact_filters=True))
        # high-texture synthetic scenes: both modes accept the same windows
        assert r1["total_patches"] == r2["total_patches"]
