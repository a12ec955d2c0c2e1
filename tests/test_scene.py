"""Scene-stitched inference tests."""

import numpy as np
import pytest

from s1s2.eval.scene import feather_window, infer_scene, tile_coords


class TestTiling:
    def test_edge_snap_covers_scene(self):
        coords = tile_coords(100, 70, 32, 24)
        cover = np.zeros((100, 70), bool)
        for r, c in coords:
            assert r + 32 <= 100 and c + 32 <= 70
            cover[r : r + 32, c : c + 32] = True
        assert cover.all()

    def test_exact_fit(self):
        assert tile_coords(64, 64, 64, 64) == [(0, 0)]

    def test_feather_positive_symmetric(self):
        w = feather_window(16)
        assert (w > 0).all()
        np.testing.assert_allclose(w, w[::-1], atol=1e-6)
        np.testing.assert_allclose(w, w.T, atol=1e-6)


class TestInferScene:
    def test_constant_predictor_stitches_exactly(self):
        pred = lambda cond, noise: np.full(
            (cond.shape[0], 32, 32, 4), 0.25, np.float32
        )
        cond = np.zeros((80, 96, 4), np.float32)
        out = infer_scene(pred, cond, out_ch=4, ps=32, stride=24, batch_size=3)
        assert out.shape == (80, 96, 4)
        np.testing.assert_allclose(out, 0.25, atol=1e-6)

    def test_mean_of_cond_predictor_blends_smoothly(self):
        # predictor echoes its conditioning → stitched output ≈ the scene
        pred = lambda cond, noise: cond[..., :4]
        rng = np.random.default_rng(0)
        # smooth scene so overlap blending reproduces it closely
        base = rng.standard_normal((8, 8, 4)).astype(np.float32)
        import jax
        import jax.numpy as jnp

        cond = np.asarray(
            jax.image.resize(jnp.asarray(base), (96, 96, 4), "linear")
        )
        out = infer_scene(pred, cond, out_ch=4, ps=32, stride=16, batch_size=4)
        np.testing.assert_allclose(out, cond, atol=1e-4)

    def test_scene_smaller_than_patch_raises(self):
        with pytest.raises(ValueError):
            infer_scene(lambda c, n: c, np.zeros((16, 16, 4), np.float32),
                        out_ch=4, ps=32)

    def test_normalize_tile_path(self):
        from s1s2.eval.scene import normalize_tile

        rng = np.random.default_rng(1)
        tile = rng.normal(-10, 4, (32, 32, 4)).astype(np.float32)
        mask = np.ones((32, 32), np.float32)
        out = normalize_tile(tile, mask)
        assert abs(out[..., 0].mean()) < 1e-4  # z-scored HH
        assert np.isfinite(out).all()
