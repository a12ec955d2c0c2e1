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


class TestFastTransfer:
    def test_device_noise_and_pipeline_equivalence(self):
        """noise='device' passes (B,) int32 seeds; pipeline depth must not
        change the stitched output (dispatch order is preserved)."""
        import jax
        import jax.numpy as jnp

        calls = []

        def pred(cond_b, seeds_b):
            assert seeds_b.dtype == np.int32 and seeds_b.ndim == 1
            calls.append(np.asarray(seeds_b).copy())
            noise = jax.vmap(lambda s: jax.random.normal(
                jax.random.PRNGKey(s), cond_b.shape[1:3] + (4,)))(
                jnp.asarray(seeds_b))
            return cond_b.astype(jnp.float32) * 0.5 + 0.01 * noise

        rng = np.random.default_rng(0)
        scene = rng.standard_normal((64, 64, 4)).astype(np.float32)
        out1 = infer_scene(pred, scene, out_ch=4, ps=32, stride=16,
                           batch_size=3, noise="device", rng_seed=7)
        out3 = infer_scene(pred, scene, out_ch=4, ps=32, stride=16,
                           batch_size=3, noise="device", rng_seed=7,
                           pipeline=3)
        np.testing.assert_array_equal(out1, out3)
        # seeds deterministic in rng_seed and tile index
        assert all((c >= 7 * (1 << 20)).all() for c in calls)

    def test_f16_transfer_dtype(self):
        seen = {}

        def pred(cond_b, noise_b):
            seen["dtype"] = cond_b.dtype
            return cond_b.astype(np.float32) * 0.0 + 0.5

        scene = np.zeros((32, 32, 4), np.float32)
        out = infer_scene(pred, scene, out_ch=4, ps=32, stride=32,
                          batch_size=1, transfer_dtype=np.float16)
        assert seen["dtype"] == np.float16
        np.testing.assert_allclose(out, 0.5, atol=1e-6)


class TestDeviceStitch:
    def test_device_stitch_matches_host(self):
        """stitch='device' (on-chip scatter-add, no per-batch download) must
        reproduce the host feather-stitch to f32 rounding — including
        edge-snapped overlapping tiles and a padded final batch."""
        import jax

        def pred(cond_b, noise_b):
            return jax.numpy.asarray(cond_b)[..., :4] * 0.5 + 0.1

        rng = np.random.default_rng(3)
        scene = rng.standard_normal((80, 96, 4)).astype(np.float32)
        host = infer_scene(pred, scene, out_ch=4, ps=32, stride=24,
                           batch_size=3, stitch="host")
        dev = infer_scene(pred, scene, out_ch=4, ps=32, stride=24,
                          batch_size=3, stitch="device")
        np.testing.assert_allclose(dev, host, rtol=0, atol=1e-5)

    def test_device_stitch_with_pipeline_and_device_noise(self):
        import jax
        import jax.numpy as jnp

        def pred(cond_b, seeds_b):
            noise = jax.vmap(lambda s: jax.random.normal(
                jax.random.PRNGKey(s), cond_b.shape[1:3] + (4,)))(
                jnp.asarray(seeds_b))
            return jnp.asarray(cond_b, jnp.float32) * 0.5 + 0.01 * noise

        rng = np.random.default_rng(4)
        scene = rng.standard_normal((64, 64, 4)).astype(np.float32)
        host = infer_scene(pred, scene, out_ch=4, ps=32, stride=16,
                           batch_size=3, noise="device", rng_seed=7)
        dev = infer_scene(pred, scene, out_ch=4, ps=32, stride=16,
                          batch_size=3, noise="device", rng_seed=7,
                          pipeline=3, stitch="device")
        np.testing.assert_allclose(dev, host, rtol=0, atol=1e-5)

    def test_stitcher_jit_cached_across_scenes(self):
        """A fresh jit closure per infer_scene call recompiled the stitch
        scan every scene (~1.4 s on the remote-compile runtime); the
        compiled executable must be shared per (ps, out_ch) signature."""
        from s1s2.eval import scene as scene_mod

        win = scene_mod.feather_window(32)
        scene_mod.make_device_stitcher(32, 4, win)
        n = len(scene_mod._STITCH_CACHE)
        scene_mod.make_device_stitcher(32, 4, win)
        assert len(scene_mod._STITCH_CACHE) == n
        scene_mod.make_device_stitcher(16, 4, win[:16, :16])
        assert len(scene_mod._STITCH_CACHE) == n + 1

    def test_device_stitch_f16_final_download(self):
        """With a wire dtype set, the scene-sized accumulator comes back
        f16 (the last remaining transfer); values stay within f16 rounding
        of the host stitch."""
        import jax.numpy as jnp

        def pred(cond_b, noise_b):
            return jnp.asarray(cond_b, jnp.float32)[..., :4] * 0.5 + 0.1

        rng = np.random.default_rng(5)
        scene = rng.standard_normal((64, 80, 4)).astype(np.float32)
        host = infer_scene(pred, scene, out_ch=4, ps=32, stride=24,
                           batch_size=3, stitch="host")
        dev = infer_scene(pred, scene, out_ch=4, ps=32, stride=24,
                          batch_size=3, stitch="device",
                          transfer_dtype=np.float16)
        assert dev.dtype == np.float32
        # tolerance covers BOTH wire precisions: the f16 cond upload feeds
        # the predictor and the accumulator returns f16
        np.testing.assert_allclose(dev, host, rtol=1e-2, atol=1e-2)

    def test_bad_stitch_value_raises(self):
        with pytest.raises(ValueError):
            infer_scene(lambda c, n: c, np.zeros((32, 32, 4), np.float32),
                        out_ch=4, ps=32, stitch="gpu")
