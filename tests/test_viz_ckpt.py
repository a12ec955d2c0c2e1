"""Visualization + checkpoint round-trip tests."""

import os

import numpy as np
import pytest

from s1s2.viz import (
    cir_color,
    dataset_fixed_lo_hi,
    hstack_compare,
    per_image_lo_hi,
    percentile_stretch_uint8,
    s1_preview,
    save_panel,
    save_pred_gt,
    stretch_fixed,
    true_color,
)


@pytest.fixture
def t4(rng):
    return rng.uniform(0, 1, (16, 16, 4)).astype(np.float32)


class TestStretches:
    def test_percentile_stretch(self, rng):
        a = rng.uniform(-5, 5, (32, 32)).astype(np.float32)
        u8 = percentile_stretch_uint8(a)
        assert u8.dtype == np.uint8 and u8.min() == 0 and u8.max() == 255
        flat = percentile_stretch_uint8(np.zeros((8, 8), np.float32))
        assert np.isfinite(flat).all()

    def test_true_cir_shapes(self, t4):
        assert true_color(t4).shape == (16, 16, 3)
        assert cir_color(t4).shape == (16, 16, 3)

    def test_fixed_range(self, t4):
        lo, hi = per_image_lo_hi(t4)
        u8 = stretch_fixed(t4, lo, hi)
        assert u8.shape == (16, 16, 4) and u8.dtype == np.uint8
        lo2, hi2 = dataset_fixed_lo_hi([t4, t4 * 0.5])
        assert (hi2 >= lo2).all()

    def test_s1_preview_channel_counts(self, rng):
        for c in (1, 2, 4):
            img = s1_preview(rng.standard_normal((8, 8, c)).astype(np.float32))
            assert img.shape == (8, 8, 3)

    def test_hstack(self, t4):
        a = true_color(t4)
        out = hstack_compare(a, a)
        assert out.shape == (16, 16 * 2 + 6, 3)


class TestComposites:
    def test_save_pred_gt(self, t4, tmp_path):
        save_pred_gt(t4, t4, str(tmp_path), "x")
        for suffix in ("pred_true", "gt_true", "pred_cir", "gt_cir",
                       "compare_true", "compare_cir"):
            assert (tmp_path / f"x_{suffix}.png").exists()

    def test_save_panel_with_zoom(self, t4, rng, tmp_path):
        cond = rng.standard_normal((16, 16, 4)).astype(np.float32)
        out = tmp_path / "panel.png"
        save_panel(t4, t4 * 0.9, cond, str(out), title="T", zoom=8, zoom_k=2)
        assert out.exists()
        assert (tmp_path / "panel_s1_zoom0.png").exists()

    def test_save_panel_no_gt(self, t4, rng, tmp_path):
        cond = rng.standard_normal((16, 16, 2)).astype(np.float32)
        out = tmp_path / "p.png"
        save_panel(t4, None, cond, str(out))
        assert out.exists()


class TestCheckpoint:
    def test_msgpack_round_trip(self, rng, tmp_path):
        import jax
        import jax.numpy as jnp

        from s1s2.models import UNetSmall
        from s1s2.train.checkpoint import load_model, save_model

        model = UNetSmall(out_ch=4, base_ch=4, compute_dtype=jnp.float32)
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8)),
                       jnp.zeros((1,), jnp.int32))
        path = str(tmp_path / "m.msgpack")
        save_model(v["params"], path)
        template = jax.tree_util.tree_map(np.zeros_like, v["params"])
        loaded = load_model(template, path)
        for a, b in zip(jax.tree_util.tree_leaves(v["params"]),
                        jax.tree_util.tree_leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_orbax_state_round_trip(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from s1s2.models import UNetSmall
        from s1s2.train import TrainConfig, create_train_state
        from s1s2.train.checkpoint import restore_state, save_state

        model = UNetSmall(out_ch=4, base_ch=4, compute_dtype=jnp.float32)
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8)),
                       jnp.zeros((1,), jnp.int32))
        state = create_train_state(v["params"], TrainConfig(T=10))
        d = str(tmp_path / "ckpt")
        save_state(state, d)
        restored = restore_state(d, template=state)
        assert int(restored.step) == 0
        np.testing.assert_array_equal(
            np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
            np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
        )
