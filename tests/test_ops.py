"""Ops-layer tests: alternative lowerings must be numerically equivalent to
their baseline implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s1s2.ops import ps_conv_transpose_2x2


class TestPixelShuffleUp:
    def test_matches_flax_conv_transpose(self, rng):
        from flax import linen as nn

        Ci, Co = 6, 5
        x = jnp.asarray(rng.standard_normal((2, 8, 8, Ci)).astype(np.float32))
        kernel = jnp.asarray(rng.standard_normal((2, 2, Ci, Co)).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(Co).astype(np.float32))

        ref_mod = nn.ConvTranspose(Co, (2, 2), strides=(2, 2), padding="VALID",
                                   dtype=jnp.float32)
        ref = ref_mod.apply({"params": {"kernel": kernel, "bias": bias}}, x)
        got = ps_conv_transpose_2x2(x, kernel, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_unet_up_impl_equivalence(self, rng):
        """Same params → same forward under both up_impl settings."""
        from s1s2.models import UNetSmall

        x = jnp.asarray(rng.standard_normal((1, 16, 16, 8)).astype(np.float32))
        t = jnp.array([42])
        m_ps = UNetSmall(out_ch=4, base_ch=4, compute_dtype=jnp.float32, up_impl="ps")
        m_ct = UNetSmall(out_ch=4, base_ch=4, compute_dtype=jnp.float32,
                         up_impl="convt")
        v = m_ps.init(jax.random.PRNGKey(0), x, t)
        np.testing.assert_allclose(
            np.asarray(m_ps.apply(v, x, t)),
            np.asarray(m_ct.apply(v, x, t)),
            atol=1e-4,
        )


class TestPallasConv3x3:
    @pytest.mark.parametrize("B,H,W,Ci,Co,TH", [
        (1, 8, 8, 4, 4, 8),
        (3, 32, 16, 8, 5, 8),
        (2, 16, 8, 6, 7, 4),
    ])
    def test_matches_xla_conv(self, rng, B, H, W, Ci, Co, TH):
        from jax.experimental.pallas import tpu as pltpu

        from s1s2.ops.conv3x3 import conv3x3_relu

        x = jnp.asarray(rng.standard_normal((B, H, W, Ci)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)).astype(np.float32) * 0.2)
        b = jnp.asarray(rng.standard_normal(Co).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            got = conv3x3_relu(x, w, b, tile_rows=TH)
        ref = jax.nn.relu(
            jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            + b
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


class TestPallasConv3x3BlockSpec:
    """BlockSpec-only variant (conv3x3_relu_bs) — the formulation that
    compiles AND runs on the axon remote-compile TPU runtime (r3)."""

    @pytest.mark.parametrize("B,H,W,Ci,Co,R,relu", [
        (1, 8, 8, 4, 4, 8, True),       # single strip (n=1)
        (3, 32, 16, 8, 5, 8, True),     # 4 strips, Ci != Co
        (2, 16, 8, 6, 7, 4, False),     # no-ReLU epilogue
        (1, 24, 8, 3, 9, 8, True),      # H not a power of two
    ])
    def test_matches_xla_conv(self, rng, B, H, W, Ci, Co, R, relu):
        from jax.experimental.pallas import tpu as pltpu

        from s1s2.ops.conv3x3 import conv3x3_relu_bs

        x = jnp.asarray(rng.standard_normal((B, H, W, Ci)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)).astype(np.float32) * 0.2)
        b = jnp.asarray(rng.standard_normal(Co).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            got = conv3x3_relu_bs(x, w, b, tile_rows=R, apply_relu=relu)
        ref = (
            jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            + b
        )
        if relu:
            ref = jax.nn.relu(ref)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


class TestFusedDDIMUpdate:
    def test_matches_jnp(self, rng):
        """Pallas kernel vs plain jnp (interpreter mode on CPU)."""
        from jax.experimental.pallas import tpu as pltpu

        from s1s2.ops import fused_ddim_update

        x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
        e = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
        a_cur, a_next = jnp.float32(0.7), jnp.float32(0.9)
        with pltpu.force_tpu_interpret_mode():
            x0, xn = fused_ddim_update(x, e, a_cur, a_next)
        x0_ref = (x - jnp.sqrt(1 - a_cur) * e) / jnp.sqrt(a_cur + 1e-8)
        xn_ref = jnp.sqrt(a_next) * x0_ref + jnp.sqrt(1 - a_next) * e
        np.testing.assert_allclose(np.asarray(x0), np.asarray(x0_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(xn), np.asarray(xn_ref), atol=1e-5)
