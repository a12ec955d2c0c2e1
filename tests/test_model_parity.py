"""UNetSmall forward parity: converted torch weights must reproduce torch
outputs on the NHWC Flax model.

We instantiate a torch module with the reference's exact module-tree naming
(`Train_Orignal.py:94-148` — Sequential indices give keys like
``inc.0.weight``, ``down1.0.0.weight``) at a tiny base_ch, convert its
state_dict, and bit-compare forward passes. This validates the full
converter: OIHW→HWIO, transposed-conv kernel flip, maxpool semantics,
concat order, and the raw-integer t channel.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from s1s2.models import UNetSmall, torch_state_dict_to_params  # noqa: E402
from s1s2.models.torch_twin import build_torch_unet  # noqa: E402
from s1s2.models.convert import infer_arch_from_state_dict, unwrap_state_dict  # noqa: E402


IN_CH, OUT_CH, BASE = 8, 4, 6  # tiny but structurally identical


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(7)
    m = build_torch_unet(IN_CH, OUT_CH, BASE)
    m.eval()
    return m


def test_forward_parity(torch_model, rng):
    x = rng.standard_normal((2, IN_CH, 16, 16)).astype(np.float32)
    t = np.array([20, 999], dtype=np.int64)  # incl. max raw timestep value

    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x), torch.from_numpy(t)).numpy()

    variables = torch_state_dict_to_params(torch_model.state_dict())
    model = UNetSmall(out_ch=OUT_CH, base_ch=BASE, compute_dtype=jnp.float32)
    got = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                      jnp.asarray(t))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))

    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_param_count_at_production_width():
    """≈17M params at base_ch=96 / in_ch=8 / out_ch=4 (SURVEY.md §2 item 12)."""
    import jax
    from s1s2.models import count_params

    model = UNetSmall(out_ch=4, base_ch=96)
    # eval_shape: abstract init — no 17M-param compute/alloc on the 1-CPU box
    v = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 32, 32, 8)),
                             jnp.zeros((1,), jnp.int32)),
        jax.random.PRNGKey(0))
    n = count_params(v["params"])
    assert 16_000_000 < n < 18_500_000, n


def test_bf16_close_to_f32(torch_model, rng):
    """bf16 compute path stays within mixed-precision tolerance of f32."""
    x = rng.standard_normal((1, 16, 16, IN_CH)).astype(np.float32)
    t = np.array([100], dtype=np.int32)
    variables = torch_state_dict_to_params(torch_model.state_dict())
    f32 = UNetSmall(out_ch=OUT_CH, base_ch=BASE, compute_dtype=jnp.float32)
    b16 = UNetSmall(out_ch=OUT_CH, base_ch=BASE, compute_dtype=jnp.bfloat16)
    y32 = np.asarray(f32.apply(variables, jnp.asarray(x), jnp.asarray(t)))
    y16 = np.asarray(b16.apply(variables, jnp.asarray(x), jnp.asarray(t)))
    scale = np.abs(y32).mean() + 1e-6
    assert np.abs(y16 - y32).mean() / scale < 0.1


def test_unwrap_and_infer_arch(torch_model):
    sd = torch_model.state_dict()
    arch = infer_arch_from_state_dict({"state_dict": sd})
    assert arch == {"in_ch": IN_CH, "out_ch": OUT_CH, "base_ch": BASE}
    assert unwrap_state_dict({"model": sd}) is sd
    assert unwrap_state_dict(sd) is sd
