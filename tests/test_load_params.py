"""load_params must return a BARE params pytree for every checkpoint form.

Regression for the distill-CLI crash where a reference ``.pth`` teacher came
back double-wrapped ({'params': ...} used as bare params) — the
"reference .pth loads anywhere a ckpt is accepted" contract (PARITY.md)
applied to code that needs weights only."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s1s2.models import UNetSmall
from s1s2.train.checkpoint import load_params, save_model

sys.path.insert(0, os.path.dirname(__file__))


def _tree_keys(params):
    return {jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_leaves_with_path(params)}


@pytest.fixture(scope="module")
def model_and_params():
    model = UNetSmall(out_ch=4, base_ch=4)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 16, 8), jnp.float32),
                           jnp.zeros((1,), jnp.int32))
    return model, variables["params"]


def test_msgpack_passthrough(tmp_path, model_and_params):
    _, params = model_and_params
    path = str(tmp_path / "m.msgpack")
    save_model(params, path)
    loaded = load_params(path, template=params)
    assert _tree_keys(loaded) == _tree_keys(params)
    np.testing.assert_array_equal(
        jax.tree_util.tree_leaves(loaded)[0],
        jax.tree_util.tree_leaves(params)[0])


def test_pth_unwrapped(tmp_path, model_and_params):
    torch = pytest.importorskip("torch")
    from s1s2.models.torch_twin import build_torch_unet

    _, params = model_and_params
    tm = build_torch_unet(8, 4, 4)
    path = str(tmp_path / "ref.pth")
    torch.save(tm.state_dict(), path)
    loaded = load_params(path, template=params)
    # bare params: top level is module names, NOT a {'params': ...} wrapper
    assert "params" not in loaded
    assert _tree_keys(loaded) == _tree_keys(params)


def test_orbax_state_gives_ema(tmp_path, model_and_params):
    from s1s2.train.checkpoint import save_state
    from s1s2.train.distill import DistillConfig, create_distill_state

    _, params = model_and_params
    state = create_distill_state(params, DistillConfig())
    # make EMA distinguishable from params
    state = state.replace(
        ema_params=jax.tree_util.tree_map(lambda p: p + 1.0, state.params))
    d = str(tmp_path / "state_dir")
    save_state(state, d)
    loaded = load_params(d, template=params)
    assert _tree_keys(loaded) == _tree_keys(params)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(loaded)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0]))
