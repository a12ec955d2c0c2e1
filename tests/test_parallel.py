"""Sharded training on the 8-device virtual CPU mesh: the data-parallel
train step must match single-device numerics (XLA-inserted psum)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s1s2.core import Schedule
from s1s2.models import UNetSmall
from s1s2.parallel import make_mesh, shard_batch, shard_train_step
from s1s2.train import TrainConfig, create_train_state, make_train_step

T = 20
B, H, W = 8, 16, 16


@pytest.fixture(scope="module")
def setup(rng):
    model = UNetSmall(out_ch=4, base_ch=4, compute_dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 8)), jnp.zeros((1,), jnp.int32)
    )
    sched = Schedule.cosine(T)
    cfg = TrainConfig(T=T, t_sampler="uniform", lr=1e-3)
    batch = (
        rng.standard_normal((B, H, W, 4)).astype(np.float32),
        rng.uniform(0, 1, (B, H, W, 4)).astype(np.float32),
        np.ones((B, H, W), np.float32),
    )
    return model, variables["params"], sched, cfg, batch


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_dp_matches_single_device(setup):
    model, params, sched, cfg, batch = setup
    step_fn = make_train_step(model.apply, sched, cfg)

    # single-device
    s1 = create_train_state(params, cfg)
    s1, m1 = jax.jit(step_fn)(s1, tuple(jnp.asarray(b) for b in batch),
                              jax.random.PRNGKey(7))

    # 8-way data parallel
    mesh = make_mesh()
    s8 = create_train_state(params, cfg)
    sharded = shard_batch(batch, mesh)
    step8 = shard_train_step(step_fn, mesh)
    s8, m8 = step8(s8, sharded, jax.random.PRNGKey(7))

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-5)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_spatial_mesh_runs(setup):
    model, params, sched, cfg, batch = setup
    mesh = make_mesh(data=4, space=2)
    step = shard_train_step(make_train_step(model.apply, sched, cfg), mesh,
                            spatial=True)
    state = create_train_state(params, cfg)
    sharded = shard_batch(batch, mesh, spatial=True)
    state, metrics = step(state, sharded, jax.random.PRNGKey(0))
    assert bool(jnp.isfinite(metrics["loss"]))
    assert int(state.step) == 1


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
