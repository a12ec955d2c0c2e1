"""Tensor-parallel ('model' axis) sharding — parallel/mesh.tp_sharding_tree.

Channel parallelism for the UNet on the 8-device virtual mesh: conv kernels
and optimizer moments shard their output-channel dimension over 'model',
GSPMD partitions the matching compute and inserts the collectives. The
contract tested here: a TP-sharded train step and sampler produce the SAME
numbers as the replicated single-device program (sharding is a layout
annotation, never a semantics change), and the shards are genuinely
distributed (each device holds 1/model of the channels).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s1s2.core import Schedule
from s1s2.models import UNetSmall
from s1s2.parallel import make_mesh, shard_batch, shard_train_step, \
    tp_sharding_tree
from s1s2.train import TrainConfig, create_train_state, make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh")


def _setup(T=10, B=4, H=16, W=16):
    schedule = Schedule.cosine(T)
    model = UNetSmall(out_ch=4, base_ch=8, compute_dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, 8)), jnp.zeros((1,), jnp.int32))
    cfg = TrainConfig(T=T, pred_param="v", t_sampler="mix_high")
    state = create_train_state(variables["params"], cfg)
    rng = np.random.default_rng(0)
    batch = (rng.standard_normal((B, H, W, 4)).astype(np.float32),
             rng.uniform(0, 1, (B, H, W, 4)).astype(np.float32),
             np.ones((B, H, W), np.float32))
    return schedule, model, cfg, state, batch


def test_make_mesh_model_axis():
    mesh = make_mesh(data=2, space=1, model=4)
    assert dict(mesh.shape) == {"data": 2, "space": 1, "model": 4}
    # 2-axis meshes stay exactly as before (back-compat)
    assert dict(make_mesh(data=4, space=2).shape) == {"data": 4, "space": 2}
    with pytest.raises(ValueError):
        make_mesh(data=3, space=1, model=4)


def test_tp_sharding_tree_rules():
    mesh = make_mesh(data=2, space=1, model=4)
    tree = {"k": jnp.zeros((3, 3, 8, 16)),   # cout 16 % 4 == 0 -> sharded
            "b": jnp.zeros((16,)),            # sharded
            "odd": jnp.zeros((6,)),           # 6 % 4 != 0 -> replicated
            "scalar": jnp.zeros(())}          # replicated
    sh = tp_sharding_tree(tree, mesh)
    assert sh["k"].spec == jax.sharding.PartitionSpec(
        None, None, None, "model")
    assert sh["b"].spec == jax.sharding.PartitionSpec("model")
    assert sh["odd"].spec == jax.sharding.PartitionSpec()
    assert sh["scalar"].spec == jax.sharding.PartitionSpec()


def test_tp_train_step_matches_replicated():
    schedule, model, cfg, state, batch = _setup()
    step_fn = make_train_step(model.apply, schedule, cfg)
    key = jax.random.PRNGKey(2)

    # reference: plain data-parallel (replicated state) on a 2-device mesh
    mesh_dp = make_mesh(data=2, space=1, devices=jax.devices()[:2])
    step_dp = shard_train_step(step_fn, mesh_dp)
    st_dp, m_dp = step_dp(state, shard_batch(batch, mesh_dp), key)

    # TP: same global program over data=2 x model=4
    schedule, model, cfg, state, batch = _setup()
    mesh_tp = make_mesh(data=2, space=1, model=4)
    step_tp = shard_train_step(step_fn, mesh_tp, state_template=state)
    st_tp, m_tp = step_tp(state, shard_batch(batch, mesh_tp), key)

    np.testing.assert_allclose(float(m_tp["loss"]), float(m_dp["loss"]),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        st_tp.params, st_dp.params)

    # shards are genuinely distributed: a (.., cout) kernel keeps 1/4 of its
    # channels per device
    k = st_tp.params["inc"]["kernel"]
    assert "model" in k.sharding.spec
    shard = k.sharding.shard_shape(k.shape)
    assert shard[-1] == k.shape[-1] // 4


@pytest.mark.slow  # 30-90 s on the 1-CPU box; covered by faster siblings in the default tier
def test_train_cli_model_shard(tmp_path):
    """train --model_shard 2 runs the full CLI loop with TP-sharded state
    (composed with whatever data axis fits the batch) and saves a loadable
    checkpoint."""
    from s1s2.cli import train as cli_train
    from s1s2.data.synthetic import make_synthetic_patches
    from s1s2.train.checkpoint import load_model

    patches = str(tmp_path / "patches")
    make_synthetic_patches(patches, n=4, size=16, seed=0)
    model_path = str(tmp_path / "m.msgpack")
    cli_train.main([
        "--patch_dir", patches, "--model_path", model_path, "--T", "10",
        "--epochs", "1", "--batch_size", "2", "--base_ch", "8",
        "--compute_dtype", "float32", "--model_shard", "2",
    ])
    model = UNetSmall(out_ch=4, base_ch=8, compute_dtype=jnp.float32)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 16, 16, 8), jnp.float32),
                          jnp.zeros((1,), jnp.int32))["params"]
    params = load_model(template, model_path)
    out = model.apply({"params": params},
                      jnp.zeros((1, 16, 16, 8), jnp.float32),
                      jnp.zeros((1,), jnp.int32))
    assert np.isfinite(np.asarray(out)).all()


def test_tp_sampler_matches_single_device():
    schedule, model, cfg, state, batch = _setup()
    from jax.sharding import NamedSharding, PartitionSpec as P

    from s1s2.sampling import ddim_anchored, make_denoise_fn

    mesh = make_mesh(data=2, space=1, model=4)
    pshard = tp_sharding_tree(state.ema_params, mesh)
    bshard = NamedSharding(mesh, P("data"))

    def sample(params, cond, gt, key):
        fn = make_denoise_fn(model.apply, {"params": params}, cond)
        return ddim_anchored(fn, gt, key, schedule, t_start=8, steps=3)

    ref = np.asarray(sample(state.ema_params, jnp.asarray(batch[0]),
                            jnp.asarray(batch[1]), jax.random.PRNGKey(3)))
    out = jax.jit(sample, in_shardings=(pshard, bshard, bshard, None),
                  out_shardings=bshard)(
        jax.device_put(state.ema_params, pshard),
        jax.device_put(batch[0], bshard), jax.device_put(batch[1], bshard),
        jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)
