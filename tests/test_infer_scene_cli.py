"""infer_scene CLI end-to-end on CPU with a tiny model."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from s1s2.models import UNetSmall
    from s1s2.train.checkpoint import save_model

    d = tmp_path_factory.mktemp("scene")
    model = UNetSmall(out_ch=4, base_ch=4, compute_dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 8)),
                   jnp.zeros((1,), jnp.int32))
    path = str(d / "m.msgpack")
    save_model(v["params"], path)
    return path


@pytest.mark.parametrize("pred_param", ["eps", "v"])
def test_scene_cli(tiny_ckpt, tmp_path, pred_param):
    rng = np.random.default_rng(0)
    scene = rng.standard_normal((4, 64, 80)).astype(np.float32)  # CHW input
    scene_path = str(tmp_path / "scene.npy")
    np.save(scene_path, scene)
    mask = np.ones((64, 80), np.float32)
    mask_path = str(tmp_path / "mask.npy")
    np.save(mask_path, mask)

    from s1s2.cli.infer_scene import main

    out_dir = str(tmp_path / f"out_{pred_param}")
    main([
        "--scene", scene_path, "--mask", mask_path, "--ckpt", tiny_ckpt,
        "--out_dir", out_dir, "--T", "20", "--base_ch", "4",
        "--pred_param", pred_param, "--t_start", "15", "--ddim_steps", "3",
        "--patch_size", "32", "--stride", "24", "--batch_size", "2",
        "--normalize",
    ])
    pred = np.load(os.path.join(out_dir, "scene_pred.npy"))
    assert pred.shape == (4, 64, 80)
    assert np.isfinite(pred).all()
    assert os.path.exists(os.path.join(out_dir, "scene_true.png"))


def test_scene_cli_mesh_parallel_identical(tiny_ckpt, tmp_path):
    """--mesh_data 8: tile batches shard over the 8-device CPU mesh; the
    stitched scene must be IDENTICAL to the single-device run (same
    per-tile noise, deterministic sampler)."""
    import jax

    assert len(jax.devices()) >= 8
    rng = np.random.default_rng(1)
    scene = rng.standard_normal((4, 64, 80)).astype(np.float32)
    scene_path = str(tmp_path / "scene.npy")
    np.save(scene_path, scene)

    from s1s2.cli.infer_scene import main

    common = ["--scene", scene_path, "--ckpt", tiny_ckpt,
              "--T", "10", "--base_ch", "4", "--pred_param", "eps",
              "--t_start", "9", "--ddim_steps", "2",
              "--patch_size", "32", "--stride", "24", "--batch_size", "8"]
    main(common + ["--out_dir", str(tmp_path / "single")])
    main(common + ["--out_dir", str(tmp_path / "mesh"), "--mesh_data", "8"])
    a = np.load(tmp_path / "single" / "scene_pred.npy")
    b = np.load(tmp_path / "mesh" / "scene_pred.npy")
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-5)


def test_shard_predict_batch_places_on_mesh():
    """The wrapper actually distributes: inputs land sharded over N devices."""
    import jax

    from s1s2.parallel import make_mesh, shard_predict_batch

    mesh = make_mesh(data=4, space=1, devices=jax.devices()[:4])
    seen = {}

    def probe(cond, noise):
        seen["cond_devices"] = len(cond.sharding.device_set)
        seen["noise_devices"] = len(noise.sharding.device_set)
        return noise

    wrapped = shard_predict_batch(probe, mesh)
    out = wrapped(np.zeros((8, 4, 4, 4), np.float32),
                  np.zeros((8, 4, 4, 2), np.float32))
    assert seen == {"cond_devices": 4, "noise_devices": 4}
    assert out.shape == (8, 4, 4, 2)

    with pytest.raises(ValueError, match="not divisible"):
        wrapped(np.zeros((6, 4, 4, 4), np.float32),
                np.zeros((6, 4, 4, 2), np.float32))


def test_scene_cli_int8(tiny_ckpt, tmp_path):
    """--int8 quantizes the scene sampler; output stays finite/shaped."""
    rng = np.random.default_rng(2)
    scene = rng.standard_normal((4, 64, 80)).astype(np.float32)
    scene_path = str(tmp_path / "scene.npy")
    np.save(scene_path, scene)

    from s1s2.cli.infer_scene import main

    main(["--scene", scene_path, "--ckpt", tiny_ckpt,
          "--out_dir", str(tmp_path / "out"),
          "--T", "10", "--base_ch", "4", "--pred_param", "eps",
          "--t_start", "9", "--ddim_steps", "2",
          "--patch_size", "32", "--stride", "24", "--batch_size", "4",
          "--int8"])
    pred = np.load(tmp_path / "out" / "scene_pred.npy")
    assert pred.shape == (4, 64, 80)
    assert np.isfinite(pred).all()
