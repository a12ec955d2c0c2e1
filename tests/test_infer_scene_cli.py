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
