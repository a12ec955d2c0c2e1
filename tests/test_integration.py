"""End-to-end slice (SURVEY.md §7 step 3): synthetic patches → train →
checkpoints → eval harness modes → baselines, all through the public CLIs.

Small shapes / tiny model / T=20 so the whole file runs on the 1-CPU test
box. This is the integration spine; per-module numerics live in the other
test files.
"""

import json
import os

import numpy as np
import pytest

from s1s2.data.synthetic import make_synthetic_patches


@pytest.fixture(scope="module")
def patch_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("patches")
    make_synthetic_patches(str(d), n=6, size=16, seed=3)
    return str(d)


@pytest.fixture(scope="module")
def trained(tmp_path_factory, patch_dir):
    """Train 2 epochs of the tiny v-model through the CLI."""
    out = tmp_path_factory.mktemp("run")
    model_path = str(out / "model.msgpack")
    from s1s2.cli.train import main as train_main

    train_main([
        "--patch_dir", patch_dir,
        "--model_path", model_path,
        "--T", "20", "--epochs", "2", "--batch_size", "2",
        "--base_ch", "4", "--pred_param", "v", "--lr", "1e-3",
        "--compute_dtype", "float32",
        "--save_state_dir", str(out / "state"),
    ])
    return model_path


def test_train_writes_artifact_triple(trained):
    root, ext = os.path.splitext(trained)
    assert os.path.exists(trained)
    assert os.path.exists(f"{root}_last{ext}")
    assert os.path.exists(f"{root}_best{ext}")


def _eval(mode, patch_dir, trained, out_dir, *extra):
    from s1s2.cli.evaluate import main as eval_main

    eval_main([
        "--mode", mode, "--patch_dir", patch_dir, "--ckpt", trained,
        "--out_dir", str(out_dir), "--T", "20", "--base_ch", "4",
        "--pred_param", "v", "--batch_size", "3", "--compute_dtype", "float32",
        *extra,
    ])


def test_onestep_t0_identity(trained, patch_dir, tmp_path):
    _eval("onestep", patch_dir, trained, tmp_path, "--t_small", "2")
    txt = (tmp_path / "onestep_summary.txt").read_text()
    assert "t=0 identity" in txt
    mae0 = float(txt.split("MAE=")[1].split()[0])
    # v-param t=0 recon goes THROUGH the model (x0̂ = √ᾱ₀·gt − √(1−ᾱ₀)·v̂,
    # `Onestep_v_Prediction.py:184-198`): small but nonzero, unlike the ε
    # script whose algebra reduces exactly to GT (crossval-certified)
    assert 0.0 < mae0 < 0.1
    assert (tmp_path / "pred_true.png").exists()


def test_ddim_mode_csv_schema(trained, patch_dir, tmp_path):
    _eval("ddim", patch_dir, trained, tmp_path,
          "--t_start", "15", "--ddim_steps", "4")
    rows = (tmp_path / "ddim_metrics.csv").read_text().strip().splitlines()
    # v-param runs carry the reference's eta column
    # (`DDIM_Multi-step_v_Prediction.py:285`)
    assert rows[0] == "file,t_start,ddim_steps,eta,MAE,MSE"
    assert len(rows) == 7  # 6 files + header
    summary = (tmp_path / "ddim_summary.txt").read_text()
    assert "MAE mean/std" in summary and "eta:" in summary


def test_ddim_sweep(trained, patch_dir, tmp_path):
    _eval("ddim_sweep", patch_dir, trained, tmp_path,
          "--t_start_grid", "10,15", "--ddim_steps_grid", "2,4")
    rows = (tmp_path / "ddim_sweep_summary.csv").read_text().strip().splitlines()
    assert rows[0] == "t_start,steps,files,MAE_mean,MAE_std,MSE_mean,MSE_std"
    assert len(rows) == 5  # 2x2 grid


def test_vdiag(trained, patch_dir, tmp_path):
    _eval("vdiag", patch_dir, trained, tmp_path, "--t_small", "2")
    rows = (tmp_path / "vdiag.csv").read_text().strip().splitlines()
    assert rows[0] == "file,t_small,v_MSE,v_cosine,eps_cosine"
    assert len(rows) == 7


def test_seed_stats(trained, patch_dir, tmp_path):
    _eval("seed_stats", patch_dir, trained, tmp_path,
          "--t_small", "2", "--n_seeds", "3")
    rows = (tmp_path / "seed_stats.csv").read_text().strip().splitlines()
    assert len(rows) == 7
    assert "mean_of_means" in (tmp_path / "seed_stats_summary.txt").read_text()


def test_per_band(trained, patch_dir, tmp_path):
    _eval("per_band", patch_dir, trained, tmp_path, "--t_small", "2")
    head = (tmp_path / "per_band_all.csv").read_text().splitlines()[0]
    assert "band0_MAE" in head and "band3_SSIMs" in head
    agg = (tmp_path / "per_band_summary.csv").read_text().strip().splitlines()
    assert len(agg) == 5  # 4 bands + header


def test_ablate(trained, patch_dir, tmp_path):
    _eval("ablate", patch_dir, trained, tmp_path, "--t_small", "2")
    rows = (tmp_path / "ablate_all.csv").read_text().strip().splitlines()
    assert len(rows) == 1 + 6 * 4  # per file × per cond channel
    agg = (tmp_path / "ablate_summary.csv").read_text().strip().splitlines()
    assert len(agg) == 5


def test_tsweep(trained, patch_dir, tmp_path):
    _eval("tsweep", patch_dir, trained, tmp_path,
          "--t_values", "2", "5", "--save_viz_n", "1")
    rows = (tmp_path / "tsweep.csv").read_text().strip().splitlines()
    assert len(rows) == 1 + 6 * 2


def test_true_infer(trained, patch_dir, tmp_path):
    _eval("true_infer", patch_dir, trained, tmp_path,
          "--t_start", "19", "--ddim_steps", "4", "--n_seeds", "2")
    txt = (tmp_path / "ddim_true_infer_summary.txt").read_text()
    for key in ("MAE", "PSNR", "SAM", "ERGAS"):
        assert key in txt


def test_limitation_streaming(trained, patch_dir, tmp_path):
    _eval("limitation", patch_dir, trained, tmp_path,
          "--ddim_steps", "4", "--save_n", "1",
          "--partial_reverse_k", "3",
          "--band_weights", "1", "1", "2", "2")
    txt = (tmp_path / "limitation_summary.txt").read_text()
    assert "Per-channel metrics" in txt
    assert "partial-reverse k=3" in txt
    assert "band_weights" in txt
    assert any(f.endswith("_pred.npy") for f in os.listdir(tmp_path))


def test_baselines(patch_dir, tmp_path):
    from s1s2.cli.evaluate import main as eval_main

    for mode in ("baseline_bicubic", "baseline_linear"):
        eval_main([
            "--mode", mode, "--patch_dir", patch_dir,
            "--out_dir", str(tmp_path), "--batch_size", "3",
        ])
        assert (tmp_path / f"baseline_{mode.split('_')[1]}_summary.txt").exists()


def test_night_demo_and_cfg(trained, patch_dir, tmp_path):
    _eval("night_demo", patch_dir, trained, tmp_path,
          "--t_start", "15", "--ddim_steps", "2", "--save_viz_n", "1",
          "--guidance_scale", "2.0")
    assert (tmp_path / "previews" / "000_night_panel.png").exists()


def test_convert_cli_round_trip(tmp_path):
    """pth → msgpack → identical forward output."""
    import torch

    import jax.numpy as jnp
    from s1s2.models import UNetSmall
    from s1s2.train.checkpoint import load_model

    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_model_parity import build_torch_unet

    torch.manual_seed(0)
    tm = build_torch_unet(8, 4, 4)
    pth = str(tmp_path / "m.pth")
    torch.save(tm.state_dict(), pth)

    from s1s2.cli.convert_ckpt import main as conv_main

    out = str(tmp_path / "m.msgpack")
    conv_main(["--pth", pth, "--out", out])

    import jax

    model = UNetSmall(out_ch=4, base_ch=4, compute_dtype=jnp.float32)
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8)), jnp.zeros((1,), jnp.int32)
    )["params"]
    params = load_model(template, out)

    from s1s2.models.convert import torch_state_dict_to_params

    direct = torch_state_dict_to_params(tm.state_dict())["params"]
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(direct)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
