"""Reference-user workflow: evaluate --ckpt model.pth directly.

A torch state_dict saved to .pth (the reference's checkpoint format) must
load through the converter inside the eval harness and produce valid
metrics — the drop-in path for the three reference model families
(SURVEY.md §0)."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(__file__))
from test_model_parity import build_torch_unet  # noqa: E402

from s1s2.data.synthetic import make_synthetic_patches  # noqa: E402


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("pth")
    patch_dir = str(d / "patches")
    make_synthetic_patches(patch_dir, n=4, size=16, seed=9)
    torch.manual_seed(3)
    tm = build_torch_unet(8, 4, 4)  # 4 cond + 4 target channels
    pth = str(d / "ddpm_ref.pth")
    torch.save(tm.state_dict(), pth)
    # wrapped variant (`Evaluation/Onestep_v_Prediction.py:153-157`)
    pth_wrapped = str(d / "ddpm_wrapped.pth")
    torch.save({"state_dict": tm.state_dict()}, pth_wrapped)
    return patch_dir, pth, pth_wrapped


@pytest.mark.parametrize("which", [1, 2])
def test_eval_loads_pth_directly(setup, tmp_path, which):
    patch_dir, pth, pth_wrapped = setup
    ckpt = (pth, pth_wrapped)[which - 1]
    from s1s2.cli.evaluate import main as eval_main

    eval_main([
        "--mode", "ddim", "--patch_dir", patch_dir, "--ckpt", ckpt,
        "--out_dir", str(tmp_path), "--T", "20", "--base_ch", "4",
        "--pred_param", "eps", "--batch_size", "2",
        "--t_start", "10", "--ddim_steps", "3", "--compute_dtype", "float32",
    ])
    rows = (tmp_path / "ddim_metrics.csv").read_text().strip().splitlines()
    assert len(rows) == 5
    mae = float(rows[1].split(",")[3])
    assert np.isfinite(mae) and 0 <= mae <= 1


def test_eps_diag_mode(setup, tmp_path):
    """eps diagnostics mode (`Evaluation/DDIM_Multi-step.py --mode eps`)."""
    patch_dir, pth, _ = setup
    from s1s2.cli.evaluate import main as eval_main

    eval_main([
        "--mode", "eps", "--patch_dir", patch_dir, "--ckpt", pth,
        "--out_dir", str(tmp_path), "--T", "20", "--base_ch", "4",
        "--pred_param", "eps", "--batch_size", "2", "--t_small", "3",
        "--compute_dtype", "float32",
    ])
    rows = (tmp_path / "eps_diag.csv").read_text().strip().splitlines()
    assert rows[0] == "file,t_small,eps_MSE,cosine"
    assert len(rows) == 5
    assert "eps_MSE mean/std" in (tmp_path / "eps_summary.txt").read_text()


def test_unified_dispatcher(tmp_path):
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "s1s2", "--help"],
        capture_output=True, text=True, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu"},
    )
    assert "commands:" in out.stdout and "evaluate" in out.stdout
    bad = subprocess.run(
        [sys.executable, "-m", "s1s2", "nope"],
        capture_output=True, text=True, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu"},
    )
    assert bad.returncode == 2
