"""Device-parallel eval (--mesh_data): metrics must be IDENTICAL to the
single-device run (same per-file noise, same fused sampler, just SPMD)."""

import csv
import os

import numpy as np
import pytest

from s1s2.data.synthetic import make_synthetic_patches


@pytest.fixture(scope="module")
def patches(tmp_path_factory):
    d = tmp_path_factory.mktemp("mesh_eval")
    make_synthetic_patches(str(d), n=8, size=16, seed=6)
    return str(d)


def _rows(path):
    with open(path) as f:
        return list(csv.DictReader(f))


@pytest.mark.parametrize("mode", ["ddim", "ddim_sweep"])
def test_mesh_eval_identical(patches, tmp_path, mode):
    from s1s2.cli.evaluate import main

    extra = (["--t_start_grid", "5,8", "--ddim_steps_grid", "2"]
             if mode == "ddim_sweep" else [])
    common = ["--mode", mode, "--patch_dir", patches, "--ckpt", "@random",
              "--T", "10", "--base_ch", "4", "--pred_param", "eps",
              "--batch_size", "4", "--t_start", "5", "--ddim_steps", "2",
              "--compute_dtype", "float32"] + extra
    main(common + ["--out_dir", str(tmp_path / "single")])
    main(common + ["--out_dir", str(tmp_path / "mesh"), "--mesh_data", "4"])
    name = "ddim_metrics.csv" if mode == "ddim" else "ddim_sweep_summary.csv"
    a, b = _rows(tmp_path / "single" / name), _rows(tmp_path / "mesh" / name)
    assert len(a) == len(b) > 0
    for ra, rb in zip(a, b):
        for k in ra:
            try:
                np.testing.assert_allclose(float(ra[k]), float(rb[k]),
                                           rtol=0, atol=1e-5)
            except ValueError:
                assert ra[k] == rb[k]


def test_mesh_eval_rejects_bad_batch(patches, tmp_path):
    from s1s2.cli.evaluate import main

    with pytest.raises(ValueError, match="not divisible"):
        main(["--mode", "ddim", "--patch_dir", patches, "--ckpt", "@random",
              "--T", "10", "--base_ch", "4", "--batch_size", "3",
              "--t_start", "5", "--ddim_steps", "2",
              "--out_dir", str(tmp_path / "x"), "--mesh_data", "4"])


def test_eval_cache_dir_identical(patches, tmp_path):
    """--cache_dir serves mmap'd batches; metrics identical to npz reads."""
    from s1s2.cli.evaluate import main

    common = ["--mode", "true_infer", "--patch_dir", patches,
              "--ckpt", "@random", "--T", "10", "--base_ch", "4",
              "--pred_param", "eps", "--batch_size", "4",
              "--t_start", "9", "--ddim_steps", "2", "--n_seeds", "2",
              "--compute_dtype", "float32"]
    main(common + ["--out_dir", str(tmp_path / "npz")])
    main(common + ["--out_dir", str(tmp_path / "cached"),
                   "--cache_dir", str(tmp_path / "cache")])
    a = (tmp_path / "npz" / "ddim_true_infer_summary.txt").read_text()
    b = (tmp_path / "cached" / "ddim_true_infer_summary.txt").read_text()
    assert a == b
    assert (tmp_path / "cache" / "cond.npy").exists()
