"""Coverage for the remaining harness modes: cfg_sweep, cloudy_viz,
limitation (ddpm sampler + dataset-fixed viz)."""

import os

import pytest

from s1s2.data.synthetic import make_synthetic_patches


@pytest.fixture(scope="module")
def cloud_patch_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cloudy")
    make_synthetic_patches(str(d), n=4, size=16, seed=2, with_cloud=True)
    return str(d)


@pytest.fixture(scope="module")
def trained(tmp_path_factory, cloud_patch_dir):
    out = tmp_path_factory.mktemp("run")
    model_path = str(out / "m.msgpack")
    from s1s2.cli.train import main as train_main

    train_main([
        "--patch_dir", cloud_patch_dir, "--model_path", model_path,
        "--T", "20", "--epochs", "1", "--batch_size", "2", "--base_ch", "4",
        "--compute_dtype", "float32",
    ])
    return model_path


def _eval(mode, patch_dir, ckpt, out_dir, *extra):
    from s1s2.cli.evaluate import main as eval_main

    eval_main([
        "--mode", mode, "--patch_dir", patch_dir, "--ckpt", ckpt,
        "--out_dir", str(out_dir), "--T", "20", "--base_ch", "4",
        "--pred_param", "v", "--batch_size", "2", "--compute_dtype", "float32",
        *extra,
    ])


def test_cfg_sweep(trained, cloud_patch_dir, tmp_path):
    _eval("cfg_sweep", cloud_patch_dir, trained, tmp_path,
          "--t_start", "19", "--ddim_steps", "3", "--guidance_scales", "1", "3")
    rows = (tmp_path / "cfg_sweep_summary.csv").read_text().strip().splitlines()
    assert rows[0].startswith("guidance,")
    assert len(rows) == 3


def test_cloudy_viz_ranks_by_cloud_fraction(trained, cloud_patch_dir, tmp_path):
    _eval("cloudy_viz", cloud_patch_dir, trained, tmp_path,
          "--select_top_cloud", "2")
    panels = sorted(os.listdir(tmp_path / "previews"))
    assert panels == ["000_cloudy_panel.png", "001_cloudy_panel.png"]


def test_limitation_ddpm_sampler(trained, cloud_patch_dir, tmp_path):
    _eval("limitation", cloud_patch_dir, trained, tmp_path,
          "--limitation_sampler", "ddpm", "--save_n", "1")
    txt = (tmp_path / "limitation_summary.txt").read_text()
    assert "PSNR" in txt


def test_limitation_ddpm_noise_replay(trained, cloud_patch_dir, tmp_path):
    """--noise_npz with full (T,H,W,C) per-file streams drives the ancestral
    sampler through the replay path (`Limitation_Test.py:209-224` stream
    order); identical streams ⇒ identical metrics, changed init ⇒ changed."""
    import numpy as np

    T, H, W, Ct = 20, 16, 16, 4
    rng = np.random.default_rng(0)
    streams = {f"s300_i{i}": rng.standard_normal((T, H, W, Ct)).astype(
        np.float32) for i in range(4)}
    npz_a = tmp_path / "noise_a.npz"
    np.savez(npz_a, **streams)
    out_a, out_b, out_c = tmp_path / "a", tmp_path / "b", tmp_path / "c"
    for out, npz in ((out_a, npz_a), (out_b, npz_a)):
        _eval("limitation", cloud_patch_dir, trained, out,
              "--limitation_sampler", "ddpm", "--save_n", "0",
              "--noise_npz", str(npz))
    # perturb only the init draw of file 0 → metrics must move
    streams["s300_i0"] = streams["s300_i0"].copy()
    streams["s300_i0"][0] += 1.0
    npz_c = tmp_path / "noise_c.npz"
    np.savez(npz_c, **streams)
    _eval("limitation", cloud_patch_dir, trained, out_c,
          "--limitation_sampler", "ddpm", "--save_n", "0",
          "--noise_npz", str(npz_c))
    ta = (out_a / "limitation_summary.txt").read_text()
    tb = (out_b / "limitation_summary.txt").read_text()
    tc = (out_c / "limitation_summary.txt").read_text()
    assert ta == tb
    assert ta != tc


def test_solver_dpm2m_modes(trained, cloud_patch_dir, tmp_path):
    """--solver dpm2m must run through both recon (ddim mode) and
    generation (true_infer) paths."""
    _eval("ddim", cloud_patch_dir, trained, tmp_path,
          "--t_start", "15", "--ddim_steps", "4", "--solver", "dpm2m")
    rows = (tmp_path / "ddim_metrics.csv").read_text().strip().splitlines()
    assert len(rows) == 5
    _eval("true_infer", cloud_patch_dir, trained, tmp_path,
          "--t_start", "19", "--ddim_steps", "4", "--n_seeds", "1",
          "--solver", "dpm2m")
    assert (tmp_path / "ddim_true_infer_summary.txt").exists()


def test_limitation_dataset_fixed_viz(trained, cloud_patch_dir, tmp_path):
    _eval("limitation", cloud_patch_dir, trained, tmp_path,
          "--ddim_steps", "3", "--save_n", "1", "--viz_mode", "dataset_fixed")
    files = os.listdir(tmp_path)
    assert any(f.endswith("_compare_true.png") for f in files)
    assert any(f.endswith("_compare_cir.png") for f in files)
    # fixed-range mode does not write the 6-file percentile set
    assert not any(f.endswith("_pred_true.png") for f in files)


def test_per_file_keys_vmap_matches_loop():
    """per_file_keys (vmapped fold_in) must be bit-identical to the round-1
    per-index loop — the per-file RNG replaces the reference's
    torch.manual_seed(seed_base+i) contract."""
    import jax
    import jax.numpy as jnp

    base = jax.random.PRNGKey(42 + 7)
    idx = [0, 1, 5, 17, 2000]
    loop = jnp.stack([jax.random.fold_in(base, int(i)) for i in idx])

    from s1s2.eval.harness import EvalContext

    keys = EvalContext.per_file_keys.__get__(
        type("C", (), {"cfg": type("G", (), {"seed_base": 42,
                                             "rng_by": "index"})()})()
    )(idx, salt=7)
    assert (loop == keys).all()
