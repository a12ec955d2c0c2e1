"""Protocol-stable per-file RNG (VERDICT r4 weak #4).

``rng_by='index'`` (the historical default) keys per-file noise by DATASET
index, so the same files evaluated via ``--file_list`` (original indices)
vs a copied subdir (re-indexed from 0) get DIFFERENT noise and absolute
MAEs shift ~0.006 (the r4 protocol trap, CLAUDE.md). ``rng_by='name'``
keys by crc32 of the npz basename: per-file numbers become invariant to
how the files were selected.
"""

import csv
import shutil

import numpy as np
import pytest

from s1s2.data.synthetic import make_synthetic_patches


@pytest.fixture(scope="module")
def patch_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("rngkey_patches")
    make_synthetic_patches(str(d), n=8, size=16, seed=11)
    return str(d)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from s1s2.models import UNetSmall
    from s1s2.train.checkpoint import save_model

    model = UNetSmall(out_ch=4, base_ch=4, compute_dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 16, 8), jnp.float32),
                           jnp.zeros((1,), jnp.int32))
    path = str(tmp_path_factory.mktemp("rngkey_ckpt") / "m.msgpack")
    save_model(variables["params"], path)
    return path


def _per_file_mae(patch_dir, ckpt, out_dir, rng_by, file_list=None):
    from s1s2.cli.evaluate import main as eval_main

    args = [
        "--mode", "ddim", "--patch_dir", patch_dir, "--ckpt", ckpt,
        "--out_dir", str(out_dir), "--T", "20", "--base_ch", "4",
        "--batch_size", "2", "--compute_dtype", "float32",
        "--t_start", "10", "--ddim_steps", "2", "--save_viz_n", "0",
        "--rng_by", rng_by,
    ]
    if file_list:
        args += ["--file_list", str(file_list)]
    eval_main(args)
    with open(str(out_dir) + "/ddim_metrics.csv") as f:
        rows = list(csv.DictReader(f))
    return {r["file"]: float(r["MAE"]) for r in rows}


@pytest.fixture(scope="module")
def protocols(tmp_path_factory, patch_dir):
    """The r4 trap setup: the SAME 4 files evaluated two ways — as part of
    the FULL dataset (original indices 4..7) and as a copied subdir
    (re-indexed 0..3). (--file_list also re-indexes its selection from 0,
    so the list-vs-subdir pair agrees; it is full-dataset-vs-subset runs
    that diverge under index keying.)"""
    import os

    files = sorted(os.listdir(patch_dir))[4:8]
    sub = tmp_path_factory.mktemp("rngkey_subdir")
    for f in files:
        shutil.copy(os.path.join(patch_dir, f), sub / f)
    return str(sub), files


def test_name_keying_is_protocol_invariant(patch_dir, ckpt, protocols,
                                           tmp_path):
    sub, files = protocols
    a = _per_file_mae(patch_dir, ckpt, tmp_path / "a", "name")
    b = _per_file_mae(sub, ckpt, tmp_path / "b", "name")
    assert set(b) == set(files) and set(b) <= set(a)
    for f in files:
        np.testing.assert_allclose(a[f], b[f], rtol=0, atol=0), f


def test_name_keying_file_list_matches_subdir(patch_dir, ckpt, protocols,
                                              tmp_path_factory, tmp_path):
    """--file_list selection vs copied subdir (the literal VERDICT wording)
    under rng_by=name: identical per-file MAEs."""
    sub, files = protocols
    lst = tmp_path_factory.mktemp("rngkey_lists") / "sel.txt"
    lst.write_text("\n".join(files) + "\n")
    a = _per_file_mae(patch_dir, ckpt, tmp_path / "a", "name", file_list=lst)
    b = _per_file_mae(sub, ckpt, tmp_path / "b", "name")
    for f in files:
        np.testing.assert_allclose(a[f], b[f], rtol=0, atol=0), f


def test_index_keying_is_protocol_sensitive(patch_dir, ckpt, protocols,
                                            tmp_path):
    """Regression guard documenting WHY 'name' exists: under the default
    index keying a file's noise follows its dataset index, so the
    full-dataset run and the subset run draw different noise for the same
    file and at least one per-file MAE differs."""
    sub, files = protocols
    a = _per_file_mae(patch_dir, ckpt, tmp_path / "a", "index")
    b = _per_file_mae(sub, ckpt, tmp_path / "b", "index")
    assert any(abs(a[f] - b[f]) > 1e-9 for f in files)


def test_stable_file_id_depends_only_on_name():
    from s1s2.eval.harness import stable_file_id

    assert stable_file_id("patch_000004.npz") == stable_file_id(
        "patch_000004.npz")
    assert stable_file_id("patch_000004.npz") != stable_file_id(
        "patch_000005.npz")
