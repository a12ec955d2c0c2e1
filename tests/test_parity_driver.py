"""End-to-end exercise of the table-level parity driver (eval/parity.py)
with a torch-twin .pth fixture — proves the certification machinery so only
the real checkpoint blobs are missing, not the code."""

import json
import os
import sys

import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(__file__))
from test_model_parity import build_torch_unet  # noqa: E402

from s1s2.data.synthetic import make_synthetic_patches  # noqa: E402
from s1s2.eval.parity import run_full_parity  # noqa: E402

# tiny overrides of every table so the full driver runs in seconds on CPU
TINY = {
    "ddim_eps": {
        "config": {"t_start": 10, "ddim_steps": 2},
    },
    "sweep_eps": {
        "config": {"t_start_grid": (10, 5), "ddim_steps_grid": (2, 3),
                   "max_files": 4},
        "expect": {"10,2": 0.1, "10,3": 0.1, "5,2": 0.1, "5,3": 0.1},
    },
    "true_infer_eps": {
        "config": {"t_start": 19, "ddim_steps": 3, "n_seeds": 2,
                   "max_files": 2},
    },
}
KW = dict(rel_tol=0.02, batch_size=2, T=20, base_ch=4)


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    d = tmp_path_factory.mktemp("parity")
    patch_dir = str(d / "patches")
    make_synthetic_patches(patch_dir, n=4, size=16, seed=11)
    torch.manual_seed(5)
    tm = build_torch_unet(8, 4, 4)
    pth = str(d / "eps_family.pth")
    torch.save(tm.state_dict(), pth)
    return str(d), patch_dir, pth


def test_full_parity_all_tables(fixture):
    d, patch_dir, pth = fixture
    # pass 1: discover actuals (expected values are placeholders -> fails)
    r1 = run_full_parity(patch_dir, os.path.join(d, "o1"), {"eps": pth},
                         expected=TINY, **KW)
    assert set(r1["tables_ran"]) == {"ddim_eps", "sweep_eps", "true_infer_eps"}
    assert r1["tables_skipped_no_ckpt"] == []
    actuals = {}
    for row in r1["rows"]:
        assert row["actual"] is not None, row  # every expected key produced
        actuals.setdefault(row["table"], {})[row["key"]] = row["actual"]

    # pass 2: expected == pass-1 actuals -> everything must PASS
    exp2 = {t: dict(TINY[t], expect=actuals[t]) for t in TINY}
    r2 = run_full_parity(patch_dir, os.path.join(d, "o2"), {"eps": pth},
                         expected=exp2, **KW)
    assert r2["all_pass"], r2["rows"]
    assert r2["n_fail"] == 0

    # pass 2 artifacts exist
    assert os.path.exists(os.path.join(d, "o2", "parity_report.json"))
    assert os.path.exists(os.path.join(d, "o2", "parity_report.txt"))

    # pass 3: perturb one number beyond tolerance -> that row must FAIL
    exp3 = {t: dict(TINY[t], expect=dict(actuals[t])) for t in TINY}
    exp3["ddim_eps"]["expect"]["MAE_mean"] *= 1.10
    r3 = run_full_parity(patch_dir, os.path.join(d, "o3"), {"eps": pth},
                         expected=exp3, **KW)
    assert not r3["all_pass"]
    bad = [r for r in r3["rows"] if not r["ok"]]
    assert len(bad) == 1 and bad[0]["table"] == "ddim_eps" \
        and bad[0]["key"] == "MAE_mean"


def test_missing_family_skips_table(fixture):
    d, patch_dir, _ = fixture
    r = run_full_parity(patch_dir, os.path.join(d, "o4"), {},
                        expected=TINY, **KW)
    assert r["tables_ran"] == []
    assert set(r["tables_skipped_no_ckpt"]) == {
        "ddim_eps", "sweep_eps", "true_infer_eps"}
    assert not r["all_pass"]


def test_cli_full_surface(fixture, tmp_path):
    """The --full CLI path end-to-end with an --expected JSON override."""
    d, patch_dir, pth = fixture
    exp_path = str(tmp_path / "expected.json")
    tiny_json = {t: {**v, "config": {k: list(c) if isinstance(c, tuple) else c
                                     for k, c in v.get("config", {}).items()}}
                 for t, v in TINY.items()}
    with open(exp_path, "w") as f:
        json.dump(tiny_json, f)
    from s1s2.cli.validate_parity import main

    main(["--full", "--patch_dir", patch_dir, "--out_dir", str(tmp_path / "o"),
          "--eps_ckpt", pth, "--expected", exp_path,
          "--batch_size", "2", "--T", "20", "--base_ch", "4"])
    rep = json.load(open(tmp_path / "o" / "parity_report.json"))
    assert rep["tables_ran"]
