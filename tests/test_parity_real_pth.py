"""Standing real-checkpoint parity smoke (VERDICT r4 item 7).

`validate_parity --full` is the day-one command for the published
reference blobs (still stripped from the snapshot). The torch-twin test
(test_parity_driver.py) proves the machinery; THIS suite exercises the
same driver end-to-end every round on the committed REAL
reference-trained weights — `examples/ref_crossval/ref_{eps,v}_model.pth`
were produced by RUNNING the unmodified `Train_Orignal.py` /
`Train_v_Prediction.py` (crossval pack README) — so .pth conversion,
table execution and report generation are certified against genuine
reference artifacts, not reconstructions.

Two-pass protocol (no published numbers exist for these tiny models):
pass 1 discovers the actuals, pass 2 asserts the driver reproduces them
(all_pass), plus sanity bounds on the discovered MAEs.
"""

import os

import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow  # T=1000 tables on CPU, ~1-2 min

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACK = os.path.join(REPO, "examples", "ref_crossval")
EPS_PTH = os.path.join(PACK, "ref_eps_model.pth")
V_PTH = os.path.join(PACK, "ref_v_model.pth")

# shrunken table configs (the real grids are sized for 256² GPU runs);
# base_ch/T/data must match how the crossval pack trained the models
TINY = {
    "ddim_eps": {"config": {"t_start": 200, "ddim_steps": 5}},
    "sweep_eps": {
        "config": {"t_start_grid": (200, 100), "ddim_steps_grid": (5, 10),
                   "max_files": 6},
        "expect": {"200,5": 0.1, "200,10": 0.1, "100,5": 0.1, "100,10": 0.1},
    },
    "true_infer_eps": {
        "config": {"t_start": 999, "ddim_steps": 10, "n_seeds": 2,
                   "max_files": 4},
    },
    # v-family smoke (no published v table survives in the reference; this
    # exercises the v .pth conversion + sampler through the same driver)
    "ddim_v_smoke": {
        "mode": "ddim",
        "pred_param": "v",
        "config": {"t_start": 200, "ddim_steps": 5},
        "expect": {"MAE_mean": 0.1},
        "source": "smoke (no published v table)",
    },
}
KW = dict(rel_tol=0.02, batch_size=4, T=1000, base_ch=16)


@pytest.fixture(scope="module")
def patch_dir(tmp_path_factory):
    from s1s2.data.synthetic import make_synthetic_patches

    d = tmp_path_factory.mktemp("real_pth_patches")
    # the crossval pack's training set: 12 x 32² synthetic patches, seed 0
    make_synthetic_patches(str(d), n=12, size=32, seed=0)
    return str(d)


def test_real_pth_full_parity_two_pass(patch_dir, tmp_path):
    from s1s2.eval.parity import run_full_parity

    assert os.path.exists(EPS_PTH) and os.path.exists(V_PTH)
    ckpts = {"eps": EPS_PTH, "v": V_PTH}
    r1 = run_full_parity(patch_dir, str(tmp_path / "o1"), ckpts,
                         expected=TINY, **KW)
    assert set(r1["tables_ran"]) == set(TINY)
    assert r1["tables_skipped_no_ckpt"] == []
    actuals = {}
    for row in r1["rows"]:
        assert row["actual"] is not None, row
        actuals.setdefault(row["table"], {})[row["key"]] = row["actual"]
    # sanity: real trained weights produce reconstruction-quality numbers
    assert 0.0 < actuals["ddim_eps"]["MAE_mean"] < 0.5
    for v in actuals["sweep_eps"].values():
        assert 0.0 < v < 0.5
    assert 0.0 < actuals["ddim_v_smoke"]["MAE_mean"] < 0.5

    exp2 = {t: dict(TINY[t], expect=actuals[t]) for t in TINY}
    r2 = run_full_parity(patch_dir, str(tmp_path / "o2"), ckpts,
                         expected=exp2, **KW)
    assert r2["all_pass"], r2["rows"]
    assert os.path.exists(tmp_path / "o2" / "parity_report.json")


def test_real_pth_cli_surface(patch_dir, tmp_path):
    """The exact CLI line BASELINE.md prescribes for the published blobs,
    driven with the real crossval-trained ε checkpoint."""
    import json

    from s1s2.cli.validate_parity import main

    exp_path = str(tmp_path / "expected.json")
    with open(exp_path, "w") as f:
        json.dump({"ddim_eps": {"config": {"t_start": 200,
                                           "ddim_steps": 5}}}, f)
    main(["--full", "--patch_dir", patch_dir,
          "--out_dir", str(tmp_path / "o"), "--eps_ckpt", EPS_PTH,
          "--expected", exp_path, "--batch_size", "4", "--T", "1000",
          "--base_ch", "16"])
    rep = json.load(open(tmp_path / "o" / "parity_report.json"))
    assert "ddim_eps" in rep["tables_ran"]
    row = [r for r in rep["rows"] if r["key"] == "MAE_mean"][0]
    assert row["actual"] is not None and 0.0 < row["actual"] < 0.5
