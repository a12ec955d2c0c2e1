"""Reference cross-validation (round-3): the unmodified reference scripts
and s1s2 must produce matching CSV tables on the same checkpoint + data.

Runs tools/ref_crossval.py end-to-end at the tiniest viable config: trains
a real .pth by executing `/root/reference/Train_Orignal.py`, runs
`/root/reference/Evaluation/DDIM_Multi-step.py` (all 5 modes) and the s1s2
harness on the same converted checkpoint with the torch RNG stream
replayed via --noise_npz, and machine-diffs every CSV column.
"""

import json
import os

import pytest

pytestmark = pytest.mark.slow  # trains torch ckpts + runs 5 reference scripts

REF = os.environ.get("S1S2_REFERENCE_DIR", "/root/reference")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree absent")
def test_crossval_eps_family(tmp_path):
    from tools.ref_crossval import main

    rc = main(["--workdir", str(tmp_path), "--n", "4", "--size", "32",
               "--base_ch", "8", "--epochs", "1", "--n_seeds", "2",
               "--ddim_steps", "5", "--ti_steps", "4", "--ti_seeds", "2",
               "--families", "eps", "pure", "sweep", "misc", "ddpm"])
    assert rc == 0
    report = json.load(open(tmp_path / "report.json"))
    # 7 eps + 4 pure (true_infer, bicubic, linear, tsweep) + 1 sweep
    # + 3 misc (limitation stdout/npy, onestep stdout)
    # + 2 ddpm (ancestral full noise-stream replay: stdout + pred npy)
    assert report["pass"] and report["tables_total"] == 17
    # the core tables agree to the CSV rounding quantum (1e-6), far below
    # the certification tolerance
    ddim = report["tables"]["eps/ddim/ddim_metrics.csv"]
    assert ddim["cols"]["MAE"]["max_dev"] <= 2e-6


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree absent")
def test_crossval_patch_family(tmp_path):
    """The UNMODIFIED reference Patch.py (run under the npy-backed
    rasterio shim) and `s1s2 patchify --exact-filters` must emit
    bit-identical npz fields, manifest counters and preview pixels on a
    synthetic scene set that exercises all four quality filters
    (`/root/reference/Patch.py:205-224,246-305`)."""
    from tools.ref_crossval import main

    rc = main(["--workdir", str(tmp_path), "--families", "patch"])
    assert rc == 0
    report = json.load(open(tmp_path / "report.json"))
    tab = report["tables"]["patch/patchify/npz_fields"]
    assert tab["pass"]
    assert tab["cols"]["npz.inputs"]["max_dev"] == 0.0
    assert tab["cols"]["npz.target"]["max_dev"] == 0.0
    assert tab["cols"]["preview.uint8_max_dev"]["max_dev"] == 0
    # every skip counter must actually fire (scene design contract)
    man = json.load(open(tmp_path / "ref_patchify" / "manifest.json"))
    for k in ("dark_skipped", "texture_skipped", "validratio_skipped",
              "var_skipped"):
        assert man[k] > 0, k
    assert man["total_patches"] > 0


def test_committed_crossval_report_passes():
    """The committed evidence pack (examples/ref_crossval) must carry a
    passing report with both families."""
    path = os.path.join(REPO, "examples", "ref_crossval", "report.json")
    if not os.path.exists(path):
        pytest.skip("committed crossval artifacts not present")
    report = json.load(open(path))
    assert report["pass"]
    # 7 eps + 2 v + 4 pure + 1 sweep + 3 misc + 6 upd + 4 vmisc + 2 ddpm
    # + 1 patch (Patch.py rasterio-shim diff, round 4)
    assert report["tables_total"] >= 29
