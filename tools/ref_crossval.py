"""Cross-validation against the reference's OWN executable scripts.

Upgrades the torch-twin parity claims to "the reference code itself
agrees": this driver

  1. generates a deterministic synthetic patch set (the npz contract both
     sides read),
  2. trains real ``.pth`` checkpoints by RUNNING the unmodified reference
     trainers (`/root/reference/Train_Orignal.py:218-336`,
     `Train_v_Prediction.py:277-444`) on CPU torch,
  3. runs the unmodified reference eval scripts
     (`Evaluation/DDIM_Multi-step.py:173-393`,
     `Evaluation/DDIM_Multi-step_v_Prediction.py` ddim/vdiag,
     `Evaluation_Updated/Evaluation_Pure_Generation.py` true_infer +
     baseline_bicubic/linear, `Evaluation/Comparison_Original.py` tsweep,
     `Evaluation/DDIM_Sweep.py` ddim_sweep — five reference scripts) on
     them — wrapped only by a global ``torch.manual_seed`` so their
     stream-consuming noise draws are reproducible,
  4. replays the exact same torch RNG streams into the s1s2 harness via
     ``evaluate --noise_npz`` (keys ``s{salt}_i{index}``), running every
     matching mode on the CONVERTED checkpoint (.pth loaded through
     models/convert.py) with f32 compute and highest matmul precision,
  5. machine-diffs the per-file CSV tables column by column and writes
     ``report.json`` with max deviations + pass/fail per table.

Noise-stream replication map (torch global stream seeded GLOBAL_SEED):
  ddim / eps / per_band / vdiag — one randn(1,Ct,H,W) per file in sorted
  order (sequential stream; `DDIM_Multi-step.py:121,145,162`);
  seed_stats — torch.manual_seed(seed_base+s) before each draw, so the
  SAME noise for every file at seed s (`DDIM_Multi-step.py:156-157,273`);
  ablate — torch.manual_seed(seed_base) per file → one shared base noise
  (`DDIM_Multi-step.py:360-361`);
  true_infer — re-seeded seed_base+s per (file, seed) → per-seed shared
  init (`Evaluation_Pure_Generation.py:550`, salt 5000+s);
  tsweep — manual_seed(seed_base) per file → one shared noise
  (`Comparison_Original.py:420-421`, salt 99);
  ddim_sweep — manual_seed(seed_base+i) per FILE, shared across grid
  configs (`DDIM_Sweep.py:404`, separate npz at salt 0).

Usage:
    python tools/ref_crossval.py --workdir /tmp/crossval \
        [--n 12 --size 32 --base_ch 16 --epochs 8] \
        [--families eps v] [--keep_artifacts DIR]
"""

import argparse
import csv
import json
import math
import os
import re
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_DIR = os.environ.get("S1S2_REFERENCE_DIR", "/root/reference")
GLOBAL_SEED = 777

# per-column absolute tolerances: both sides compute in f32, but torch and
# XLA convolutions differ in reduction order; deviations accumulate over the
# 20-step sampler. Calibrated from observed runs (report the measured max).
TOLS = {"PSNR": 5e-2, "cosine": 5e-4, "eps_MSE": 5e-4, "v_MSE": 5e-4,
        "v_cos": 5e-4, "eps_cos": 5e-4,
        # SAM CSV quantum 1e-4 rad; ERGAS quantum 0.01 at O(100) magnitude
        "SAM_mean": 2e-3, "SAM(rad)": 2e-3, "ERGAS_mean": 0.05, "ERGAS": 0.05}
DEFAULT_TOL = 5e-4


def log(msg):
    print(f"[crossval] {msg}", flush=True)


def run_ref_script(script, argv, seed=GLOBAL_SEED, log_path=None):
    """Run an UNMODIFIED reference script in a subprocess with a controlled
    torch global RNG: seeded up front, and RE-seeded right after the
    script's ``torch.load`` of the checkpoint. The re-seed pins the stream
    at the point where the eval loop starts — the scripts construct
    UNetSmall (whose torch-side weight init consumes an
    architecture-dependent number of draws) before loading the checkpoint,
    so seeding only at import time would leave the per-file randn draws at
    an unpredictable stream offset."""
    code = (
        "import torch, runpy, sys\n"
        f"torch.manual_seed({seed})\n"
        "_orig_load = torch.load\n"
        "def _load_and_reseed(*a, **k):\n"
        "    out = _orig_load(*a, **k)\n"
        f"    torch.manual_seed({seed})\n"
        "    return out\n"
        "torch.load = _load_and_reseed\n"
        f"sys.argv = {[script] + [str(a) for a in argv]!r}\n"
        f"runpy.run_path({script!r}, run_name='__main__')\n"
    )
    with open(log_path or os.devnull, "w") as lf:
        subprocess.run([sys.executable, "-c", code], check=True,
                       stdout=lf, stderr=lf, cwd=os.path.dirname(script))


def build_noise_npz(path, n_files, H, W, Ct, n_seeds, seed_base):
    import torch

    out = {}
    torch.manual_seed(GLOBAL_SEED)
    for i in range(n_files):
        z = torch.randn(1, Ct, H, W)[0].permute(1, 2, 0).numpy()
        out[f"s0_i{i}"] = z       # ddim / eps / vdiag (sequential stream)
        # per_band is a fresh re-seeded reference process consuming the
        # stream in the same order → identical arrays under salt 7
        out[f"s7_i{i}"] = z
    for s in range(n_seeds):
        torch.manual_seed(seed_base + s)
        z = torch.randn(1, Ct, H, W)[0].permute(1, 2, 0).numpy()
        for i in range(n_files):
            out[f"s{1000 + s}_i{i}"] = z
        # true_infer re-seeds identically per (file, seed)
        # (`Evaluation_Pure_Generation.py:550`) → same init for every file;
        # s1s2's run_true_infer reads salt 5000+s
        for i in range(n_files):
            out[f"s{5000 + s}_i{i}"] = z
    torch.manual_seed(seed_base)
    out["s99_i0"] = torch.randn(1, Ct, H, W)[0].permute(1, 2, 0).numpy()
    import numpy as np

    np.savez(path, **out)
    return path


# ---------------------------------------------------------------------------
# patch family: the unmodified Patch.py under the rasterio shim
# (closes the 14th-reference-file gap — `/root/reference/Patch.py:118-310`)
# ---------------------------------------------------------------------------


def _save_img(path, arr):
    """npy bytes at the exact reference band filename (np.save to an open
    handle so numpy can't append ``.npy``); read back by the shim."""
    import numpy as np

    with open(path, "wb") as f:
        np.save(f, np.asarray(arr, np.float32))


def build_patch_scenes(base_dir):
    """Two synthetic collocated scenes exercising every Patch.py branch:
    the 0..10000 reflectance-scaling heuristic, all four quality-filter
    skip counters (valid-ratio / variance / dark / texture,
    `Patch.py:205-224`), the Sigma0 filename fallback chain
    (`Patch.py:172-176`), collocationFlags masking and NaN inputs.

    Filter-critical region statistics are designed with wide margins from
    the thresholds (var 4e-4 vs 1e-4; dark values <0.08 vs thr 0.10) so
    f32-vs-f64 accumulation-order differences can't flip a decision."""
    import numpy as np

    rng = np.random.default_rng(2024)

    # ---- scene A: 96², raw 0..10000 range, colloc flags, ε of everything
    a = os.path.join(base_dir, "scene_a_collocated.data")
    os.makedirs(a, exist_ok=True)
    S = 96
    bands = {}
    for name in ("B2", "B3", "B4", "B8"):
        y = 3000.0 + 2500.0 * rng.random((S, S))   # textured, q95 > 2.0
        y[0:32, 32:64] = 100.0 + 700.0 * rng.random((32, 32))   # dark
        y[64:96, 0:32] = 5000.0                                  # flat
        y[64:96, 64:96] = np.linspace(2000.0, 8000.0, 32)[None, :]  # ramp
        bands[name] = y
    bands["B2"][32:64, 64:96] = np.nan            # → valid-ratio skips
    for name, y in bands.items():
        _save_img(os.path.join(a, f"{name}.img"), y)
    hh = rng.normal(-12.0, 3.0, (S, S))
    hv = rng.normal(-19.0, 3.0, (S, S))
    hv[0:8, 0:8] = np.nan                          # input NaNs → mask
    _save_img(os.path.join(a, "Sigma0_HH_db_m.img"), hh)
    _save_img(os.path.join(a, "Sigma0_HV_db_m.img"), hv)
    _save_img(os.path.join(a, "projectedLocalIncidenceAngle_m.img"),
              20.0 + 25.0 * rng.random((S, S)))
    _save_img(os.path.join(a, "elevation_ref_egm2008.img"),
              2000.0 * rng.random((S, S)))
    colloc = np.ones((S, S), np.float32)
    # 8×8 colloc-masked corner: big enough to exercise the colloc branch
    # of build_mask, small enough (vr 0.9375 > 0.8) that the ramp window
    # still reaches the TEXTURE filter instead of valid-ratio-skipping
    colloc[88:96, 88:96] = 0.0
    _save_img(os.path.join(a, "collocationFlags.img"), colloc)

    # ---- scene B: 64², already 0..1 (no scaling), corr024 S1 fallback,
    # no collocationFlags
    b = os.path.join(base_dir, "scene_b_collocated.data")
    os.makedirs(b, exist_ok=True)
    S = 64
    for name in ("B2", "B3", "B4", "B8"):
        y = 0.2 + 0.6 * rng.random((S, S))
        if name == "B8":
            y[0:6, 0:6] = np.nan
        _save_img(os.path.join(b, f"{name}.img"), y)
    _save_img(os.path.join(b, "Sigma0_HH_db_corr024_m.img"),
              rng.normal(-10.0, 2.0, (S, S)))
    _save_img(os.path.join(b, "Sigma0_HV_db_corr024_m.img"),
              rng.normal(-17.0, 2.0, (S, S)))
    _save_img(os.path.join(b, "projectedLocalIncidenceAngle_m.img"),
              30.0 + 10.0 * rng.random((S, S)))
    _save_img(os.path.join(b, "elevation_ref_egm2008.img"),
              500.0 * rng.random((S, S)))

    # a folder with no band data must be skipped by both sides
    os.makedirs(os.path.join(base_dir, "scene_empty.data"), exist_ok=True)
    return base_dir


def run_ref_patchify(base_dir, out_dir, ps, stride, log_path):
    """Run the UNMODIFIED reference Patch.py with the npy-backed rasterio
    shim pre-installed (`tools/rasterio_shim.py`)."""
    script = os.path.join(REF_DIR, "Patch.py")
    argv = [script, "--base-dir", base_dir, "--output-dir", out_dir,
            "--patch-size", str(ps), "--stride", str(stride)]
    code = (
        "import sys\n"
        f"sys.path.insert(0, {os.path.join(REPO, 'tools')!r})\n"
        "import rasterio_shim\n"
        "rasterio_shim.install()\n"
        f"sys.argv = {argv!r}\n"
        "import runpy\n"
        f"runpy.run_path({script!r}, run_name='__main__')\n"
    )
    with open(log_path or os.devnull, "w") as lf:
        subprocess.run([sys.executable, "-c", code], check=True,
                       stdout=lf, stderr=lf, cwd=os.path.dirname(script))


def run_s1s2_patchify(base_dir, out_dir, ps, stride, log_path):
    """Run s1s2 patchify in a subprocess with the SAME shim installed, so
    the real-rasterio branch of `s1s2/data/patchify.py:read_band/get_geo`
    executes (the .img band files exist, forcing the rasterio code path).
    --exact-filters selects the per-window Laplacian routine (bit parity
    with the reference instead of the integral-image fast path)."""
    argv = ["--base-dir", base_dir, "--output-dir", out_dir,
            "--patch-size", str(ps), "--stride", str(stride),
            "--exact-filters"]
    code = (
        "import sys\n"
        f"sys.path.insert(0, {os.path.join(REPO, 'tools')!r})\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "import rasterio_shim\n"
        "rasterio_shim.install()\n"
        "from s1s2.cli.patchify import main\n"
        f"main({argv!r})\n"
    )
    with open(log_path or os.devnull, "w") as lf:
        subprocess.run([sys.executable, "-c", code], check=True,
                       stdout=lf, stderr=lf)


def diff_patchify(ref_dir, got_dir, report, table_name, atol=1e-6):
    """Field-by-field diff of the Patch.py output contract
    (`Patch.py:246-255,288-305`): manifest skip counters + entries, every
    npz's inputs/target/mask/geo-meta, and the preview PNG pixels of the
    first patch."""
    import numpy as np

    entry = {"ref": ref_dir, "s1s2": got_dir, "cols": {}, "pass": True}

    def col(name, ok, dev=None):
        c = {"pass": bool(ok)}
        if dev is not None:
            c["max_dev"] = float(dev)
            c["tol"] = atol
        entry["cols"][name] = c
        entry["pass"] = entry["pass"] and bool(ok)

    ref_man = json.load(open(os.path.join(ref_dir, "manifest.json")))
    got_man = json.load(open(os.path.join(got_dir, "manifest.json")))
    for k in ("total_patches", "dark_skipped", "texture_skipped",
              "validratio_skipped", "var_skipped", "patch_size", "stride"):
        col(f"manifest.{k}", ref_man[k] == got_man[k])
    ents_ok = len(ref_man["patches"]) == len(got_man["patches"]) and all(
        r["patch_id"] == g["patch_id"] and r["folder"] == g["folder"]
        and r["npz"] == g["npz"] and r["row"] == g["row"]
        and r["col"] == g["col"]
        and abs(r["valid_ratio"] - g["valid_ratio"]) <= atol
        for r, g in zip(ref_man["patches"], got_man["patches"]))
    col("manifest.patches", ents_ok)

    ref_npz = sorted(f for f in os.listdir(ref_dir) if f.endswith(".npz"))
    got_npz = sorted(f for f in os.listdir(got_dir) if f.endswith(".npz"))
    col("npz.file_list", ref_npz == got_npz and len(ref_npz) > 0)
    devs = {"inputs": 0.0, "target": 0.0, "valid_ratio": 0.0}
    meta_ok = mask_ok = True
    for fn in ref_npz:
        if fn not in got_npz:
            continue
        r = np.load(os.path.join(ref_dir, fn), allow_pickle=True)
        g = np.load(os.path.join(got_dir, fn), allow_pickle=True)
        for k in ("inputs", "target"):
            devs[k] = max(devs[k],
                          float(np.abs(r[k] - g[k]).max()) if r[k].shape ==
                          g[k].shape else math.inf)
        mask_ok &= bool(np.array_equal(r["mask"], g["mask"]))
        devs["valid_ratio"] = max(
            devs["valid_ratio"],
            abs(float(r["valid_ratio"]) - float(g["valid_ratio"])))
        meta_ok &= (str(r["folder"]) == str(g["folder"])
                    and str(r["crs"]) == str(g["crs"])
                    and int(r["row"]) == int(g["row"])
                    and int(r["col"]) == int(g["col"])
                    and int(r["patch_size"]) == int(g["patch_size"])
                    and int(r["stride"]) == int(g["stride"])
                    and np.allclose(np.asarray(r["transform"], np.float64),
                                    np.asarray(g["transform"], np.float64)))
    for k, d in devs.items():
        col(f"npz.{k}", d <= atol, dev=d)
    col("npz.mask", mask_ok)
    col("npz.geo_meta", meta_ok)

    # preview parity: identical uint8 pixels for the first patch's panels
    # (same percentile-stretch formula both sides, `Patch.py:64-78`)
    if ref_npz:
        from PIL import Image

        stem = ref_npz[0][: -len(".npz")]
        pdev = 0
        for png in ("true_color.png", "false_color_CIR.png", "B8.png",
                    "HH_dB_std.png"):
            rp = os.path.join(ref_dir, "preview_patches", stem, png)
            gp = os.path.join(got_dir, "preview_patches", stem, png)
            if not (os.path.exists(rp) and os.path.exists(gp)):
                pdev = 255
                break
            ra = np.asarray(Image.open(rp), np.int16)
            ga = np.asarray(Image.open(gp), np.int16)
            pdev = max(pdev, int(np.abs(ra - ga).max())
                       if ra.shape == ga.shape else 255)
        entry["cols"]["preview.uint8_max_dev"] = {
            "max_dev": pdev, "tol": 0, "pass": pdev == 0}
        entry["pass"] = entry["pass"] and pdev == 0

    report[table_name] = entry
    return entry


def build_sweep_noise_npz(path, n_files, H, W, Ct, seed_base):
    """DDIM_Sweep fixes per-file noise by ``torch.manual_seed(seed_base+i)``
    before each file's anchored init draw (`Evaluation/DDIM_Sweep.py:404`);
    s1s2's run_ddim_sweep reads the default salt 0."""
    import numpy as np
    import torch

    out = {}
    for i in range(n_files):
        torch.manual_seed(seed_base + i)
        out[f"s0_i{i}"] = torch.randn(1, Ct, H, W)[0].permute(1, 2, 0).numpy()
    np.savez(path, **out)
    return path


def build_limitation_noise_npz(path, n_files, H, W, Ct, batch_size, ks):
    """Limitation_Test.py consumes the global torch stream sequentially
    (wrapper reseeds GLOBAL_SEED after torch.load): batch-0 init draw
    (`Limitation_Test.py:231`), then ONE partial-reverse draw per k — the
    diagnostic runs inside the loop at i==0 (`:358-366`) — then the
    remaining batch init draws. s1s2's run_limitation reads init noise at
    salt 300 (LIMITATION_SALT) and partial-k noise at salt 310+k."""
    import numpy as np
    import torch

    out = {}
    torch.manual_seed(GLOBAL_SEED)
    # the DataLoader draws one int64 _base_seed from the default generator
    # at iterator creation, BEFORE any batch init draw (verified empirically
    # against torch 2.x _BaseDataLoaderIter.__init__)
    torch.empty((), dtype=torch.int64).random_()

    def draw(bs):
        return torch.randn(bs, Ct, H, W).permute(0, 2, 3, 1).numpy()

    b0 = min(batch_size, n_files)
    z = draw(b0)
    for j in range(b0):
        out[f"s300_i{j}"] = z[j]
    for k in ks:
        zk = draw(b0)
        for j in range(b0):
            out[f"s{310 + int(k)}_i{j}"] = zk[j]
    i = b0
    while i < n_files:
        bs = min(batch_size, n_files - i)
        z = draw(bs)
        for j in range(bs):
            out[f"s300_i{i + j}"] = z[j]
        i += bs
    np.savez(path, **out)
    return path


def build_limitation_ddpm_noise_npz(path, n_files, H, W, Ct, batch_size, T):
    """Limitation_Test.py --mode ddpm consumes, per batch: one init
    randn(bs,C,H,W) (`Limitation_Test.py:212`) then T-1 randn_like draws,
    one per step t=T-1..1 (`:221`; none at t=0) — after the DataLoader's
    _base_seed int64 draw. Stored per file as the FULL (T,H,W,C) stream
    (slot 0 = init, slot j = step-j draw) so s1s2's ddpm replay path can
    re-consume it exactly (salt 300 = LIMITATION_SALT)."""
    import numpy as np
    import torch

    out = {}
    torch.manual_seed(GLOBAL_SEED)
    torch.empty((), dtype=torch.int64).random_()
    i = 0
    while i < n_files:
        bs = min(batch_size, n_files - i)
        stream = np.empty((T, bs, H, W, Ct), np.float32)
        stream[0] = torch.randn(bs, Ct, H, W).permute(0, 2, 3, 1).numpy()
        for j in range(1, T):
            stream[j] = torch.randn(bs, Ct, H, W).permute(0, 2, 3, 1).numpy()
        for j in range(bs):
            out[f"s300_i{i + j}"] = stream[:, j]
        i += bs
    np.savez(path, **out)
    return path


def build_limitation_v_noise_npz(path, n_files, H, W, Ct, batch_size,
                                 steps, T):
    """sample_ddim_v consumes the stream per batch: one scaled-init draw,
    then one randn_like per non-final grid step EVEN at eta=0
    (`Limitation_Test_v_Prediction.py:253`, the σ·randn term is drawn
    unconditionally) — plus the DataLoader's _base_seed int64 draw up
    front. Only the init draws are stored (salt 300); the per-step draws
    are consumed to keep the stream aligned."""
    import numpy as np
    import torch

    idxs = torch.unique(
        torch.round(torch.linspace(0, T - 1, steps)).to(torch.long),
        sorted=True)
    n_step_draws = len(idxs) - 1
    out = {}
    torch.manual_seed(GLOBAL_SEED)
    torch.empty((), dtype=torch.int64).random_()
    i = 0
    while i < n_files:
        bs = min(batch_size, n_files - i)
        z = torch.randn(bs, Ct, H, W).permute(0, 2, 3, 1).numpy()
        for j in range(bs):
            out[f"s300_i{i + j}"] = z[j]
        for _ in range(n_step_draws):
            torch.randn(bs, Ct, H, W)
        i += bs
    np.savez(path, **out)
    return path


def build_onestep_noise_npz(path, H, W, Ct):
    """Onestep.py draws one randn_like(x_gt) for the first file right after
    the (wrapper-reseeded) torch.load (`Evaluation/Onestep.py:155`);
    s1s2's run_onestep reads salt 0, index 0 at --batch_size 1."""
    import numpy as np
    import torch

    torch.manual_seed(GLOBAL_SEED)
    z = torch.randn(1, Ct, H, W)[0].permute(1, 2, 0).numpy()
    np.savez(path, s0_i0=z)
    return path


# "[partial-reverse k=5] MAE=0.1  MSE=0.2  PSNR=3.4 dB" / " B2:  MAE=…" /
# "MAE:  0.123456" — uppercase names only (tqdm's lowercase postfix noise
# in the merged ref log never matches)
_METRIC_PAIR = re.compile(
    r"(MAE_w|MSE_w|PSNR_w|MAE|MSE|PSNR)[=:]\s*(-?\d+(?:\.\d+)?)")


def parse_metric_lines(path):
    """{line-prefix + metric-name: value} from reference stdout logs or
    s1s2 *_summary.txt files."""
    vals = {}
    for ln in open(path, errors="replace"):
        ln = ln.rstrip("\n")
        # tqdm redraws share the line with real prints in merged ref logs
        # (carriage-return splicing) — cut at the last diagnostic marker
        if "[partial-reverse" in ln:
            ln = ln[ln.rindex("[partial-reverse"):]
        # Comparison_v prints "[t=0] MAE~0 | [one-step@t=20] MAE=… MSE=…";
        # keep the one-step segment so the prefix matches onestep_summary
        if " | " in ln and "[one-step@" in ln:
            ln = ln[ln.rindex(" | ") + 3:]
        pairs = list(_METRIC_PAIR.finditer(ln))
        if not pairs:
            continue
        prefix = ln[: pairs[0].start()].strip().rstrip(":").strip()
        for m in pairs:
            vals[f"{prefix}{'/' if prefix else ''}{m.group(1)}"] = float(
                m.group(2))
    return vals


def diff_text_metrics(ref_log, got_txt, report, table_name):
    """Diff every printed metric line (aggregates, per-channel rows,
    partial-reverse diagnostics) between a reference stdout log and the
    matching s1s2 summary file."""
    ref_v, got_v = parse_metric_lines(ref_log), parse_metric_lines(got_txt)
    entry = {"ref": ref_log, "s1s2": got_txt, "cols": {}, "pass": True}
    missing = sorted(set(ref_v) - set(got_v))
    if missing:
        entry["pass"] = False
        entry["error"] = f"missing metric lines: {missing[:4]}"
        report[table_name] = entry
        return entry
    for key, rv in ref_v.items():
        dev = abs(rv - got_v[key])
        tol = TOLS["PSNR"] if "PSNR" in key else DEFAULT_TOL
        entry["cols"][key] = {"max_dev": dev, "tol": tol, "pass": dev <= tol}
        entry["pass"] = entry["pass"] and dev <= tol
    report[table_name] = entry
    return entry


def diff_npy_preds(ref_dir, got_dir, report, table_name, atol=5e-3):
    """Element-wise diff of the saved *_pred.npy sample arrays (identical
    stem naming on both sides)."""
    import numpy as np

    ref_files = sorted(f for f in os.listdir(ref_dir)
                       if f.endswith("_pred.npy"))
    entry = {"ref": ref_dir, "s1s2": got_dir, "cols": {}, "pass": True,
             "rows": len(ref_files)}
    if not ref_files:
        entry["pass"] = False
        entry["error"] = "no *_pred.npy in reference output"
        report[table_name] = entry
        return entry
    worst = 0.0
    for f in ref_files:
        gp = os.path.join(got_dir, f)
        if not os.path.exists(gp):
            entry["pass"] = False
            entry["error"] = f"missing {f}"
            report[table_name] = entry
            return entry
        dev = float(np.max(np.abs(np.load(os.path.join(ref_dir, f))
                                  - np.load(gp))))
        worst = max(worst, dev)
    entry["cols"]["pred_abs"] = {"max_dev": worst, "tol": atol,
                                 "pass": worst <= atol}
    entry["pass"] = worst <= atol
    report[table_name] = entry
    return entry


def diff_csv(ref_csv, got_csv, report, table_name):
    """Column-wise |Δ| max over matching rows; pass/fail vs tolerance."""
    def read(p):
        with open(p) as f:
            return list(csv.DictReader(f))

    ref_rows, got_rows = read(ref_csv), read(got_csv)
    entry = {"ref": ref_csv, "s1s2": got_csv, "rows": len(ref_rows),
             "cols": {}, "pass": True}
    if len(ref_rows) != len(got_rows):
        entry["pass"] = False
        entry["error"] = f"row count {len(ref_rows)} vs {len(got_rows)}"
        report[table_name] = entry
        return entry
    keycol = list(ref_rows[0].keys())[0]
    got_by_key = {}
    for r in got_rows:
        got_by_key.setdefault(r[keycol], []).append(r)
    for r in ref_rows:
        if r[keycol] not in got_by_key or not got_by_key[r[keycol]]:
            entry["pass"] = False
            entry["error"] = f"missing row key {r[keycol]!r}"
            report[table_name] = entry
            return entry
        g = got_by_key[r[keycol]].pop(0)
        for col, val in r.items():
            try:
                rv = float(val)
            except (TypeError, ValueError):
                continue  # non-numeric column (file name, mode strings)
            gv = float(g[col])
            if math.isnan(rv) and math.isnan(gv):
                continue
            dev = abs(rv - gv)
            c = entry["cols"].setdefault(col, {"max_dev": 0.0})
            c["max_dev"] = max(c["max_dev"], dev)
    for col, c in entry["cols"].items():
        base = col.split("_")[-1] if col.split("_")[-1] in TOLS else col
        tol = TOLS.get(col, TOLS.get(base, DEFAULT_TOL))
        # band{b}_PSNR etc.
        if "PSNR" in col:
            tol = TOLS["PSNR"]
        c["tol"] = tol
        c["pass"] = c["max_dev"] <= tol
        entry["pass"] = entry["pass"] and c["pass"]
    report[table_name] = entry
    return entry


def run_s1s2_eval(mode, patch_dir, ckpt, out_dir, base_ch, noise_npz,
                  param="eps", n_seeds=4, extra=()):
    from s1s2.cli.evaluate import main as eval_main

    eval_main([
        "--mode", mode, "--patch_dir", patch_dir, "--ckpt", ckpt,
        "--out_dir", out_dir, "--base_ch", str(base_ch),
        "--compute_dtype", "float32", "--pred_param", param,
        "--noise_npz", noise_npz, "--n_seeds", str(n_seeds),
        "--save_viz_n", "0", "--batch_size", "4", *extra,
    ])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--n", type=int, default=12)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--base_ch", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--n_seeds", type=int, default=4)
    ap.add_argument("--seed_base", type=int, default=1234)
    ap.add_argument("--t_start", type=int, default=200)
    ap.add_argument("--ddim_steps", type=int, default=20)
    ap.add_argument("--families", nargs="*",
                    default=["eps", "v", "pure", "sweep", "misc", "upd",
                             "vmisc", "ddpm", "patch"],
                    choices=["eps", "v", "pure", "sweep", "misc", "upd",
                             "vmisc", "ddpm", "patch"],
                    help="eps/v: DDIM_Multi-step(+_v) tables; pure: "
                         "Evaluation_Pure_Generation true_infer + classical "
                         "baselines + Comparison_Original tsweep; sweep: "
                         "DDIM_Sweep grid; misc: Limitation_Test full-range "
                         "ddim (stdout metrics + saved pred arrays) and "
                         "Onestep; upd: Evaluation_Updated/Evaluation.py six "
                         "modes (pure/sweep/misc/upd reuse the eps ckpt)")
    ap.add_argument("--ti_steps", type=int, default=10,
                    help="true_infer DDIM steps (pure section)")
    ap.add_argument("--ti_seeds", type=int, default=3,
                    help="true_infer seeds per file (pure section)")
    ap.add_argument("--keep_artifacts", default=None,
                    help="copy .pth + CSVs + report into this dir (commit)")
    ap.add_argument("--reuse", action="store_true",
                    help="skip steps whose outputs already exist in workdir")
    args = ap.parse_args(argv)

    # s1s2 side runs on CPU at f32/highest — certification is numerical
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:  # backend already initialized (e.g. under pytest)
        pass
    jax.config.update("jax_default_matmul_precision", "highest")
    import numpy as np  # noqa: F401

    from s1s2.data.synthetic import make_synthetic_patches

    wd = os.path.abspath(args.workdir)
    patches = os.path.join(wd, "patches")
    os.makedirs(wd, exist_ok=True)
    if not (args.reuse and os.path.isdir(patches) and os.listdir(patches)):
        make_synthetic_patches(patches, n=args.n, size=args.size, seed=0)
    log(f"patches: {args.n} × {args.size}² at {patches}")

    n_files = args.n
    H = W = args.size
    Ct = 4
    noise_npz = build_noise_npz(os.path.join(wd, "ref_noise.npz"),
                                n_files, H, W, Ct, args.n_seeds,
                                args.seed_base)

    report = {"config": {k: getattr(args, k) for k in
                         ("n", "size", "base_ch", "epochs", "n_seeds",
                          "t_start", "ddim_steps")},
              "global_seed": GLOBAL_SEED, "tables": {}}
    tables = report["tables"]

    def ensure_eps_ckpt():
        ckpt = os.path.join(wd, "ref_eps", "model.pth")
        if not os.path.exists(ckpt):
            os.makedirs(os.path.dirname(ckpt), exist_ok=True)
            log(f"training reference ε model ({args.epochs} epochs, torch CPU)…")
            run_ref_script(
                os.path.join(REF_DIR, "Train_Orignal.py"),
                ["--patch_dir", patches, "--model_path", ckpt,
                 "--epochs", args.epochs, "--base_ch", args.base_ch,
                 "--batch_size", "4"],
                log_path=os.path.join(wd, "train_eps.log"))
        return ckpt

    # ---------------- ε family ----------------
    if "eps" in args.families:
        ckpt = ensure_eps_ckpt()
        eps_tables = {
            "ddim": ["ddim_metrics.csv"],
            "eps": ["eps_diag.csv"],
            "seed_stats": ["seed_stats.csv"],
            "per_band": ["per_band_all.csv", "per_band_summary.csv"],
            "ablate": ["ablate_all.csv", "ablate_summary.csv"],
        }
        script = os.path.join(REF_DIR, "Evaluation", "DDIM_Multi-step.py")
        for mode in ("ddim", "eps", "seed_stats", "per_band", "ablate"):
            ref_out = os.path.join(wd, "ref_eval_eps", mode)
            if not (args.reuse and
                    os.path.exists(os.path.join(ref_out, eps_tables[mode][0]))):
                os.makedirs(ref_out, exist_ok=True)
                log(f"reference eval (ε) mode={mode}…")
                run_ref_script(script, [
                    "--mode", mode, "--patch_dir", patches, "--ckpt", ckpt,
                    "--out_dir", ref_out, "--base_ch", args.base_ch,
                    "--t_start", args.t_start,
                    "--ddim_steps", args.ddim_steps,
                    "--n_seeds", args.n_seeds, "--seed_base", args.seed_base,
                    "--save_viz_n", "0",
                ], log_path=os.path.join(ref_out, "run.log"))
            got_out = os.path.join(wd, "s1s2_eval_eps", mode)
            log(f"s1s2 eval (ε, converted .pth) mode={mode}…")
            run_s1s2_eval(mode, patches, ckpt, got_out, args.base_ch,
                          noise_npz, param="eps", n_seeds=args.n_seeds,
                          extra=("--t_start", str(args.t_start),
                                 "--ddim_steps", str(args.ddim_steps),
                                 "--seed_base", str(args.seed_base)))
            for table in eps_tables[mode]:
                e = diff_csv(os.path.join(ref_out, table),
                             os.path.join(got_out, table),
                             tables, f"eps/{mode}/{table}")
                log(f"  {table}: "
                    + ("PASS" if e["pass"] else "FAIL")
                    + " " + json.dumps({c: round(v["max_dev"], 8)
                                        for c, v in e.get("cols", {}).items()}))

    def ensure_v_ckpt():
        ckpt = os.path.join(wd, "ref_v", "model.pth")
        if not os.path.exists(ckpt):
            os.makedirs(os.path.dirname(ckpt), exist_ok=True)
            log(f"training reference v model ({args.epochs} epochs, torch CPU)…")
            run_ref_script(
                os.path.join(REF_DIR, "Train_v_Prediction.py"),
                ["--patch_dir", patches, "--model_path", ckpt,
                 "--epochs", args.epochs, "--base_ch", args.base_ch,
                 "--batch_size", "4"],
                log_path=os.path.join(wd, "train_v.log"))
        return ckpt

    # ---------------- v family ----------------
    if "v" in args.families:
        ckpt = ensure_v_ckpt()
        script = os.path.join(REF_DIR, "Evaluation",
                              "DDIM_Multi-step_v_Prediction.py")
        v_tables = {"ddim": ["ddim_metrics.csv"], "vdiag": ["vdiag.csv"]}
        for mode in ("ddim", "vdiag"):
            ref_out = os.path.join(wd, "ref_eval_v", mode)
            if not (args.reuse and
                    os.path.exists(os.path.join(ref_out, v_tables[mode][0]))):
                os.makedirs(ref_out, exist_ok=True)
                log(f"reference eval (v) mode={mode}…")
                run_ref_script(script, [
                    "--mode", mode, "--patch_dir", patches, "--ckpt", ckpt,
                    "--out_dir", ref_out, "--base_ch", args.base_ch,
                    "--t_start", args.t_start,
                    "--ddim_steps", args.ddim_steps, "--ddim_eta", "0",
                    "--n_seeds", args.n_seeds, "--seed_base", args.seed_base,
                    "--save_viz_n", "0",
                ], log_path=os.path.join(ref_out, "run.log"))
            got_out = os.path.join(wd, "s1s2_eval_v", mode)
            log(f"s1s2 eval (v, converted .pth) mode={mode}…")
            run_s1s2_eval(mode, patches, ckpt, got_out, args.base_ch,
                          noise_npz, param="v", n_seeds=args.n_seeds,
                          extra=("--t_start", str(args.t_start),
                                 "--ddim_steps", str(args.ddim_steps),
                                 "--seed_base", str(args.seed_base),
                                 "--eta", "0"))
            for table in v_tables[mode]:
                e = diff_csv(os.path.join(ref_out, table),
                             os.path.join(got_out, table),
                             tables, f"v/{mode}/{table}")
                log(f"  {table}: "
                    + ("PASS" if e["pass"] else "FAIL")
                    + " " + json.dumps({c: round(v["max_dev"], 8)
                                        for c, v in e.get("cols", {}).items()}))

    # ------- pure-generation script: true_infer + baselines + tsweep -------
    # (Evaluation_Updated/Evaluation_Pure_Generation.py:536-573,729-773 and
    #  Evaluation/Comparison_Original.py:410-446 — two more reference
    #  scripts certified, on the ε checkpoint)
    if "pure" in args.families:
        ckpt = ensure_eps_ckpt()
        pure_script = os.path.join(REF_DIR, "Evaluation_Updated",
                                   "Evaluation_Pure_Generation.py")

        # true_infer: per-seed re-seeded full-noise DDIM generation
        ref_out = os.path.join(wd, "ref_eval_pure", "true_infer")
        if not (args.reuse and os.path.exists(
                os.path.join(ref_out, "ddim_true_infer_metrics.csv"))):
            os.makedirs(ref_out, exist_ok=True)
            log("reference eval (pure) mode=ddim --true_infer…")
            run_ref_script(pure_script, [
                "--mode", "ddim", "--true_infer", "--patch_dir", patches,
                "--ckpt", ckpt, "--out_dir", ref_out,
                "--base_ch", args.base_ch, "--t_start", args.t_start,
                "--ddim_steps", args.ti_steps, "--n_seeds", args.ti_seeds,
                "--seed_base", args.seed_base, "--save_viz_n", "0",
            ], log_path=os.path.join(ref_out, "run.log"))
        got_out = os.path.join(wd, "s1s2_eval_pure", "true_infer")
        log("s1s2 eval (pure) mode=true_infer…")
        run_s1s2_eval("true_infer", patches, ckpt, got_out, args.base_ch,
                      noise_npz, param="eps", n_seeds=args.ti_seeds,
                      extra=("--t_start", str(args.t_start),
                             "--ddim_steps", str(args.ti_steps),
                             "--seed_base", str(args.seed_base)))
        e = diff_csv(os.path.join(ref_out, "ddim_true_infer_metrics.csv"),
                     os.path.join(got_out, "ddim_true_infer_metrics.csv"),
                     tables, "pure/true_infer/ddim_true_infer_metrics.csv")
        log("  ddim_true_infer_metrics.csv: "
            + ("PASS" if e["pass"] else "FAIL")
            + " " + json.dumps({c: round(v["max_dev"], 8)
                                for c, v in e.get("cols", {}).items()}))

        # classical baselines (deterministic; bicubic is torch-exact since
        # s1s2/eval/baselines.py carries the a=-0.75 kernel)
        for kind in ("bicubic", "linear"):
            ref_out = os.path.join(wd, "ref_eval_pure", f"baseline_{kind}")
            if not (args.reuse and os.path.exists(
                    os.path.join(ref_out, f"baseline_{kind}.csv"))):
                os.makedirs(ref_out, exist_ok=True)
                log(f"reference eval (pure) mode=baseline_{kind}…")
                run_ref_script(pure_script, [
                    "--mode", f"baseline_{kind}", "--patch_dir", patches,
                    "--ckpt", ckpt, "--out_dir", ref_out,
                    "--base_ch", args.base_ch, "--save_viz_n", "0",
                ], log_path=os.path.join(ref_out, "run.log"))
            got_out = os.path.join(wd, "s1s2_eval_pure", f"baseline_{kind}")
            log(f"s1s2 eval (pure) mode=baseline_{kind}…")
            run_s1s2_eval(f"baseline_{kind}", patches, ckpt, got_out,
                          args.base_ch, noise_npz, param="eps")
            e = diff_csv(
                os.path.join(ref_out, f"baseline_{kind}.csv"),
                os.path.join(got_out, f"baseline_{kind}_metrics.csv"),
                tables, f"pure/baseline_{kind}/baseline_{kind}.csv")
            log(f"  baseline_{kind}.csv: "
                + ("PASS" if e["pass"] else "FAIL")
                + " " + json.dumps({c: round(v["max_dev"], 8)
                                    for c, v in e.get("cols", {}).items()}))

        # tsweep from Comparison_Original.py (fixed shared noise, salt 99)
        comp_script = os.path.join(REF_DIR, "Evaluation",
                                   "Comparison_Original.py")
        t_values = ["5", "20", "80"]
        ref_out = os.path.join(wd, "ref_eval_pure", "tsweep")
        if not (args.reuse and os.path.exists(
                os.path.join(ref_out, "tsweep.csv"))):
            os.makedirs(ref_out, exist_ok=True)
            log("reference eval (pure) mode=tsweep (Comparison_Original)…")
            run_ref_script(comp_script, [
                "--mode", "tsweep", "--patch_dir", patches, "--ckpt", ckpt,
                "--out_dir", ref_out, "--base_ch", args.base_ch,
                "--t_values", *t_values, "--seed_base", args.seed_base,
                "--save_viz_n", "0",
            ], log_path=os.path.join(ref_out, "run.log"))
        got_out = os.path.join(wd, "s1s2_eval_pure", "tsweep")
        log("s1s2 eval (pure) mode=tsweep…")
        run_s1s2_eval("tsweep", patches, ckpt, got_out, args.base_ch,
                      noise_npz, param="eps",
                      extra=("--t_values", *t_values,
                             "--seed_base", str(args.seed_base)))
        e = diff_csv(os.path.join(ref_out, "tsweep.csv"),
                     os.path.join(got_out, "tsweep.csv"),
                     tables, "pure/tsweep/tsweep.csv")
        log("  tsweep.csv: " + ("PASS" if e["pass"] else "FAIL")
            + " " + json.dumps({c: round(v["max_dev"], 8)
                                for c, v in e.get("cols", {}).items()}))

    # ------- DDIM_Sweep grid (per-file seeded anchored noise) -------
    if "sweep" in args.families:
        ckpt = ensure_eps_ckpt()
        sweep_noise = build_sweep_noise_npz(
            os.path.join(wd, "sweep_noise.npz"), n_files, H, W, Ct,
            args.seed_base)
        grids = ("300,200", "5,10")
        ref_out = os.path.join(wd, "ref_eval_sweep", "ddim_sweep")
        if not (args.reuse and os.path.exists(
                os.path.join(ref_out, "ddim_sweep_summary.csv"))):
            os.makedirs(ref_out, exist_ok=True)
            log("reference eval (sweep) mode=ddim_sweep…")
            run_ref_script(
                os.path.join(REF_DIR, "Evaluation", "DDIM_Sweep.py"), [
                    "--mode", "ddim_sweep", "--patch_dir", patches,
                    "--ckpt", ckpt, "--out_dir", ref_out,
                    "--base_ch", args.base_ch,
                    "--t_start_grid", grids[0], "--ddim_steps_grid", grids[1],
                    "--seed_base", args.seed_base, "--save_viz_n", "0",
                ], log_path=os.path.join(ref_out, "run.log"))
        got_out = os.path.join(wd, "s1s2_eval_sweep", "ddim_sweep")
        log("s1s2 eval (sweep) mode=ddim_sweep…")
        run_s1s2_eval("ddim_sweep", patches, ckpt, got_out, args.base_ch,
                      sweep_noise, param="eps",
                      extra=("--t_start_grid", grids[0],
                             "--ddim_steps_grid", grids[1],
                             "--seed_base", str(args.seed_base)))
        e = diff_csv(os.path.join(ref_out, "ddim_sweep_summary.csv"),
                     os.path.join(got_out, "ddim_sweep_summary.csv"),
                     tables, "sweep/ddim_sweep/ddim_sweep_summary.csv")
        log("  ddim_sweep_summary.csv: "
            + ("PASS" if e["pass"] else "FAIL")
            + " " + json.dumps({c: round(v["max_dev"], 8)
                                for c, v in e.get("cols", {}).items()}))

    # ------- Evaluation_Updated/Evaluation.py: the updated eval harness ----
    # Same six table modes as DDIM_Multi-step.py with richer schemas (ddim
    # adds per-file PSNR/SAM/ERGAS; per_band adds SSIM + NaN SAM columns —
    # matched by `evaluate --full_metrics`). Identical torch stream shapes,
    # so the existing ref_noise.npz replays directly.
    if "upd" in args.families:
        ckpt = ensure_eps_ckpt()
        upd_tables = {
            "ddim": ["ddim_metrics.csv"],
            "eps": ["eps_diag.csv"],
            "seed_stats": ["seed_stats.csv"],
            "per_band": ["per_band_all.csv"],
            "ablate": ["ablate_all.csv"],
            "tsweep": ["tsweep.csv"],
        }
        t_values = ["5", "20", "80"]
        script = os.path.join(REF_DIR, "Evaluation_Updated", "Evaluation.py")
        for mode in upd_tables:
            ref_out = os.path.join(wd, "ref_eval_upd", mode)
            if not (args.reuse and
                    os.path.exists(os.path.join(ref_out, upd_tables[mode][0]))):
                os.makedirs(ref_out, exist_ok=True)
                log(f"reference eval (upd) mode={mode}…")
                run_ref_script(script, [
                    "--mode", mode, "--patch_dir", patches, "--ckpt", ckpt,
                    "--out_dir", ref_out, "--base_ch", args.base_ch,
                    "--t_start", args.t_start,
                    "--ddim_steps", args.ddim_steps,
                    "--n_seeds", args.n_seeds, "--seed_base", args.seed_base,
                    "--t_values", *t_values, "--save_viz_n", "0",
                ], log_path=os.path.join(ref_out, "run.log"))
            got_out = os.path.join(wd, "s1s2_eval_upd", mode)
            log(f"s1s2 eval (upd) mode={mode}…")
            run_s1s2_eval(mode, patches, ckpt, got_out, args.base_ch,
                          noise_npz, param="eps", n_seeds=args.n_seeds,
                          extra=("--t_start", str(args.t_start),
                                 "--ddim_steps", str(args.ddim_steps),
                                 "--seed_base", str(args.seed_base),
                                 "--t_values", *t_values, "--full_metrics"))
            for table in upd_tables[mode]:
                e = diff_csv(os.path.join(ref_out, table),
                             os.path.join(got_out, table),
                             tables, f"upd/{mode}/{table}")
                log(f"  {table}: "
                    + ("PASS" if e["pass"] else "FAIL")
                    + " " + json.dumps({c: round(v["max_dev"], 8)
                                        for c, v in e.get("cols", {}).items()}))

    # ------- Limitation_Test full-range ddim + Onestep (stdout scripts) ----
    # These two reference scripts emit metrics on stdout (no CSV); certified
    # by parsing every printed MAE/MSE/PSNR line AND element-wise diffing the
    # saved per-sample *_pred.npy arrays (`Evaluation/Limitation_Test.py:
    # 274-394`, `Evaluation/Onestep.py:93-175`).
    if "misc" in args.families:
        ckpt = ensure_eps_ckpt()
        lim_steps, lim_bs, lim_ks = 10, 2, (5, 50)
        lim_noise = build_limitation_noise_npz(
            os.path.join(wd, "limitation_noise.npz"), n_files, H, W, Ct,
            lim_bs, lim_ks)
        ref_out = os.path.join(wd, "ref_eval_misc", "limitation")
        ref_log = os.path.join(ref_out, "run.log")
        if not (args.reuse and os.path.exists(ref_log)):
            os.makedirs(ref_out, exist_ok=True)
            log("reference eval (misc) Limitation_Test mode=ddim…")
            run_ref_script(
                os.path.join(REF_DIR, "Evaluation", "Limitation_Test.py"), [
                    "--patch_dir", patches, "--ckpt", ckpt,
                    "--out_dir", ref_out, "--mode", "ddim",
                    "--ddim_steps", lim_steps, "--batch_size", lim_bs,
                    "--base_ch", args.base_ch, "--save_n", "4",
                    "--partial_reverse_k", *[str(k) for k in lim_ks],
                ], log_path=ref_log)
        got_out = os.path.join(wd, "s1s2_eval_misc", "limitation")
        log("s1s2 eval (misc) mode=limitation…")
        run_s1s2_eval("limitation", patches, ckpt, got_out, args.base_ch,
                      lim_noise, param="eps",
                      extra=("--limitation_sampler", "ddim",
                             "--ddim_steps", str(lim_steps),
                             "--batch_size", str(lim_bs), "--save_n", "4",
                             "--partial_reverse_k",
                             *[str(k) for k in lim_ks]))
        for nm, e in (
            ("misc/limitation/stdout_metrics", diff_text_metrics(
                ref_log, os.path.join(got_out, "limitation_summary.txt"),
                tables, "misc/limitation/stdout_metrics")),
            ("misc/limitation/pred_npy", diff_npy_preds(
                ref_out, got_out, tables, "misc/limitation/pred_npy")),
        ):
            log(f"  {nm}: " + ("PASS" if e["pass"] else "FAIL")
                + " " + json.dumps({c: round(v["max_dev"], 8)
                                    for c, v in e.get("cols", {}).items()}))

        one_noise = build_onestep_noise_npz(
            os.path.join(wd, "onestep_noise.npz"), H, W, Ct)
        ref_out = os.path.join(wd, "ref_eval_misc", "onestep")
        ref_log = os.path.join(ref_out, "run.log")
        if not (args.reuse and os.path.exists(ref_log)):
            os.makedirs(ref_out, exist_ok=True)
            log("reference eval (misc) Onestep…")
            run_ref_script(
                os.path.join(REF_DIR, "Evaluation", "Onestep.py"), [
                    "--patch_dir", patches, "--ckpt", ckpt,
                    "--out_dir", ref_out, "--base_ch", args.base_ch,
                    "--t_small", "20",
                ], log_path=ref_log)
        got_out = os.path.join(wd, "s1s2_eval_misc", "onestep")
        log("s1s2 eval (misc) mode=onestep…")
        run_s1s2_eval("onestep", patches, ckpt, got_out, args.base_ch,
                      one_noise, param="eps",
                      extra=("--batch_size", "1", "--t_small", "20"))
        e = diff_text_metrics(
            ref_log, os.path.join(got_out, "onestep_summary.txt"),
            tables, "misc/onestep/stdout_metrics")
        log("  misc/onestep/stdout_metrics: "
            + ("PASS" if e["pass"] else "FAIL")
            + " " + json.dumps({c: round(v["max_dev"], 8)
                                for c, v in e.get("cols", {}).items()}))

    # ------- Limitation_Test ancestral DDPM (full per-step noise replay) --
    # The last stream-consuming mode: T model calls with one randn_like per
    # step (`Evaluation/Limitation_Test.py:209-224`). Run at --T 50 so the
    # replayed stream (T tensors/file) stays small; certified on stdout
    # metrics AND saved *_pred.npy arrays like the ddim mode.
    if "ddpm" in args.families:
        ckpt = ensure_eps_ckpt()
        ddpm_T, ddpm_bs = 50, 2
        ddpm_noise = build_limitation_ddpm_noise_npz(
            os.path.join(wd, "limitation_ddpm_noise.npz"), n_files, H, W, Ct,
            ddpm_bs, ddpm_T)
        ref_out = os.path.join(wd, "ref_eval_misc", "ddpm")
        ref_log = os.path.join(ref_out, "run.log")
        if not (args.reuse and os.path.exists(ref_log)):
            os.makedirs(ref_out, exist_ok=True)
            log("reference eval (ddpm) Limitation_Test mode=ddpm T=50…")
            run_ref_script(
                os.path.join(REF_DIR, "Evaluation", "Limitation_Test.py"), [
                    "--patch_dir", patches, "--ckpt", ckpt,
                    "--out_dir", ref_out, "--mode", "ddpm",
                    "--T", ddpm_T, "--batch_size", ddpm_bs,
                    "--base_ch", args.base_ch, "--save_n", "4",
                ], log_path=ref_log)
        got_out = os.path.join(wd, "s1s2_eval_misc", "ddpm")
        log("s1s2 eval (ddpm) mode=limitation sampler=ddpm…")
        run_s1s2_eval("limitation", patches, ckpt, got_out, args.base_ch,
                      ddpm_noise, param="eps",
                      extra=("--limitation_sampler", "ddpm",
                             "--T", str(ddpm_T),
                             "--batch_size", str(ddpm_bs), "--save_n", "4"))
        for nm, e in (
            ("ddpm/limitation/stdout_metrics", diff_text_metrics(
                ref_log, os.path.join(got_out, "limitation_summary.txt"),
                tables, "ddpm/limitation/stdout_metrics")),
            ("ddpm/limitation/pred_npy", diff_npy_preds(
                ref_out, got_out, tables, "ddpm/limitation/pred_npy")),
        ):
            log(f"  {nm}: " + ("PASS" if e["pass"] else "FAIL")
                + " " + json.dumps({c: round(v["max_dev"], 8)
                                    for c, v in e.get("cols", {}).items()}))

    # ------- v-family stdout scripts: Limitation_Test_v + Onestep_v -------
    if "vmisc" in args.families:
        ckpt = ensure_v_ckpt()
        lim_steps, lim_bs = 10, 2
        limv_noise = build_limitation_v_noise_npz(
            os.path.join(wd, "limitation_v_noise.npz"), n_files, H, W, Ct,
            lim_bs, lim_steps, 1000)
        ref_out = os.path.join(wd, "ref_eval_vmisc", "limitation")
        ref_log = os.path.join(ref_out, "run.log")
        if not (args.reuse and os.path.exists(ref_log)):
            os.makedirs(ref_out, exist_ok=True)
            log("reference eval (vmisc) Limitation_Test_v mode=ddim η=0…")
            run_ref_script(
                os.path.join(REF_DIR, "Evaluation",
                             "Limitation_Test_v_Prediction.py"), [
                    "--patch_dir", patches, "--ckpt", ckpt,
                    "--out_dir", ref_out, "--mode", "ddim",
                    "--ddim_steps", lim_steps, "--ddim_eta", "0",
                    "--batch_size", lim_bs, "--base_ch", args.base_ch,
                    "--save_n", "4",
                ], log_path=ref_log)
        got_out = os.path.join(wd, "s1s2_eval_vmisc", "limitation")
        log("s1s2 eval (vmisc) mode=limitation param=v…")
        run_s1s2_eval("limitation", patches, ckpt, got_out, args.base_ch,
                      limv_noise, param="v",
                      extra=("--limitation_sampler", "ddim",
                             "--ddim_steps", str(lim_steps), "--eta", "0",
                             "--batch_size", str(lim_bs), "--save_n", "4"))
        for nm, e in (
            ("vmisc/limitation/stdout_metrics", diff_text_metrics(
                ref_log, os.path.join(got_out, "limitation_summary.txt"),
                tables, "vmisc/limitation/stdout_metrics")),
            ("vmisc/limitation/pred_npy", diff_npy_preds(
                ref_out, got_out, tables, "vmisc/limitation/pred_npy")),
        ):
            log(f"  {nm}: " + ("PASS" if e["pass"] else "FAIL")
                + " " + json.dumps({c: round(v["max_dev"], 8)
                                    for c, v in e.get("cols", {}).items()}))

        one_noise = build_onestep_noise_npz(
            os.path.join(wd, "onestep_v_noise.npz"), H, W, Ct)
        ref_out = os.path.join(wd, "ref_eval_vmisc", "onestep")
        ref_log = os.path.join(ref_out, "run.log")
        if not (args.reuse and os.path.exists(ref_log)):
            os.makedirs(ref_out, exist_ok=True)
            log("reference eval (vmisc) Onestep_v…")
            run_ref_script(
                os.path.join(REF_DIR, "Evaluation",
                             "Onestep_v_Prediction.py"), [
                    "--patch_dir", patches, "--ckpt", ckpt,
                    "--out_dir", ref_out, "--base_ch", args.base_ch,
                    "--t_small", "20", "--use_first_n", "1",
                ], log_path=ref_log)
        got_out = os.path.join(wd, "s1s2_eval_vmisc", "onestep")
        log("s1s2 eval (vmisc) mode=onestep param=v…")
        run_s1s2_eval("onestep", patches, ckpt, got_out, args.base_ch,
                      one_noise, param="v",
                      extra=("--batch_size", "1", "--t_small", "20"))
        e = diff_text_metrics(
            ref_log, os.path.join(got_out, "onestep_summary.txt"),
            tables, "vmisc/onestep/stdout_metrics")
        log("  vmisc/onestep/stdout_metrics: "
            + ("PASS" if e["pass"] else "FAIL")
            + " " + json.dumps({c: round(v["max_dev"], 8)
                                for c, v in e.get("cols", {}).items()}))

        # Comparison_v_Prediction: per-file one-step v recon with the same
        # post-reseed sequential draw — first file matches the onestep
        # stream exactly, so the onestep npz + summary replay it
        # (`Evaluation/Comparison_v_Prediction.py:196-210`)
        ref_out = os.path.join(wd, "ref_eval_vmisc", "compare")
        ref_log = os.path.join(ref_out, "run.log")
        if not (args.reuse and os.path.exists(ref_log)):
            os.makedirs(ref_out, exist_ok=True)
            log("reference eval (vmisc) Comparison_v (first file)…")
            run_ref_script(
                os.path.join(REF_DIR, "Evaluation",
                             "Comparison_v_Prediction.py"), [
                    "--patch_dir", patches, "--ckpt", ckpt,
                    "--out_dir", ref_out, "--base_ch", args.base_ch,
                    "--t_small", "20", "--use_first_n", "1",
                ], log_path=ref_log)
        e = diff_text_metrics(
            ref_log,
            os.path.join(wd, "s1s2_eval_vmisc", "onestep",
                         "onestep_summary.txt"),
            tables, "vmisc/compare/stdout_metrics")
        log("  vmisc/compare/stdout_metrics: "
            + ("PASS" if e["pass"] else "FAIL")
            + " " + json.dumps({c: round(v["max_dev"], 8)
                                for c, v in e.get("cols", {}).items()}))

    # ---------------- patch family (Patch.py under rasterio shim) --------
    if "patch" in args.families:
        log("—— patch family: unmodified Patch.py vs s1s2 patchify "
            "(rasterio shim, tools/rasterio_shim.py) ——")
        scenes = os.path.join(wd, "patch_scenes")
        ref_out = os.path.join(wd, "ref_patchify")
        got_out = os.path.join(wd, "s1s2_patchify")
        ps, stride = 32, 16
        if not (args.reuse and os.path.isdir(ref_out)
                and os.path.exists(os.path.join(ref_out, "manifest.json"))):
            build_patch_scenes(scenes)
            log("running UNMODIFIED /root/reference/Patch.py…")
            run_ref_patchify(scenes, ref_out, ps, stride,
                             os.path.join(wd, "ref_patchify.log"))
            log("running s1s2 patchify (--exact-filters, shimmed "
                "rasterio branch)…")
            run_s1s2_patchify(scenes, got_out, ps, stride,
                              os.path.join(wd, "s1s2_patchify.log"))
        e = diff_patchify(ref_out, got_out, tables, "patch/patchify/npz_fields")
        log("  patch/patchify/npz_fields: "
            + ("PASS" if e["pass"] else "FAIL")
            + " " + json.dumps({c: v for c, v in e.get("cols", {}).items()
                                if not v["pass"] or "max_dev" in v}))

    report["pass"] = all(t["pass"] for t in tables.values())
    report["tables_pass"] = sum(t["pass"] for t in tables.values())
    report["tables_total"] = len(tables)
    rp = os.path.join(wd, "report.json")
    with open(rp, "w") as f:
        json.dump(report, f, indent=1)
    log(f"report: {rp}  → {report['tables_pass']}/{report['tables_total']} "
        f"tables pass, overall {'PASS' if report['pass'] else 'FAIL'}")

    if args.keep_artifacts:
        ka = os.path.abspath(args.keep_artifacts)
        os.makedirs(ka, exist_ok=True)
        shutil.copy(rp, os.path.join(ka, "report.json"))
        for fam in args.families:
            src = os.path.join(wd, f"ref_{fam}", "model.pth")
            if os.path.exists(src):
                shutil.copy(src, os.path.join(ka, f"ref_{fam}_model.pth"))
            for side in ("ref_eval", "s1s2_eval"):
                sdir = os.path.join(wd, f"{side}_{fam}")
                if not os.path.isdir(sdir):
                    continue
                for mode in os.listdir(sdir):
                    for fn in os.listdir(os.path.join(sdir, mode)):
                        if fn.endswith((".csv", ".txt")):
                            dst = os.path.join(ka, f"{side}_{fam}", mode)
                            os.makedirs(dst, exist_ok=True)
                            shutil.copy(os.path.join(sdir, mode, fn), dst)
        log(f"artifacts copied to {ka}")

    return 0 if report["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
