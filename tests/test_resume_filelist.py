"""Resume-from-checkpoint and file_list-forced eval ordering."""

import json
import os

import numpy as np
import pytest

from s1s2.data.synthetic import make_synthetic_patches


@pytest.fixture(scope="module")
def patch_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("patches")
    make_synthetic_patches(str(d), n=4, size=16, seed=5)
    return str(d)


@pytest.mark.slow  # 30-90 s on the 1-CPU box; covered by faster siblings in the default tier
def test_train_resume_continues_step_count(patch_dir, tmp_path):
    from s1s2.cli.train import main as train_main

    model_path = str(tmp_path / "m.msgpack")
    state_dir = str(tmp_path / "state")
    common = [
        "--patch_dir", patch_dir, "--model_path", model_path,
        "--T", "10", "--batch_size", "2", "--base_ch", "4",
        "--compute_dtype", "float32", "--save_state_dir", state_dir,
    ]
    train_main(common + ["--epochs", "1"])
    # 4 files / bs 2 = 2 steps per epoch
    lines = []
    import io
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        train_main(common + ["--epochs", "1", "--resume"])
    lines = [json.loads(l) for l in buf.getvalue().splitlines() if l.startswith("{")]
    assert any(d.get("resumed_at_step") == 2 for d in lines), lines


def test_train_spatial_shard_cli(patch_dir, tmp_path):
    """--spatial_shard trains over the ('data','space') mesh (4x2 on the
    8-device virtual CPU mesh; XLA inserts conv halo exchanges)."""
    from s1s2.cli.train import main as train_main

    model_path = str(tmp_path / "sp.msgpack")
    train_main([
        "--patch_dir", patch_dir, "--model_path", model_path,
        "--T", "10", "--epochs", "1", "--batch_size", "4", "--base_ch", "4",
        "--compute_dtype", "float32", "--spatial_shard",
    ])
    assert os.path.exists(model_path)


def test_eval_file_list_forces_order(patch_dir, tmp_path):
    from s1s2.cli.evaluate import main as eval_main

    fl = tmp_path / "files.txt"
    fl.write_text("patch_000002.npz\npatch_000000.npz\n")
    eval_main([
        "--mode", "baseline_bicubic", "--patch_dir", patch_dir,
        "--out_dir", str(tmp_path), "--batch_size", "2",
        "--file_list", str(fl),
    ])
    rows = (tmp_path / "baseline_bicubic_metrics.csv").read_text().strip().splitlines()
    assert len(rows) == 3
    assert rows[1].startswith("patch_000002.npz")
    assert rows[2].startswith("patch_000000.npz")


def test_eval_file_list_missing_entry_raises(patch_dir, tmp_path):
    from s1s2.cli.evaluate import main as eval_main

    fl = tmp_path / "files.txt"
    fl.write_text("nope.npz\n")
    with pytest.raises(FileNotFoundError):
        eval_main([
            "--mode", "baseline_bicubic", "--patch_dir", patch_dir,
            "--out_dir", str(tmp_path), "--file_list", str(fl),
        ])


@pytest.mark.slow  # 30-90 s on the 1-CPU box; covered by faster siblings in the default tier
def test_save_every_cadence(patch_dir, tmp_path, monkeypatch):
    """save_every gates all three per-epoch saves (model_last/model_best/
    orbax state) to the cadence — the final epoch always saves. Each save
    downloads the full param tree, which dominates epoch wall time for
    small models on a remote-device runtime."""
    from s1s2.train import trainer as trainer_mod
    from s1s2.train.loop import TrainConfig
    from s1s2.train.trainer import RunConfig, train_loop

    calls = {"model": [], "state": []}
    real_save_model = trainer_mod.save_model
    real_save_state = trainer_mod.save_state
    monkeypatch.setattr(trainer_mod, "save_model",
                        lambda p, path: calls["model"].append(path)
                        or real_save_model(p, path))
    monkeypatch.setattr(trainer_mod, "save_state",
                        lambda s, d: calls["state"].append(d)
                        or real_save_state(s, d))

    model_path = str(tmp_path / "m.msgpack")
    train_loop(
        RunConfig(patch_dir=patch_dir, model_path=model_path, epochs=5,
                  batch_size=2, base_ch=4, compute_dtype="float32",
                  save_state_dir=str(tmp_path / "state"), save_every=3),
        TrainConfig(T=10),
    )
    # state saved only at epochs 3 and 5 (cadence + forced final)
    assert len(calls["state"]) == 2
    # model_last at epochs 3 and 5, model_best at most as often, plus the
    # unconditional final model write
    last = [p for p in calls["model"] if p.endswith("_last.msgpack")]
    assert len(last) == 2
    assert os.path.exists(model_path)


@pytest.mark.slow  # 30-90 s on the 1-CPU box; covered by faster siblings in the default tier
def test_resume_preserves_best_loss(patch_dir, tmp_path):
    """A post-resume epoch with worse loss must NOT overwrite model_best:
    best_loss survives the restart via the model_best sidecar json."""
    from s1s2.cli.train import main as train_main
    from s1s2.train.trainer import reference_artifact_paths

    model_path = str(tmp_path / "m.msgpack")
    state_dir = str(tmp_path / "state")
    common = [
        "--patch_dir", patch_dir, "--model_path", model_path,
        "--T", "10", "--batch_size", "2", "--base_ch", "4",
        "--compute_dtype", "float32", "--save_state_dir", state_dir,
    ]
    train_main(common + ["--epochs", "2"])
    _, _, best_path = reference_artifact_paths(model_path)
    sidecar = best_path + ".loss.json"
    assert os.path.exists(sidecar)
    with open(sidecar) as f:
        best_before = json.load(f)["best_loss"]
    best_bytes = open(best_path, "rb").read()

    # poison the sidecar with a value no real epoch can beat, then resume:
    # if best_loss were reset to inf on resume, model_best would be
    # rewritten; with the sidecar restored it must stay byte-identical
    with open(sidecar, "w") as f:
        json.dump({"best_loss": -1.0, "epoch": 2}, f)
    train_main(common + ["--epochs", "3", "--resume"])
    assert open(best_path, "rb").read() == best_bytes
    with open(sidecar) as f:
        assert json.load(f)["best_loss"] == -1.0
    del best_before


def test_save_every_must_be_positive(patch_dir, tmp_path):
    from s1s2.cli.train import main as train_main

    with pytest.raises(ValueError, match="save_every"):
        train_main([
            "--patch_dir", patch_dir, "--model_path",
            str(tmp_path / "z.msgpack"), "--T", "10", "--epochs", "1",
            "--batch_size", "2", "--base_ch", "4", "--compute_dtype",
            "float32", "--save_every", "0",
        ])
