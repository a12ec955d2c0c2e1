"""Failure recovery / elastic resume: SIGKILL a training run mid-epoch,
restart with ``--resume``, and prove the final weights are BIT-identical to
an uninterrupted run — single-process and for a real 2-process cluster with
rank 1 killed.

Why this works (trainer.py invariants):
* full state (params+opt+EMA+step) is orbax-saved at every epoch boundary,
  BEFORE the epoch's avg_loss progress line is printed;
* on resume, ``start_epoch = step // steps_per_epoch + 1`` replays the same
  (seed, epoch) shuffle, and per-step noise is ``fold_in(key, state.step)``,
  so the remaining epochs are exactly the ones an uninterrupted run executes.

The reference has nothing comparable: its trainers save EMA model weights
only (`Train_Orignal.py:323-336`) — optimizer/EMA/step state is lost on any
crash and training must restart from scratch (SURVEY.md §5).
"""

import json
import os
import signal
import socket
import subprocess
import sys
import time

import pytest

pytestmark = pytest.mark.slow  # SIGKILL/resume subprocess clusters, ~30 s per jax start

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_train_worker.py")


@pytest.fixture(scope="module")
def patch_dir(tmp_path_factory):
    from s1s2.data import make_synthetic_patches

    d = tmp_path_factory.mktemp("fr_patches")
    make_synthetic_patches(str(d), n=8, size=16, seed=11)
    return str(d)


def _json_lines(lines):
    """Extract every JSON object from worker stdout, tolerating mangled
    lines. Gloo's C++ banner writes straight to fd 1 and can splice BETWEEN
    print()'s two write syscalls (text, then newline), yielding lines like
    ``{"resumed_at_step": ...}[Gloo] Rank 0 ...`` — raw_decode recovers the
    leading object(s) instead of dropping the record."""
    dec = json.JSONDecoder()
    out = []
    for line in lines:
        s = line.strip()
        while True:
            start = s.find("{")
            if start < 0:
                break
            try:
                d, end = dec.raw_decode(s[start:])
            except ValueError:
                break
            if isinstance(d, dict):
                out.append(d)
            s = s[start + end:]
    return out


def _epoch_losses(lines):
    return {d["epoch"]: d["avg_loss"] for d in _json_lines(lines)
            if "avg_loss" in d}


def _watch_and_kill(proc, kill_procs, timeout=420.0):
    """Read ``proc``'s stdout until epoch-1 state is committed (its avg_loss
    line prints only after save_state) and epoch 2 is in flight, then
    SIGKILL every process in ``kill_procs`` mid-epoch. Returns the lines
    read. SIGKILL (not SIGTERM): simulate a hard crash, no cleanup."""
    lines = []
    saw_epoch1_done = False
    deadline = time.time() + timeout
    while time.time() < deadline:
        line = proc.stdout.readline()
        if line == "" and proc.poll() is not None:
            raise AssertionError(
                "run finished before it could be killed:\n" + "".join(lines))
        lines.append(line)
        try:
            d = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
        if not isinstance(d, dict):
            continue
        if d.get("epoch") == 1 and "avg_loss" in d:
            saw_epoch1_done = True  # orbax state for epoch 1 is on disk
        if saw_epoch1_done and d.get("epoch") == 2 and "loss" in d:
            for p in kill_procs:
                p.send_signal(signal.SIGKILL)
            return lines
    for p in kill_procs:  # never leave a victim running on a failed watch
        p.send_signal(signal.SIGKILL)
    raise AssertionError("timed out waiting for kill point:\n" + "".join(lines))


def _train_args(patch_dir, model_path, state_dir, epochs=3):
    return [
        "--patch_dir", patch_dir, "--model_path", model_path,
        "--epochs", str(epochs), "--batch_size", "2", "--base_ch", "4",
        "--T", "10", "--seed", "9", "--log_every", "1",
        "--compute_dtype", "float32",
    ] + (["--save_state_dir", state_dir] if state_dir else [])


def _spawn_train(args):
    """Launch the train CLI in its own process (single CPU device, same env
    for every run in a test so numerics are bit-comparable). Goes through
    tests/_train_worker_cpu.py — the axon plugin ignores JAX_PLATFORMS, so
    only a jax.config override keeps the subprocess off the real TPU."""
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    return subprocess.Popen(
        [sys.executable, "-u",
         os.path.join(REPO, "tests", "_train_worker_cpu.py")] + args,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO,
    )


def test_kill_resume_single_process(patch_dir, tmp_path):
    # uninterrupted baseline
    base_model = str(tmp_path / "base.msgpack")
    proc = _spawn_train(_train_args(patch_dir, base_model, None))
    base_out = proc.communicate(timeout=600)[0]
    assert proc.returncode == 0, base_out
    base_losses = _epoch_losses(base_out.splitlines())
    assert set(base_losses) == {1, 2, 3}

    # victim: SIGKILLed mid-epoch-2
    model = str(tmp_path / "m.msgpack")
    state_dir = str(tmp_path / "state")
    proc = _spawn_train(_train_args(patch_dir, model, state_dir))
    _watch_and_kill(proc, [proc])
    proc.wait(timeout=60)
    assert proc.returncode != 0  # it really died
    assert not os.path.exists(model)  # final artifact was never written

    # elastic restart: resume from the epoch-1 orbax state, finish epochs 2-3
    proc = _spawn_train(_train_args(patch_dir, model, state_dir) + ["--resume"])
    res_out = proc.communicate(timeout=600)[0]
    assert proc.returncode == 0, res_out
    out_lines = res_out.splitlines()
    resumed = [d for d in _json_lines(out_lines) if "resumed_at_step" in d]
    assert resumed and resumed[0]["resumed_at_epoch"] == 2, out_lines

    # loss continuity: epochs 2-3 replay the uninterrupted run exactly
    res_losses = _epoch_losses(out_lines)
    assert set(res_losses) == {2, 3}
    assert res_losses[2] == base_losses[2]
    assert res_losses[3] == base_losses[3]

    # final weights BIT-identical to the uninterrupted run
    with open(base_model, "rb") as f:
        base_bytes = f.read()
    with open(model, "rb") as f:
        res_bytes = f.read()
    assert base_bytes == res_bytes


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn_cluster(patch_dir, out, state_dir, extra):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    port = _free_port()
    return [
        subprocess.Popen(
            [sys.executable, "-u", WORKER, str(i), str(port),
             patch_dir, str(out)] + _cluster_extra(state_dir) + extra,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for i in range(2)
    ]


def _cluster_extra(state_dir):
    return ["--epochs", "3", "--seed", "9", "--compute_dtype", "float32",
            "--save_state_dir", state_dir]


def test_kill_rank1_resume_cluster(patch_dir, tmp_path):
    """Kill rank 1 of a live 2-process cluster mid-epoch (rank 0 dies with
    it — Gloo collectives can't degrade), restart the WHOLE cluster with
    --resume, and assert the final model matches an uninterrupted 2-process
    run bit-for-bit."""
    # uninterrupted 2-process baseline
    base_out = tmp_path / "base"
    base_out.mkdir()
    procs = _spawn_cluster(patch_dir, base_out,
                           str(tmp_path / "base_state"), [])
    outs = [p.communicate(timeout=600)[0] for p in procs]
    assert [p.returncode for p in procs] == [0, 0], outs
    base_losses = _epoch_losses(outs[0].splitlines())
    assert set(base_losses) == {1, 2, 3}

    # victim cluster: watch rank 0 (it writes the orbax state), then
    # SIGKILL rank 1 — the failure — and rank 0 with it (a real scheduler
    # would reap the wedged survivor; Gloo would otherwise hang in psum)
    out = tmp_path / "run"
    out.mkdir()
    state_dir = str(tmp_path / "state")
    procs = _spawn_cluster(patch_dir, out, state_dir, [])
    _watch_and_kill(procs[0], [procs[1], procs[0]])
    for p in procs:
        p.wait(timeout=120)
    assert all(p.returncode != 0 for p in procs)
    assert not (out / "mp_model.msgpack").exists()

    # elastic restart of the full cluster from the shared orbax state
    procs = _spawn_cluster(patch_dir, out, state_dir, ["--resume"])
    outs = [p.communicate(timeout=600)[0] for p in procs]
    assert [p.returncode for p in procs] == [0, 0], outs
    res_lines = outs[0].splitlines()
    resumed = [d for d in _json_lines(res_lines) if "resumed_at_step" in d]
    assert resumed and resumed[0]["resumed_at_epoch"] == 2, res_lines
    res_losses = _epoch_losses(res_lines)
    assert res_losses[2] == base_losses[2]
    assert res_losses[3] == base_losses[3]

    with open(base_out / "mp_model.msgpack", "rb") as f:
        base_bytes = f.read()
    with open(out / "mp_model.msgpack", "rb") as f:
        res_bytes = f.read()
    assert base_bytes == res_bytes
