"""Multi-process correctness: a real 2-process CPU cluster (jax.distributed
+ Gloo collectives) driving the FULL train CLI, with per-process loader
sharding (SURVEY.md §2.3 "multi-host entry"; the reference is single-process
everywhere).

Spawned as subprocesses because each rank needs its own jax runtime.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # real 2-process Gloo cluster subprocesses

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_train_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def mp_patch_dir(tmp_path_factory):
    from s1s2.data import make_synthetic_patches

    d = tmp_path_factory.mktemp("mp_patches")
    make_synthetic_patches(str(d), n=8, size=16, seed=4)
    return str(d)


@pytest.fixture(scope="module")
def mp_run(tmp_path_factory, mp_patch_dir):
    out = tmp_path_factory.mktemp("mp_out")
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(port),
             str(mp_patch_dir), str(out)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    rcs = [p.returncode for p in procs]
    return out, rcs, outs


def _epoch_losses(stdout: str):
    losses = []
    for line in stdout.splitlines():
        try:
            d = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
        if isinstance(d, dict) and "avg_loss" in d:
            losses.append(d["avg_loss"])
    return losses


def test_two_process_train_cli(mp_run):
    out, rcs, outs = mp_run
    assert rcs == [0, 0], f"rank failures:\n--- rank0 ---\n{outs[0]}\n--- rank1 ---\n{outs[1]}"
    assert "WORKER_OK 0 nproc=2 ndev=4" in outs[0]
    assert "WORKER_OK 1 nproc=2 ndev=4" in outs[1]


def test_two_process_losses_agree(mp_run):
    """The psum'd loss is replicated: both ranks must log identical values."""
    _, rcs, outs = mp_run
    assert rcs == [0, 0]
    l0, l1 = _epoch_losses(outs[0]), _epoch_losses(outs[1])
    assert len(l0) == len(l1) == 2  # 2 epochs
    np.testing.assert_allclose(l0, l1, rtol=0, atol=0)


def test_only_process0_writes_checkpoints(mp_run):
    out, rcs, _ = mp_run
    assert rcs == [0, 0]
    assert (out / "mp_model.msgpack").exists()
    assert (out / "mp_model_last.msgpack").exists()


def test_loader_process_sharding_partitions_globally():
    """Two ranks' local batches must tile the single-process global batches
    exactly (same shuffle, contiguous halves)."""
    from s1s2.data.loader import batch_iterator

    class FakeDS:
        def __init__(self, n):
            self.files = [f"{i}.npz" for i in range(n)]

        def __len__(self):
            return len(self.files)

        def __getitem__(self, i):
            v = np.full((4, 4, 2), float(i), np.float32)
            return {"cond": v, "target": v[..., :1], "mask": None}

    ds = FakeDS(13)
    kw = dict(shuffle=True, seed=3, epoch=2, prefetch=False)
    glob = [b[0][:, 0, 0, 0] for b in batch_iterator(ds, 4, **kw)]
    r0 = [b[0][:, 0, 0, 0] for b in batch_iterator(
        ds, 4, process_index=0, process_count=2, **kw)]
    r1 = [b[0][:, 0, 0, 0] for b in batch_iterator(
        ds, 4, process_index=1, process_count=2, **kw)]
    assert len(glob) == len(r0) == len(r1) == 3
    for g, a, b in zip(glob, r0, r1):
        np.testing.assert_array_equal(g, np.concatenate([a, b]))


def test_loader_rejects_indivisible_global_batch():
    from s1s2.data.loader import batch_iterator

    with pytest.raises(ValueError, match="not divisible"):
        list(batch_iterator([], 5, process_index=0, process_count=2))
