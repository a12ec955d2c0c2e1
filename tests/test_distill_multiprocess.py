"""Multi-chip distillation driver: a real 2-process CPU cluster
(jax.distributed + Gloo) driving the FULL distill CLI — progressive phase
over sharded batches, rank-partitioned teacher rollouts with host exchange,
and globally-sharded endpoint epochs (VERDICT r4 item 1; mirrors
tests/test_multiprocess.py for the trainer).

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
WORKER = os.path.join(REPO, "tests", "_mp_distill_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def mp_distill_run(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from s1s2.data import make_synthetic_patches
    from s1s2.models import UNetSmall
    from s1s2.train.checkpoint import save_model

    patches = tmp_path_factory.mktemp("mpd_patches")
    make_synthetic_patches(str(patches), n=8, size=16, seed=4)
    out = tmp_path_factory.mktemp("mpd_out")
    # a random-init teacher is enough to exercise the full driver
    model = UNetSmall(out_ch=4, base_ch=4, compute_dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 16, 8), jnp.float32),
                           jnp.zeros((1,), jnp.int32))
    teacher = str(out / "teacher.msgpack")
    save_model(variables["params"], teacher)

    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(port),
             str(patches), teacher, str(out)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    rcs = [p.returncode for p in procs]
    return out, rcs, outs


def _json_lines(stdout: str, key: str):
    vals = []
    for line in stdout.splitlines():
        try:
            d = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
        if isinstance(d, dict) and key in d:
            vals.append(d)
    return vals


def test_two_process_distill_cli(mp_distill_run):
    out, rcs, outs = mp_distill_run
    assert rcs == [0, 0], (
        f"rank failures:\n--- rank0 ---\n{outs[0]}\n--- rank1 ---\n{outs[1]}")
    assert "WORKER_OK 0 nproc=2 ndev=4" in outs[0]
    assert "WORKER_OK 1 nproc=2 ndev=4" in outs[1]


def test_two_process_distill_losses_agree(mp_distill_run):
    """Both the progressive-phase and endpoint losses are computed over the
    GLOBAL sharded batch (psum'd by XLA) → every rank logs identical
    values."""
    _, rcs, outs = mp_distill_run
    assert rcs == [0, 0]
    for key in ("phase", "endpoint_epoch"):
        l0 = [d["loss"] for d in _json_lines(outs[0], key)]
        l1 = [d["loss"] for d in _json_lines(outs[1], key)]
        assert l0 and len(l0) == len(l1), (key, outs[0])
        np.testing.assert_allclose(l0, l1, rtol=0, atol=0)
        assert np.isfinite(l0).all()


def test_only_process0_writes_student(mp_distill_run):
    out, rcs, _ = mp_distill_run
    assert rcs == [0, 0]
    assert (out / "mp_student.msgpack").exists()


def test_mp_student_loads_and_runs(mp_distill_run):
    """The rank-0-written student is a standard s1s2 checkpoint: load it and
    run one anchored-DDIM step."""
    out, rcs, _ = mp_distill_run
    assert rcs == [0, 0]
    import jax
    import jax.numpy as jnp

    from s1s2.core import Schedule
    from s1s2.models import UNetSmall
    from s1s2.sampling import ddim_anchored, make_denoise_fn
    from s1s2.train.checkpoint import load_params

    model = UNetSmall(out_ch=4, base_ch=4, compute_dtype=jnp.float32)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 16, 16, 8), jnp.float32),
                          jnp.zeros((1,), jnp.int32))["params"]
    params = load_params(str(out / "mp_student.msgpack"), template=template)
    fn = make_denoise_fn(model.apply, {"params": params},
                         jnp.zeros((2, 16, 16, 4), jnp.float32))
    x0 = ddim_anchored(fn, jnp.zeros((2, 16, 16, 4), jnp.float32),
                       jax.random.PRNGKey(1), Schedule.cosine(10),
                       t_start=8, steps=2)
    assert np.isfinite(np.asarray(x0)).all()
