"""Small-surface tests: profiling utils, mesh sizing, PSNR host helper."""

import json
import time

import numpy as np
import pytest

from s1s2.eval.metrics import psnr_from_mse
from s1s2.parallel import make_mesh_for_batch
from s1s2.utils import MetricsLogger, StepTimer, trace_context


class TestProfilingUtils:
    def test_step_timer(self):
        t = StepTimer()
        assert t.tick() is None
        time.sleep(0.01)
        rate = t.tick()
        assert rate is not None and 0 < rate < 1000

    def test_metrics_logger(self, tmp_path):
        p = str(tmp_path / "m.jsonl")
        log = MetricsLogger(p)
        log.log(step=1, loss=0.5)
        log.log(step=2, loss=0.25)
        log.close()
        rows = [json.loads(l) for l in open(p)]
        assert rows[0]["step"] == 1 and rows[1]["loss"] == 0.25
        assert all("ts" in r for r in rows)

    def test_trace_context_none_noop(self):
        with trace_context(None):
            pass  # must not raise


class TestMeshSizing:
    def test_divisor_selection(self):
        # 8 virtual devices; batch 6 → largest divisor ≤ 8 is 6
        mesh = make_mesh_for_batch(6)
        assert mesh.shape["data"] == 6
        mesh = make_mesh_for_batch(3)
        assert mesh.shape["data"] == 3
        mesh = make_mesh_for_batch(5)
        assert mesh.shape["data"] == 5
        mesh = make_mesh_for_batch(7)
        assert mesh.shape["data"] == 7
        mesh = make_mesh_for_batch(13)  # prime > n → 1
        assert mesh.shape["data"] == 1
        mesh = make_mesh_for_batch(16)
        assert mesh.shape["data"] == 8

    def test_space_axis(self):
        mesh = make_mesh_for_batch(4, space=2)
        assert mesh.shape == {"data": 4, "space": 2}


class TestPsnrHelper:
    def test_cap_and_value(self):
        assert psnr_from_mse(0.0) == 99.0
        assert psnr_from_mse(1e-13) == 99.0
        assert psnr_from_mse(0.01) == pytest.approx(20.0)
