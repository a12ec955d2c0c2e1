"""Subprocess worker for tests/test_distill_multiprocess.py — one rank of a
2-process CPU cluster driving the FULL distill CLI (jax.distributed + Gloo;
teacher rollouts partition across ranks, endpoint epochs run over the global
mesh — VERDICT r4 item 1).

Usage: python tests/_mp_distill_worker.py <process_id> <port> <patches>
                                          <teacher.msgpack> <out>
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

pid, port, patches, teacher, out = sys.argv[1:6]

from s1s2.cli import distill

distill.main([
    "--patch_dir", patches,
    "--teacher", teacher,
    "--model_path", os.path.join(out, "mp_student.msgpack"),
    "--T", "10", "--t_start", "8", "--base_ch", "4",
    "--teacher_steps", "4", "--final_steps", "2",
    "--epochs_per_phase", "1", "--batch_size", "4",
    "--endpoint_epochs", "2", "--endpoint_teacher_steps", "2",
    "--endpoint_seeds", "1", "--seed", "7",
    "--compute_dtype", "float32",
    "--coordinator", f"localhost:{port}",
    "--num_processes", "2", "--process_id", pid,
])
print(f"WORKER_OK {pid} nproc={jax.process_count()} ndev={len(jax.devices())}",
      flush=True)
