"""Subprocess worker for tests/test_multiprocess.py — one rank of a
2-process CPU cluster driving the full train CLI (jax.distributed + Gloo
cross-process collectives + per-process loader sharding).

Usage: python tests/_mp_train_worker.py <process_id> <port> <patches> <out>
                                        [extra train-CLI args...]

Extra args are appended to the train CLI line (argparse last-wins), so the
failure-recovery tests can override --epochs and add --save_state_dir /
--resume without changing the base invocation.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

pid, port, patches, out = sys.argv[1:5]

from s1s2.cli import train

train.main([
    "--patch_dir", patches,
    "--model_path", os.path.join(out, "mp_model.msgpack"),
    "--epochs", "2", "--batch_size", "4", "--base_ch", "4", "--T", "10",
    "--seed", "7", "--log_every", "1",
    "--coordinator", f"localhost:{port}",
    "--num_processes", "2", "--process_id", pid,
] + sys.argv[5:])
print(f"WORKER_OK {pid} nproc={jax.process_count()} ndev={len(jax.devices())}",
      flush=True)
