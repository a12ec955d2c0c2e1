"""Single-process train-CLI subprocess pinned to the CPU backend.

The axon TPU plugin ignores the ``JAX_PLATFORMS`` env var, so a plain
``python -m s1s2.cli.train`` subprocess would grab the real TPU; forcing
the platform through ``jax.config`` before the first backend touch is the
only reliable override (same trick as tests/conftest.py and
tests/_mp_train_worker.py).

Usage: python tests/_train_worker_cpu.py [train-CLI args...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from s1s2.cli import train

train.main(sys.argv[1:])
