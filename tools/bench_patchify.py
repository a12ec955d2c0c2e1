"""Patch-filter throughput: integral-image window stats vs per-window loops.

Usage: python tools/bench_patchify.py [scene_size]
CPU-only (host pipeline); demonstrates the data-layer redesign
(s1s2/data/patchify.py docstring).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from s1s2.data.patchify import (
    dark_fraction,
    laplacian_var,
    patch_iter,
    scene_window_stats,
)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    ps, stride = 256, 32
    rng = np.random.default_rng(0)
    target = rng.uniform(0, 1, (4, size, size)).astype(np.float32)
    mask = rng.uniform(0, 1, (size, size)) > 0.1
    n_windows = len(list(patch_iter(size, size, ps, stride)))

    t0 = time.perf_counter()
    stats = scene_window_stats(target, mask, ps, stride)
    t_vec = time.perf_counter() - t0

    t0 = time.perf_counter()
    for row, col in patch_iter(size, size, ps, stride):
        M = mask[row : row + ps, col : col + ps]
        Y = target[:, row : row + ps, col : col + ps]
        _ = float(M.mean())
        _ = [float(np.var(Y[c][M])) for c in range(4)]
        _ = dark_fraction(Y, M)
        _ = laplacian_var(Y[3], M)
    t_loop = time.perf_counter() - t0

    print(json.dumps({
        "scene": size,
        "windows": n_windows,
        "integral_image_s": round(t_vec, 3),
        "per_window_s": round(t_loop, 3),
        "speedup": round(t_loop / t_vec, 1),
    }))


if __name__ == "__main__":
    main()
