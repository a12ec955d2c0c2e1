"""MmapCache: identical batches to the npz path, rebuilt on file-set change."""

import numpy as np
import pytest

from s1s2.data import NpzPatchDataset, make_synthetic_patches
from s1s2.data.loader import MmapCache, _assemble, batch_iterator


@pytest.fixture(scope="module")
def patch_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("patches")
    make_synthetic_patches(str(d), n=5, size=16, seed=4)
    return str(d)


def test_cache_matches_npz_path(patch_dir, tmp_path):
    ds = NpzPatchDataset(patch_dir)
    cache = MmapCache(ds, str(tmp_path / "cache"))
    idxs = [0, 3, 2]
    a = _assemble(ds, idxs)
    b = _assemble(cache, idxs)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_cache_reuse_and_rebuild(patch_dir, tmp_path):
    ds = NpzPatchDataset(patch_dir)
    cdir = str(tmp_path / "cache")
    MmapCache(ds, cdir)
    import os

    mtime = os.path.getmtime(os.path.join(cdir, "cond.npy"))
    MmapCache(ds, cdir)  # second construction reuses
    assert os.path.getmtime(os.path.join(cdir, "cond.npy")) == mtime
    ds3 = NpzPatchDataset(patch_dir, max_files=3)  # different file set
    c3 = MmapCache(ds3, cdir)  # rebuild
    assert len(c3) == 3


def test_batch_iterator_over_cache(patch_dir, tmp_path):
    ds = NpzPatchDataset(patch_dir)
    cache = MmapCache(ds, str(tmp_path / "cache"))
    batches = list(batch_iterator(cache, 2, shuffle=True, epoch=0))
    assert len(batches) == 2
    cond, tgt, mask = batches[0]
    assert cond.shape == (2, 16, 16, 4) and mask.shape == (2, 16, 16)
    assert cond.dtype == np.float32
