"""Dataset / loader / synthetic fixture tests."""

import numpy as np
import pytest

from s1s2.data import (
    NpzPatchDataset,
    batch_iterator,
    eval_batches,
    load_patch,
    make_synthetic_patches,
)


@pytest.fixture(scope="module")
def patch_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("patches")
    make_synthetic_patches(str(d), n=7, size=16)
    return str(d)


class TestDataset:
    def test_listing_and_probe(self, patch_dir):
        ds = NpzPatchDataset(patch_dir)
        assert len(ds) == 7
        assert ds.probe_channels() == (4, 4, 16, 16)
        ds3 = NpzPatchDataset(patch_dir, max_files=3)
        assert len(ds3) == 3

    def test_load_patch_nhwc_and_clean(self, patch_dir):
        ds = NpzPatchDataset(patch_dir)
        d = ds[0]
        assert d["cond"].shape == (16, 16, 4)
        assert d["target"].shape == (16, 16, 4)
        assert d["mask"].shape == (16, 16)
        assert np.isfinite(d["cond"]).all() and np.isfinite(d["target"]).all()
        assert d["target"].min() >= 0 and d["target"].max() <= 1

    def test_missing_dir_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            NpzPatchDataset(str(tmp_path))


class TestLoader:
    def test_epoch_batches(self, patch_dir):
        ds = NpzPatchDataset(patch_dir)
        batches = list(batch_iterator(ds, 2, shuffle=True, drop_last=True, epoch=0))
        assert len(batches) == 3  # 7 // 2
        cond, tgt, mask = batches[0]
        assert cond.shape == (2, 16, 16, 4) and mask.shape == (2, 16, 16)

    def test_shuffle_differs_by_epoch(self, patch_dir):
        ds = NpzPatchDataset(patch_dir)
        a = np.concatenate([b[1] for b in batch_iterator(ds, 2, epoch=0, prefetch=False)])
        b = np.concatenate([b[1] for b in batch_iterator(ds, 2, epoch=1, prefetch=False)])
        assert not np.array_equal(a, b)
        a2 = np.concatenate([b[1] for b in batch_iterator(ds, 2, epoch=0, prefetch=False)])
        np.testing.assert_array_equal(a, a2)  # deterministic per epoch

    def test_eval_batches_batch_larger_than_dataset(self, patch_dir):
        ds = NpzPatchDataset(patch_dir)  # 7 files
        chunks = list(eval_batches(ds, 16))
        assert len(chunks) == 1
        (cond, _, _), names, n_valid = chunks[0]
        assert cond.shape[0] == 16 and n_valid == 7 and len(names) == 7

    def test_eval_batches_padding(self, patch_dir):
        ds = NpzPatchDataset(patch_dir)
        chunks = list(eval_batches(ds, 4))
        assert len(chunks) == 2
        (_, _, _), names, n_valid = chunks[-1]
        assert n_valid == 3 and len(names) == 3
        assert chunks[-1][0][0].shape[0] == 4  # padded to full batch
