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


class TestRichSynthetic:
    """--rich synthetic mode: ONE dataset-level cond→target map (vs the
    default's per-patch random mixing), so pure generation can actually
    reward model quality (VERDICT r2 missing #3)."""

    def test_rich_is_deterministic_and_valid(self, tmp_path):
        a = make_synthetic_patches(str(tmp_path / "a"), n=4, size=16,
                                   seed=3, rich=True)
        b = make_synthetic_patches(str(tmp_path / "b"), n=4, size=16,
                                   seed=3, rich=True)
        assert len(a) == len(b) == 4
        for fa, fb in zip(a, b):
            da, db = np.load(fa), np.load(fb)
            np.testing.assert_array_equal(da["target"], db["target"])
            assert da["target"].min() >= 0.0 and da["target"].max() <= 1.0
            assert da["inputs"].shape == da["target"].shape

    def test_rich_map_is_shared_across_patches(self, tmp_path):
        """In rich mode the cond→target relation is the SAME function for
        every patch: a ridge fit on the (nonlinear-feature → target) pairs
        of patches 0..2 must predict patch 3 far better than the default
        mode, where each patch draws its own mixing matrix."""

        def fit_and_score(files):
            def feats(c):
                # probe basis ⊃ the generator's feature family
                cols = [np.tanh(c[i]) for i in range(4)]
                cols += [np.sin(3.0 * c[i]) for i in range(4)]
                cols += [np.tanh(c[i] * c[j]) for i in range(4)
                         for j in range(i + 1, 4)]
                cols += [np.abs(np.tanh(c[i])) for i in range(4)]
                cols.append(np.ones_like(c[0]))
                return np.stack([x.ravel() for x in cols], 1)

            X, Y = [], []
            for f in files[:-1]:
                d = np.load(f)
                X.append(feats(d["inputs"]))
                Y.append(d["target"].reshape(4, -1).T)
            X, Y = np.concatenate(X), np.concatenate(Y)
            W = np.linalg.solve(X.T @ X + 1e-3 * np.eye(X.shape[1]),
                                X.T @ Y)
            d = np.load(files[-1])
            pred = feats(d["inputs"]) @ W
            return float(np.abs(pred - d["target"].reshape(4, -1).T).mean())

        rich = make_synthetic_patches(str(tmp_path / "rich"), n=4, size=32,
                                      seed=5, rich=True, mask_holes=False)
        plain = make_synthetic_patches(str(tmp_path / "plain"), n=4,
                                       size=32, seed=5, mask_holes=False)
        err_rich, err_plain = fit_and_score(rich), fit_and_score(plain)
        assert err_rich < 0.5 * err_plain, (err_rich, err_plain)


def test_rich_synthetic_supports_wide_cond(tmp_path):
    """rich=True must handle c_cond > 4 (features extend with deterministic
    harmonics) and stay bit-identical for c_cond=4 (committed rich sets)."""
    import numpy as np

    from s1s2.data.synthetic import make_synthetic_patches

    d6 = tmp_path / "rich6"
    make_synthetic_patches(str(d6), n=2, size=8, c_cond=6, rich=True)
    z = np.load(str(d6 / "patch_000000.npz"))
    assert z["inputs"].shape[0] == 6 and z["target"].shape[0] == 4

    a = tmp_path / "a"
    b = tmp_path / "b"
    make_synthetic_patches(str(a), n=1, size=8, c_cond=4, rich=True, seed=3)
    make_synthetic_patches(str(b), n=1, size=8, c_cond=4, rich=True, seed=3)
    za, zb = np.load(str(a / "patch_000000.npz")), np.load(str(b / "patch_000000.npz"))
    assert (za["target"] == zb["target"]).all()
