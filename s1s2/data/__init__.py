"""Data: npz patch dataset, batched device loader, synthetic fixtures,
patch-extraction pipeline."""

from s1s2.data.dataset import NpzPatchDataset, load_patch
from s1s2.data.loader import batch_iterator, eval_batches
from s1s2.data.synthetic import make_synthetic_patches

__all__ = [
    "NpzPatchDataset",
    "load_patch",
    "batch_iterator",
    "eval_batches",
    "make_synthetic_patches",
]
