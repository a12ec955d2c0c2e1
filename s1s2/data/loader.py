"""Batched host→device data pipeline.

Replaces the reference's ``DataLoader(num_workers=4, pin_memory=True)``
(`Train_Orignal.py:258`) with a TPU-appropriate design: the host assembles
contiguous NHWC numpy batches while the device computes (simple
one-batch-ahead prefetch — on TPU the transfer is async once dispatched),
and missing masks become all-ones so the jitted step has a static signature.
"""

from __future__ import annotations

import collections
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

from s1s2.data.dataset import NpzPatchDataset

Batch = Tuple[np.ndarray, np.ndarray, np.ndarray]  # cond, target, mask


def _assemble(ds: NpzPatchDataset, idxs) -> Batch:
    conds, tgts, masks = [], [], []
    for i in idxs:
        d = ds[int(i)]
        conds.append(d["cond"])
        tgts.append(d["target"])
        m = d["mask"]
        masks.append(
            m if m is not None else np.ones(d["target"].shape[:2], np.float32)
        )
    return (
        np.stack(conds).astype(np.float32),
        np.stack(tgts).astype(np.float32),
        np.stack(masks).astype(np.float32),
    )


def batch_iterator(
    ds: NpzPatchDataset,
    batch_size: int,
    *,
    shuffle: bool = True,
    drop_last: bool = True,
    seed: int = 1337,
    epoch: int = 0,
    prefetch: bool = True,
) -> Iterator[Batch]:
    """One epoch of batches (shuffled per-epoch like the reference loader)."""
    n = len(ds)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed + epoch).shuffle(order)
    stops = range(0, n - batch_size + 1 if drop_last else n, batch_size)
    chunks = [order[s : s + batch_size] for s in stops]
    if not prefetch or len(chunks) <= 1:
        for c in chunks:
            yield _assemble(ds, c)
        return

    # one-batch-ahead prefetch on a worker thread (npz decompress is the
    # host bottleneck; overlaps with device compute)
    q: "collections.deque" = collections.deque()
    lock = threading.Condition()
    DONE = object()

    def worker():
        for c in chunks:
            b = _assemble(ds, c)
            with lock:
                while len(q) >= 2:
                    lock.wait()
                q.append(b)
                lock.notify_all()
        with lock:
            q.append(DONE)
            lock.notify_all()

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        with lock:
            while not q:
                lock.wait()
            item = q.popleft()
            lock.notify_all()
        if item is DONE:
            break
        yield item


def eval_batches(
    ds: NpzPatchDataset,
    batch_size: int,
    max_files: Optional[int] = None,
    prefetch: bool = True,
) -> Iterator[Tuple[Batch, list, int]]:
    """Deterministic, ordered batches for evaluation; the last batch is
    PADDED to full size (repeat of last item) so one jit signature serves the
    whole sweep — yields (batch, file_names, n_valid). One batch of npz
    decompression is prefetched on a worker thread while the device runs."""
    n = len(ds) if not max_files else min(len(ds), max_files)

    def make(s):
        idxs = list(range(s, min(s + batch_size, n)))
        n_valid = len(idxs)
        while len(idxs) < batch_size:
            idxs.append(idxs[-1])
        return _assemble(ds, idxs), [ds.files[i] for i in idxs[:n_valid]], n_valid

    starts = list(range(0, n, batch_size))
    if not prefetch or len(starts) <= 1:
        for s in starts:
            yield make(s)
        return
    import concurrent.futures

    with concurrent.futures.ThreadPoolExecutor(max_workers=1) as ex:
        fut = ex.submit(make, starts[0])
        for s_next in starts[1:] + [None]:
            item = fut.result()
            if s_next is not None:
                fut = ex.submit(make, s_next)
            yield item
