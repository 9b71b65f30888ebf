"""Fixed-shape device feeding pipeline.

Replaces the reference's torch DataLoader + pad-to-batch-max collator
(vae/utils.py:199-221, run.py:536-538) with a static-shape batch stream:
every batch is [batch_size, max_length] int32; a partial final batch is
padded with copies of its first row and an `example_mask` marks real rows.
Losses downstream are mask-aware, so loss values on partial batches match
the reference's per-batch means over real examples.

Batches are placed on device with `jax.device_put` under a NamedSharding
(batch axis over the 'data' mesh axis), with a one-batch prefetch so host
collation overlaps device compute.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from dvae_tpu.data.dataset import DenoisingTextDataset


@dataclass
class Batch:
    """Host-side batch. All arrays have static shapes."""
    noisy_X: np.ndarray          # [B, T] int32
    X: np.ndarray                # [B, T] int32
    lengths: np.ndarray          # [B] int32
    labels: Dict[str, np.ndarray]  # {name: [B] int32}
    example_mask: np.ndarray     # [B] float32, 1.0 for real rows
    ids: List[str]               # real example ids (len == mask.sum())


def collate(dataset: DenoisingTextDataset, idxs: np.ndarray,
            batch_size: int) -> Batch:
    """Gather rows `idxs` and pad the batch up to `batch_size` rows."""
    n = len(idxs)
    assert n <= batch_size
    if n < batch_size:
        pad_idxs = np.full(batch_size - n, idxs[0] if n else 0,
                           dtype=np.int64)
        full = np.concatenate([idxs, pad_idxs])
    else:
        full = idxs
    mask = np.zeros(batch_size, dtype=np.float32)
    mask[:n] = 1.0
    return Batch(
        noisy_X=dataset.noisy_X[full],
        X=dataset.X[full],
        lengths=dataset.lengths[full],
        labels={k: v[full] for k, v in dataset.Y.items()},
        example_mask=mask,
        ids=[dataset.ids[i] for i in idxs],
    )


class BatchPipeline:
    """Iterates sampler epochs into device-ready batches.

    device_put_fn, if given, maps the array-dict to device (with sharding);
    otherwise raw numpy is yielded (jit will transfer implicitly).
    """

    def __init__(self, dataset: DenoisingTextDataset, sampler,
                 batch_size: int, device_put_fn=None):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.device_put_fn = device_put_fn

    def __len__(self) -> int:
        return len(self.sampler)

    def epoch(self) -> Iterator[Batch]:
        """Yield collated (and optionally device-placed) batches.

        One batch of host-side collation is pipelined ahead of the consumer:
        batch k+1 is collated and its device transfer enqueued while the
        caller still computes on batch k.
        """
        batches = self.sampler.epoch_batches()
        prev: Optional[Batch] = None
        for idxs in batches:
            b = collate(self.dataset, idxs, self.batch_size)
            if self.device_put_fn is not None:
                b = self.device_put_fn(b)
            if prev is not None:
                yield prev
            prev = b
        if prev is not None:
            yield prev
