"""Batch samplers producing deterministic per-epoch index matrices.

The reference drives training with either a shuffling DataLoader or, for
combined corpora, a RatioSampler that draws a fixed quota per source dataset
into each batch, tiling (oversampling) smaller sources up to the largest
(vae/data_utils.py:13-87). Both are reimplemented here as pure numpy index
generators so that steps-per-epoch -- and therefore the cyclic KL schedule's
total_steps (run.py:215-216) -- matches the reference exactly.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


class ShuffleBatchSampler:
    """Plain shuffled batches; the final batch may be partial
    (reference: DataLoader(shuffle=True, batch_size=...), run.py:529, 536)."""

    def __init__(self, n: int, batch_size: int, seed: int = 0,
                 shuffle: bool = True):
        self.n = n
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return -(-self.n // self.batch_size)

    def epoch_batches(self) -> List[np.ndarray]:
        idxs = np.arange(self.n)
        if self.shuffle:
            self._rng.shuffle(idxs)
        return [idxs[i:i + self.batch_size]
                for i in range(0, self.n, self.batch_size)]


class RatioBatchSampler:
    """Mixed-source batches with per-source quotas.

    Faithful to reference RatioSampler semantics (vae/data_utils.py:13-87):
      - split indices by the value of `split_key` in first-occurrence order;
      - quota per source = round(batch_size * ratio) (banker's rounding, same
        as torch.round -- data_utils.py:73);
      - each epoch: shuffle each source, tile sources smaller than the
        largest up to the largest source's length (data_utils.py:77-80);
      - batches are the per-source quota chunks concatenated in source order;
        trailing partial chunks are included (zip_longest fill dropped,
        data_utils.py:84-87);
      - epoch ends when any source's chunks run out (data_utils.py:39-49).
    """

    def __init__(self, labels: Sequence[Dict], split_key: str,
                 ratios: Optional[Dict[str, float]] = None,
                 batch_size: int = 16, seed: int = 0):
        self.split_key = split_key
        self.batch_size = batch_size
        self._rng = np.random.default_rng(seed)
        self.split_idxs: Dict = {}
        for i, datum in enumerate(labels):
            val = datum[split_key]
            self.split_idxs.setdefault(val, []).append(i)
        self.split_idxs = {k: np.asarray(v, dtype=np.int64)
                           for k, v in self.split_idxs.items()}
        self.max_dataset_len = max(len(v) for v in self.split_idxs.values())
        if ratios is None:
            self.ratios = {k: 1.0 / len(self.split_idxs)
                           for k in self.split_idxs}
        else:
            self.ratios = ratios
        self._group_sizes = {
            k: int(np.round(self.batch_size * r))
            for k, r in self.ratios.items()}
        for k, g in self._group_sizes.items():
            if g <= 0:
                raise ValueError(
                    f"dataset_minibatch_ratios[{k!r}]={self.ratios[k]} "
                    f"rounds to a zero per-batch quota at batch_size="
                    f"{self.batch_size}")
        # Rounding can push the quota sum past batch_size (e.g. ratios
        # .35/.35/.30 at batch 16 -> 6+6+5=17). The reference emitted the
        # oversized batch (data_utils.py:41-47); our static shapes cannot,
        # so deterministically trim the largest quotas down to fit.
        while sum(self._group_sizes.values()) > self.batch_size:
            k_max = max(self._group_sizes, key=self._group_sizes.get)
            if self._group_sizes[k_max] <= 1:
                raise ValueError(
                    "cannot fit one example per source within batch_size="
                    f"{self.batch_size}")
            self._group_sizes[k_max] -= 1

    def __len__(self) -> int:
        # Number of batches per epoch: driven by the largest source
        # (reference data_utils.py:51-59).
        key = max(self.split_idxs, key=lambda k: len(self.split_idxs[k]))
        group_size = self._group_sizes[key]
        return int(np.ceil(self.max_dataset_len / group_size))

    def epoch_batches(self) -> List[np.ndarray]:
        chunks_per_key = {}
        for k in self.split_idxs:
            idxs = self.split_idxs[k][self._rng.permutation(
                len(self.split_idxs[k]))]
            if len(idxs) < self.max_dataset_len:
                reps = self.max_dataset_len // len(idxs)
                rem = self.max_dataset_len % len(idxs)
                idxs = np.concatenate([np.tile(idxs, reps), idxs[:rem]])
            g = self._group_sizes[k]
            chunks_per_key[k] = [idxs[i:i + g]
                                 for i in range(0, len(idxs), g)]
        n_batches = min(len(c) for c in chunks_per_key.values())
        batches = []
        for b in range(n_batches):
            batches.append(np.concatenate(
                [chunks_per_key[k][b] for k in self.split_idxs]))
        return batches
