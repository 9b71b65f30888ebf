"""Denoising text dataset, numpy-backed with static shapes.

Capability match for the reference DenoisingTextDataset
(vae/data_utils.py:147-226): (noisy_doc, orig_doc, labels, id) per example,
binary labels collapsed to one BCE target. Unlike the reference's lazy
per-item tensorization + per-batch padding, everything here is vectorized up
front into fixed-shape int32 arrays padded to the dataset max length -- the
shape contract XLA needs to compile the train step exactly once.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from dvae_tpu.data.labels import LabelCodec, encode_labels, label_dims
from dvae_tpu.data.text import PAD, UNK


class DenoisingTextDataset:
    def __init__(self, noisy_docs: Sequence[List[str]],
                 orig_docs: Sequence[List[str]],
                 labels: Sequence[Dict],
                 ids: Sequence[str],
                 word2idx: Dict[str, int],
                 label_codecs: Dict[str, LabelCodec],
                 max_length: Optional[int] = None):
        assert len(noisy_docs) == len(orig_docs) == len(labels) == len(ids)
        if UNK not in word2idx or PAD not in word2idx:
            raise ValueError("word2idx must contain <UNK> and <PAD> entries")
        self.word2idx = word2idx
        self.idx2word = {i: w for w, i in word2idx.items()}
        self.label_codecs = label_codecs
        self.ids = list(ids)
        self._id2pos = {u: i for i, u in enumerate(self.ids)}
        self.raw_labels = list(labels)

        n = len(orig_docs)
        self.lengths = np.asarray([len(d) for d in orig_docs], dtype=np.int32)
        self.max_length = int(max_length) if max_length else int(
            max((self.lengths.max() if n else 1),
                max((len(d) for d in noisy_docs), default=1)))
        self.noisy_X = self._encode_docs(noisy_docs)
        self.X = self._encode_docs(orig_docs)
        self.Y = encode_labels(labels, label_codecs)  # {name: int32 [N]}

    @classmethod
    def from_arrays(cls, noisy_X: np.ndarray, X: np.ndarray,
                    lengths: np.ndarray, labels: Sequence[Dict],
                    ids: Sequence[str], word2idx: Dict[str, int],
                    label_codecs: Dict[str, LabelCodec],
                    max_length: int) -> "DenoisingTextDataset":
        """Construct directly from pre-encoded arrays (the native C++
        tokenize+encode fast path; see data/native.py)."""
        obj = cls.__new__(cls)
        obj.word2idx = word2idx
        obj.idx2word = {i: w for w, i in word2idx.items()}
        obj.label_codecs = label_codecs
        obj.ids = list(ids)
        obj._id2pos = {u: i for i, u in enumerate(obj.ids)}
        obj.raw_labels = list(labels)
        obj.lengths = np.asarray(lengths, np.int32)
        obj.max_length = int(max_length)
        assert noisy_X.shape == X.shape == (len(obj.ids), obj.max_length)
        obj.noisy_X = np.asarray(noisy_X, np.int32)
        obj.X = np.asarray(X, np.int32)
        obj.Y = encode_labels(labels, label_codecs)
        return obj

    def _encode_docs(self, docs: Sequence[List[str]]) -> np.ndarray:
        unk = self.word2idx[UNK]
        pad = self.word2idx[PAD]
        out = np.full((len(docs), self.max_length), pad, dtype=np.int32)
        for i, doc in enumerate(docs):
            if len(doc) > self.max_length:
                raise ValueError(
                    f"doc {i} has length {len(doc)} > max_length "
                    f"{self.max_length}")
            out[i, :len(doc)] = [self.word2idx.get(t, unk) for t in doc]
        return out

    def __len__(self) -> int:
        return len(self.ids)

    @property
    def y_dims(self) -> Dict[str, int]:
        return label_dims(self.label_codecs)

    def get_by_id(self, uuid: str):
        i = self._id2pos[uuid]
        return self[i]

    def __getitem__(self, i: int):
        y = {name: arr[i] for name, arr in self.Y.items()}
        return self.noisy_X[i], self.X[i], y, self.ids[i]

    def doc2array(self, doc: List[str]) -> np.ndarray:
        """Encode one tokenized doc to int32 indices (no padding)."""
        unk = self.word2idx[UNK]
        return np.asarray([self.word2idx.get(t, unk) for t in doc],
                          dtype=np.int32)


class LabeledTextDataset(DenoisingTextDataset):
    """Plain (doc, labels) dataset -- the reference's eager, non-denoising
    sibling (vae/data_utils.py:90-144). Here it is the identity-noise
    special case of DenoisingTextDataset: noisy == original."""

    def __init__(self, docs, labels, ids, word2idx, label_codecs,
                 max_length=None):
        super().__init__(docs, docs, labels, ids, word2idx, label_codecs,
                         max_length=max_length)

    def __getitem__(self, i: int):
        _, x, y, uid = super().__getitem__(i)
        return x, y, uid
