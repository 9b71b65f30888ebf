"""Deterministic label encoding.

The reference used sklearn LabelEncoder and accidentally refit encoders on
every split (vae/data_utils.py:286-307, quirk #3 -- harmless only because
LabelEncoder sorts classes). This codec is deterministic-by-design: classes
are sorted at fit time, fit once on train, and *actually reused* on dev/test.
Unseen values at transform time raise (same as sklearn would).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import numpy as np


@dataclass(frozen=True)
class LabelCodec:
    name: str
    classes: Tuple  # sorted unique label values

    @property
    def num_classes(self) -> int:
        return len(self.classes)

    @property
    def output_dim(self) -> int:
        # Binary labels collapse to a single BCE logit
        # (reference vae/data_utils.py:192-203).
        return 1 if self.num_classes == 2 else self.num_classes

    def transform(self, values: Sequence) -> np.ndarray:
        idx = {v: i for i, v in enumerate(self.classes)}
        try:
            return np.asarray([idx[v] for v in values], dtype=np.int32)
        except KeyError as e:
            raise ValueError(
                f"label '{self.name}': unseen value {e.args[0]!r}") from None

    def inverse_transform(self, encoded: Sequence[int]) -> List:
        return [self.classes[int(i)] for i in encoded]


def fit_label_codecs(labels: Sequence[Dict]) -> Dict[str, LabelCodec]:
    """Fit one codec per label key over a list of per-example label dicts."""
    by_name: Dict[str, set] = {}
    order: List[str] = []
    for lab in labels:
        for name, val in lab.items():
            if name not in by_name:
                by_name[name] = set()
                order.append(name)
            by_name[name].add(val)
    return {name: LabelCodec(name, tuple(sorted(by_name[name])))
            for name in order}


def encode_labels(labels: Sequence[Dict],
                  codecs: Dict[str, LabelCodec]) -> Dict[str, np.ndarray]:
    """Encode per-example label dicts into {name: int32 [N]} arrays."""
    out = {}
    for name, codec in codecs.items():
        out[name] = codec.transform([lab[name] for lab in labels])
    return out


def label_dims(codecs: Dict[str, LabelCodec]) -> Dict[str, int]:
    """{label_name: head output dim} (reference DenoisingTextDataset.y_dims,
    vae/data_utils.py:192-203)."""
    return {name: codec.output_dim for name, codec in codecs.items()}
