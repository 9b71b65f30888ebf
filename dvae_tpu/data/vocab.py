"""Vocabulary build/save/load.

Contract: vocab.txt is one token per line, `[<PAD>, <UNK>] + sorted(train
tokens)` (reference run.py:492-504). <PAD> is index 0 everywhere.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from dvae_tpu.data.text import PAD, UNK


def build_vocab(train_docs: Sequence[List[str]]) -> List[str]:
    return [PAD, UNK] + sorted({tok for doc in train_docs for tok in doc})


def save_vocab(vocab: Sequence[str], path: str) -> None:
    with open(path, "w") as f:
        for word in vocab:
            f.write(f"{word}\n")


def load_vocab(path: str) -> List[str]:
    with open(path, "r") as f:
        return [line.strip() for line in f]


def make_word2idx(vocab: Sequence[str]) -> Dict[str, int]:
    return {w: i for i, w in enumerate(vocab)}
