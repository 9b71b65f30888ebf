"""GloVe embedding loading (reference vae/utils.py:91-144).

Same contract: parse `glove.*.txt`, cache a pickle next to the cwd, build an
embedding matrix over the vocab with N(0, 0.6) init for OOV words, and return
(matrix, word2idx). Unlike the reference (quirk: utils.py:132-144 "redefines
word2idx"), word2idx is returned in vocab order, which is what the reference
effectively produces too (vocab order is preserved there as well).
"""

from __future__ import annotations

import logging
import os
import pickle
from typing import Dict, List, Sequence, Tuple

import numpy as np


def load_glove(path: str) -> Tuple[Dict[str, np.ndarray], int]:
    bn = os.path.splitext(os.path.basename(path))[0]
    pickle_file = bn + ".pickle"
    if os.path.exists(pickle_file):
        logging.warning(
            f"Loading embeddings from pickle file {pickle_file}")
        with open(pickle_file, "rb") as f:
            glove = pickle.load(f)
        emb_dim = next(iter(glove.values())).shape[0]
        return glove, emb_dim

    glove: Dict[str, np.ndarray] = {}
    emb_dim = 0
    with open(path, "rb") as f:
        for line in f:
            parts = line.decode().split()
            word = parts[0]
            vect = np.asarray(parts[1:], dtype=np.float64)
            emb_dim = vect.shape[0]
            glove[word] = vect
    with open(pickle_file, "wb") as f:
        pickle.dump(glove, f)
    return glove, emb_dim


def get_embedding_matrix(vocab: Sequence[str], glove: Dict[str, np.ndarray],
                         rng: np.random.Generator = None
                         ) -> Tuple[np.ndarray, Dict[str, int]]:
    if rng is None:
        rng = np.random.default_rng(0)
    emb_dim = len(next(iter(glove.values())))
    matrix = np.zeros((len(vocab), emb_dim), dtype=np.float32)
    found = 0
    for i, word in enumerate(vocab):
        if word in glove:
            matrix[i] = glove[word]
            found += 1
        else:
            matrix[i] = rng.normal(scale=0.6, size=(emb_dim,))
    logging.info(f"Found {found}/{len(vocab)} vocab words in embedding.")
    word2idx = {word: idx for idx, word in enumerate(vocab)}
    return matrix, word2idx
