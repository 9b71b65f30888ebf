"""Small host-side utilities (reference vae/utils.py:13-19, 225-233)."""

from __future__ import annotations

import random
from typing import Dict, List, Sequence

import numpy as np


def set_seed(seed: int) -> None:
    """Seed all host-side RNGs. Device randomness is deterministic by
    construction in JAX (explicit PRNG keys derived from this seed), the
    TPU-native analogue of the reference's cudnn-deterministic pinning
    (vae/utils.py:13-19)."""
    np.random.seed(seed)
    random.seed(seed)


def tensor2text(indices: Sequence[int], idx2word: Dict[int, str],
                eos_token_idx: int) -> List[str]:
    """Indices -> tokens up to and including the first EOS
    (reference vae/utils.py:225-233)."""
    indices = np.asarray(indices)
    hits = np.where(indices == eos_token_idx)[0]
    end = int(hits[0]) if len(hits) else len(indices) - 1
    return [idx2word[int(i)] for i in indices[:end + 1]]
