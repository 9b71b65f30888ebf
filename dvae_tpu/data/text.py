"""Host-side text IO and tokenization.

Behavioral contract matches the reference data layer:
  - jsonl reading with label-key selection, counting, shuffle, truncation
    (reference vae/data_utils.py:229-259)
  - regex tokenizer: split "n't", pad sentence punctuation, strip everything
    outside [a-zA-Z.!?'], wrap with SOS/EOS (vae/data_utils.py:262-279)
  - denoising by sentence reversal (vae/data_utils.py:282-283)
"""

from __future__ import annotations

import json
import random
import re
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

SOS = "<SOS>"
EOS = "<EOS>"
PAD = "<PAD>"
UNK = "<UNK>"

_RE_NT = re.compile(r"(n't)")
_RE_PUNCT = re.compile(r"([.!?])")
_RE_NONALPHA = re.compile(r"[^a-zA-Z.!?']+")


def get_sentences_labels(path: str, label_keys: Optional[List[str]] = None,
                         N: int = -1, shuffle: bool = True,
                         rng: Optional[random.Random] = None):
    """Read a jsonl corpus: one object per line with keys id/sentence/labels.

    Returns (sentences, labels, ids, label_counts). Matches reference
    vae/data_utils.py:229-259 including the shuffle-then-truncate order and
    the "label_keys inferred from the first line" behavior.
    """
    sentence_ids: List[str] = []
    sentences: List[str] = []
    labels: List[Dict] = []
    label_counts: Dict[str, Dict] = defaultdict(lambda: defaultdict(int))
    with open(path, "r") as f:
        for line in f:
            data = json.loads(line)
            sentence_ids.append(data["id"])
            sentences.append(data["sentence"])
            if label_keys is None:
                label_keys = [k for k in data.keys()
                              if k not in ("sentence", "id")]
            labs = {}
            for key, value in data.items():
                if key not in label_keys:
                    continue
                label_counts[key][value] += 1
                labs[key] = value
            labels.append(labs)
    if shuffle:
        shuffler = rng if rng is not None else random
        tmp = list(zip(sentences, labels, sentence_ids))
        shuffler.shuffle(tmp)
        sentences, labels, sentence_ids = (list(x) for x in zip(*tmp))
    if N == -1:
        N = len(sentences)
    return sentences[:N], labels[:N], sentence_ids[:N], label_counts


def tokenize(sent: str, lowercase: bool = True) -> List[str]:
    """The reference tokenizer (vae/data_utils.py:268-275), single sentence."""
    sent = sent.strip()
    if lowercase:
        sent = sent.lower()
    sent = _RE_NT.sub(r" \1", sent)
    sent = _RE_PUNCT.sub(r" \1", sent)
    sent = _RE_NONALPHA.sub(r" ", sent)
    return sent.split()


def preprocess_sentences(sentences: Sequence[str], sos: Optional[str] = SOS,
                         eos: Optional[str] = EOS,
                         lowercase: bool = True) -> List[List[str]]:
    """Tokenize a corpus and wrap with SOS/EOS (vae/data_utils.py:262-279)."""
    out = []
    for sent in sentences:
        toks = tokenize(sent, lowercase=lowercase)
        if sos is not None and eos is not None:
            toks = [sos] + toks + [eos]
        out.append(toks)
    return out


def reverse_sentences(sentences: Sequence[List[str]]) -> List[List[str]]:
    """Denoising noise: full-sequence reversal (vae/data_utils.py:282-283)."""
    return [sent[::-1] for sent in sentences]
