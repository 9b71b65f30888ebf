"""Corpus BLEU-4, replacing torchtext.data.metrics.bleu_score
(used by reference vae/losses.py:128-134).

Semantics match torchtext: clipped n-gram precision aggregated over the
corpus, uniform 1/4 weights up to 4-grams, brevity penalty with
closest-reference length, and a hard 0.0 if any n-gram order has zero
clipped matches.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List, Sequence


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n])
                   for i in range(len(tokens) - n + 1))


def bleu_score(candidate_corpus: Sequence[List[str]],
               references_corpus: Sequence[List[List[str]]],
               max_n: int = 4,
               weights: Sequence[float] = (0.25, 0.25, 0.25, 0.25)) -> float:
    assert len(candidate_corpus) == len(references_corpus)
    clipped = [0] * max_n
    total = [0] * max_n
    cand_len = 0
    refs_len = 0
    for cand, refs in zip(candidate_corpus, references_corpus):
        cand_len += len(cand)
        refs_len += min((abs(len(r) - len(cand)), len(r)) for r in refs)[1]
        for n in range(1, max_n + 1):
            cand_counts = _ngrams(cand, n)
            max_ref: Counter = Counter()
            for r in refs:
                rc = _ngrams(r, n)
                for g, c in rc.items():
                    if c > max_ref[g]:
                        max_ref[g] = c
            clipped[n - 1] += sum(min(c, max_ref[g])
                                  for g, c in cand_counts.items())
            total[n - 1] += max(len(cand) - n + 1, 0)
    if min(clipped) == 0:
        return 0.0
    log_pn = sum(w * math.log(c / t)
                 for w, c, t in zip(weights, clipped, total))
    bp = math.exp(min(1.0 - refs_len / cand_len, 0.0))
    return bp * math.exp(log_pn)


def compute_bleu(X_batch, pred_batch, idx2word: Dict[int, str],
                 eos_token_idx: int) -> float:
    """Self-BLEU of predictions vs targets, SOS/EOS stripped
    (reference vae/losses.py:128-134)."""
    import numpy as np

    from dvae_tpu.utils.misc import tensor2text
    X_batch = np.asarray(X_batch)
    pred_batch = np.asarray(pred_batch)
    refs = [[tensor2text(x, idx2word, eos_token_idx)[1:-1]] for x in X_batch]
    cands = [tensor2text(p, idx2word, eos_token_idx)[1:-1]
             for p in pred_batch]
    return bleu_score(cands, refs)
