"""Perplexity estimation for originals-vs-reconstructions comparisons.

Two estimators:
  - GPT-2 sliding-window perplexity (the reference's choice,
    scripts/evaluation/compute_ppl.py:70-95), which needs the HF gpt2
    weights available locally; `gpt2_available()` probes for them without
    any network access so callers can fail fast on zero-egress hosts.
  - An n-gram LM fallback (same model as the reference's
    scripts/helpers/ngram_ppl.py: raw count probabilities with a 1e-8
    floor), trained on the corpus's train-split originals and applied to
    originals and reconstructions alike, so the orig-vs-recon comparison
    the north star needs is still produced when GPT-2 weights are absent.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from typing import Dict, List, Sequence, Tuple

import numpy as np

NGRAM_FLOOR = 1e-8


def gpt2_available() -> bool:
    """True iff the HF gpt2 weights are loadable from the local cache.
    Never touches the network (local_files_only)."""
    try:
        from transformers import GPT2LMHeadModel, GPT2Tokenizer
        GPT2Tokenizer.from_pretrained("gpt2", local_files_only=True)
        GPT2LMHeadModel.from_pretrained("gpt2", local_files_only=True)
        return True
    except Exception:
        return False


def gpt2_ppl(sentences: List[str], stride: int = 512) -> float:
    """GPT-2 sliding-window perplexity (reference compute_ppl.py:70-95)."""
    import torch
    from transformers import GPT2LMHeadModel, GPT2Tokenizer
    tokenizer = GPT2Tokenizer.from_pretrained("gpt2")
    model = GPT2LMHeadModel.from_pretrained("gpt2")
    model.eval()
    enc = tokenizer.encode("\n\n".join(sentences), return_tensors="pt")
    max_length = model.config.n_positions
    nlls = []
    end_loc = 0
    for i in range(0, enc.size(1), stride):
        begin_loc = max(i + stride - max_length, 0)
        end_loc = min(i + stride, enc.size(1))
        trg_len = end_loc - i
        input_ids = enc[:, begin_loc:end_loc]
        with torch.no_grad():
            out = model(input_ids, labels=input_ids)
            nlls.append(out[0] * trg_len)
    return float(torch.exp(torch.stack(nlls).sum() / end_loc))


def estimate_ngram_lm(sentences: Sequence[List[str]], n: int = 2
                      ) -> Tuple[Dict, set]:
    """Count-based n-gram LM over tokenized sentences
    (reference scripts/helpers/ngram_ppl.py:17-28)."""
    context_counts: Dict = defaultdict(Counter)
    vocab: set = set()
    for sent in sentences:
        vocab.update(sent)
        for i in range(len(sent) - n + 1):
            ctx = tuple(sent[i:i + n - 1])
            context_counts[ctx][sent[i + n - 1]] += 1
    return context_counts, vocab


def ngram_ppl(model: Dict, vocab: set, sentences: Sequence[List[str]],
              n: int = 2) -> Tuple[float, int]:
    """Perplexity of tokenized sentences under an estimate_ngram_lm model,
    with OOV tokens mapped to <UNK> and a probability floor
    (reference scripts/helpers/ngram_ppl.py:31-55). Returns (ppl, n_unk)."""
    context_counts = model
    logps = []
    n_unk = 0
    for sent in sentences:
        sent = [t if t in vocab else "<UNK>" for t in sent]
        n_unk += sum(1 for t in sent if t == "<UNK>")
        for i in range(len(sent) - n + 1):
            ctx = tuple(sent[i:i + n - 1])
            tok = sent[i + n - 1]
            counts = context_counts.get(ctx)
            p = NGRAM_FLOOR
            if counts:
                total = sum(counts.values())
                p = max(counts.get(tok, 0) / total, NGRAM_FLOOR)
            logps.append(np.log(p))
    ppl = float(np.exp(-np.mean(logps))) if logps else float("inf")
    return ppl, n_unk


def ngram_ppl_report(train_originals: List[str],
                     split_pairs: Dict[str, List[Tuple[str, str]]],
                     n: int = 2) -> Dict[str, Dict[str, float]]:
    """Train an n-gram LM on the train-split original sentences and score
    each split's originals and reconstructions under it.

    Returns {split: {"original_ppl", "reconstruction_ppl",
                     "original_unk", "reconstruction_unk"}}.
    """
    from dvae_tpu.data import preprocess_sentences

    def tok(sents):
        return preprocess_sentences(list(sents), "<s>", "</s>")

    model, vocab = estimate_ngram_lm(tok(train_originals), n=n)
    report: Dict[str, Dict[str, float]] = {}
    for split, pairs in split_pairs.items():
        opp, ounk = ngram_ppl(model, vocab, tok(p[0] for p in pairs), n=n)
        rpp, runk = ngram_ppl(model, vocab, tok(p[1] for p in pairs), n=n)
        report[split] = {"original_ppl": opp, "reconstruction_ppl": rpp,
                         "original_unk": ounk, "reconstruction_unk": runk}
    return report
