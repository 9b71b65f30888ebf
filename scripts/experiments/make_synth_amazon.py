"""Generate a synthetic Amazon-shaped corpus so the flagship
reproduction_configs/sfu_amazon_100k configs can be executed end-to-end at
their true scale. The real amazon tarball is git-LFS-missing in the
reference (/root/reference/.MISSING_LARGE_BLOBS), so the corpus shape is
reproduced instead: 100k train sentences, Zipf-distributed ~15k-word
vocabulary, 3-15 tokens, string polarity/uncertainty labels with
SFU-like skew, in the processed-dataset jsonl schema consumed by
scripts/helpers/combine_datasets.py.

Usage: python scripts/experiments/make_synth_amazon.py [--outdir ...]
Then combine with the real SFU corpus via combine_datasets.py.
"""

import argparse
import json
import os
from hashlib import md5

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", default="data/processed/synth_amazon")
    p.add_argument("--n_train", type=int, default=100_000)
    p.add_argument("--n_eval", type=int, default=3000,
                   help="dev and test size each")
    p.add_argument("--vocab_size", type=int, default=15_000)
    p.add_argument("--max_tokens", type=int, default=15)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def make_vocab(n, rng):
    """Pseudo-English word list: CV-syllable words, deduped, deterministic."""
    cons = list("bcdfghjklmnprstvwz")
    vow = list("aeiou")
    words = []
    seen = set()
    while len(words) < n:
        k = int(rng.integers(2, 5))
        w = "".join(rng.choice(cons) + rng.choice(vow) for _ in range(k))
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


def main():
    args = parse_args()
    rng = np.random.default_rng(args.seed)
    vocab = make_vocab(args.vocab_size, rng)
    # Zipf over the vocabulary (common in review text)
    ranks = np.arange(1, args.vocab_size + 1)
    probs = 1.0 / ranks ** 1.1
    probs /= probs.sum()

    os.makedirs(args.outdir, exist_ok=True)
    sizes = {"train": args.n_train, "dev": args.n_eval, "test": args.n_eval}
    for split, n in sizes.items():
        path = os.path.join(args.outdir, f"{split}.jsonl")
        with open(path, "w") as f:
            lens = rng.integers(3, args.max_tokens + 1, size=n)
            pol = rng.random(n) < 0.70
            unc = rng.random(n) < 0.10
            for i in range(n):
                toks = [vocab[j] for j in
                        rng.choice(args.vocab_size, size=lens[i], p=probs)]
                sent = " ".join(toks)
                row = {
                    "sentence": sent,
                    "n_tokens": int(lens[i]),
                    "polarity": "positive" if pol[i] else "negative",
                    "uncertainty": "uncertain" if unc[i] else "certain",
                    "id": md5(f"synthamz-{split}-{i}-{sent}".encode()
                              ).hexdigest(),
                }
                f.write(json.dumps(row) + "\n")
        print(f"{split}: {n} -> {path}")


if __name__ == "__main__":
    main()
