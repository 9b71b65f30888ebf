"""Generate synthetic Yelp-shaped RAW sentiment files so the
reproduction_configs/sfu_yelp family can execute end-to-end. The real
yelp tarball is git-LFS-missing in the reference
(/root/reference/.MISSING_LARGE_BLOBS), so this reproduces the raw
format the Yelp processor consumes (reference data/yelp/
get_yelp_data.py:33-46): six files `sentiment.{train,dev,test}.{0,1}`,
one lowercase sentence per line, polarity given by the filename digit.

Unlike make_synth_amazon.py (which emits already-processed jsonl), this
emits the RAW layer so the full pipeline runs: get_yelp_data.py ->
bow_classifier.py apply (SFU-trained weak polarity/uncertainty labels)
-> combine_datasets.py -> the unchanged sfu_yelp reproduction configs.

Text is the same pseudo-English Zipf generator as the amazon stand-in.
The LFS-missing upstream corpus leaves the true scale unknown; default
100k train sentences matches the sfu_amazon_100k study's scale.

Usage: python scripts/experiments/make_synth_yelp.py [--outdir ...]
"""

import argparse
import importlib.util
import os

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))


def _load_amazon_gen():
    spec = importlib.util.spec_from_file_location(
        "make_synth_amazon", os.path.join(_HERE, "make_synth_amazon.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", default="data/raw/synth_yelp")
    p.add_argument("--n_train", type=int, default=100_000)
    p.add_argument("--n_eval", type=int, default=3000,
                   help="dev and test size each")
    p.add_argument("--vocab_size", type=int, default=15_000)
    p.add_argument("--max_tokens", type=int, default=15)
    p.add_argument("--seed", type=int, default=1)
    return p.parse_args()


def main():
    args = parse_args()
    rng = np.random.default_rng(args.seed)
    amz = _load_amazon_gen()
    vocab = amz.make_vocab(args.vocab_size, rng)
    ranks = np.arange(1, args.vocab_size + 1)
    probs = 1.0 / ranks ** 1.1
    probs /= probs.sum()

    os.makedirs(args.outdir, exist_ok=True)
    sizes = {"train": args.n_train, "dev": args.n_eval, "test": args.n_eval}
    for split, n in sizes.items():
        # Yelp's style-transfer release is roughly sentiment-balanced:
        # split each file's share evenly between the two polarities.
        for label in (0, 1):
            path = os.path.join(args.outdir, f"sentiment.{split}.{label}")
            n_lab = n // 2 + (n % 2 if label else 0)
            lens = rng.integers(3, args.max_tokens + 1, size=n_lab)
            with open(path, "w") as f:
                for i in range(n_lab):
                    toks = [vocab[j] for j in rng.choice(
                        args.vocab_size, size=lens[i], p=probs)]
                    f.write(" ".join(toks) + "\n")
            print(f"{path}: {n_lab}")


if __name__ == "__main__":
    main()
