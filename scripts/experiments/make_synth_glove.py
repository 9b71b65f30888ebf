"""Generate a synthetic GloVe-format embedding file over a corpus' vocab.

Real GloVe vectors are an external download the environment cannot fetch;
the FORMAT and the frozen-embeddings code path (reference
vae/utils.py:91-144: parse, pickle-cache, matrix build with N(0, 0.6) OOV
init, embeddings excluded from the optimizer) are fully exercisable with
deterministic random vectors. `--coverage` keeps a fraction of the vocab
OUT of the file so the OOV branch runs too.

Usage:
  python scripts/experiments/make_synth_glove.py DATA_DIR OUT.txt \
      [--dim 256] [--coverage 0.9] [--seed 0]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data_dir", help="dir with train.jsonl")
    ap.add_argument("out", help="output .txt (GloVe format)")
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--coverage", type=float, default=0.9,
                    help="fraction of vocab words included")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from dvae_tpu.data.text import tokenize

    words = set()
    with open(os.path.join(args.data_dir, "train.jsonl")) as f:
        for line in f:
            words.update(tokenize(json.loads(line)["sentence"].lower()))
    words = sorted(words)
    rng = np.random.default_rng(args.seed)
    keep = rng.random(len(words)) < args.coverage
    n = 0
    with open(args.out, "w") as f:
        for w, k in zip(words, keep):
            if not k:
                continue
            vec = rng.normal(scale=0.4, size=args.dim)
            f.write(w + " " + " ".join(f"{x:.5f}" for x in vec) + "\n")
            n += 1
    print(f"wrote {n}/{len(words)} words at dim {args.dim} -> {args.out}")


if __name__ == "__main__":
    main()
