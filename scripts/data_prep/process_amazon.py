"""Amazon sentiment corpus processor (reference data/Amazon/
process_amazon.py): {pos,neg}.txt -> {train,dev,test}.jsonl with
`sentiment` labels, md5 dedup, max_length filter, random 98/1/1 split."""

from __future__ import annotations

import argparse
import json
import os
from hashlib import md5

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--indir", type=str, required=True,
                   help="Directory containing {pos,neg}.txt")
    p.add_argument("--outdir", type=str, required=True)
    p.add_argument("--max_length", type=int, default=15)
    p.add_argument("--seed", type=int, default=10)
    return p.parse_args()


def process_sent(sent: str, labels):
    sent = sent.strip()
    ex = {"id": md5(sent.encode()).hexdigest(), "sentence": sent,
          "n_tokens": len(sent.split())}
    ex.update(labels)
    return ex


def main():
    args = parse_args()
    rng = np.random.default_rng(args.seed)
    os.makedirs(args.outdir, exist_ok=True)
    splits = {"train": [], "dev": [], "test": []}
    names = list(splits)
    ps = [0.98, 0.01, 0.01]
    seen = set()
    n_dup = n_long = 0
    for fname, label in [("pos.txt", 1), ("neg.txt", 0)]:
        path = os.path.join(args.indir, fname)
        with open(path) as f:
            for line in f:
                ex = process_sent(line, {"sentiment": label})
                if ex["id"] in seen:
                    n_dup += 1
                    continue
                if ex["n_tokens"] > args.max_length:
                    n_long += 1
                    continue
                seen.add(ex["id"])
                splits[names[rng.choice(3, p=ps)]].append(ex)
    print(f"Skipped {n_dup} duplicate sentences")
    print(f"Skipped {n_long} sentences > {args.max_length} tokens")
    for name, rows in splits.items():
        with open(os.path.join(args.outdir, f"{name}.jsonl"), "w") as f:
            for row in rows:
                json.dump(row, f)
                f.write("\n")
        print(f"{name}: {len(rows)}")


if __name__ == "__main__":
    main()
