"""Split raw negated-LAMA ConceptNet pairs into 70/15/15 train/dev/test
pair files (reference data/ConceptNet/split_polarity_data.py)."""

from __future__ import annotations

import argparse
import json
import os
from collections import Counter

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--infile", type=str, required=True,
                   help="Raw negated-LAMA jsonl")
    p.add_argument("--outdir", type=str, required=True)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    np.random.seed(args.seed)
    os.makedirs(args.outdir)

    datasets = ["train", "dev", "test"]
    props = [0.7, 0.15, 0.15]
    pairs = {d: [] for d in datasets}
    seen = set()
    with open(args.infile) as f:
        for line in f:
            data = json.loads(line)
            if "negated" not in data:
                continue
            pos = data["masked_sentences"][0]
            neg = data["negated"][0]
            if pos in seen or neg in seen:
                continue
            seen.update((pos, neg))
            d = str(np.random.choice(datasets, p=props))
            pairs[d].append({"uuid": data["uuid"], "positive": pos,
                             "negative": neg, "masked": data["obj_label"],
                             "predicateType": data["pred"]})
    for d in datasets:
        with open(os.path.join(args.outdir, f"{d}.jsonl"), "w") as f:
            for pair in pairs[d]:
                json.dump(pair, f)
                f.write("\n")
        preds = Counter(p_["predicateType"] for p_ in pairs[d])
        print(f"{d}: {len(pairs[d])} pairs, predicates: "
              f"{dict(preds.most_common(5))}")


if __name__ == "__main__":
    main()
