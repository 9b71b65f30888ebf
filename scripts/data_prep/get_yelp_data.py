"""Yelp sentiment corpus processor (reference data/yelp/get_yelp_data.py):
sentiment.{split}.{0,1} text files -> {split}.jsonl with md5 ids."""

from __future__ import annotations

import argparse
import json
import os
from hashlib import md5


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--indir", type=str, required=True)
    p.add_argument("--outdir", type=str, required=True)
    args = p.parse_args()

    if os.path.exists(args.outdir):
        raise OSError(f"Outdir {args.outdir} already exists!")
    os.makedirs(args.outdir)
    for split in ("train", "dev", "test"):
        outpath = os.path.join(args.outdir, f"{split}.jsonl")
        with open(outpath, "a") as out:
            for label in (0, 1):
                path = os.path.join(args.indir, f"sentiment.{split}.{label}")
                if not os.path.exists(path):
                    print(f"Missing input file: {path}")
                    continue
                seen = set()
                for line in open(path):
                    sent = line.strip()
                    h = md5(sent.encode()).hexdigest()
                    if h in seen:
                        continue
                    seen.add(h)
                    json.dump({"id": h, "sentence": sent,
                               "n_tokens": len(sent.split()),
                               "sentiment": label}, out)
                    out.write("\n")


if __name__ == "__main__":
    main()
