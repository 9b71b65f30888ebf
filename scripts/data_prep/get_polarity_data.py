"""ConceptNet (negated LAMA) polarity data (reference data/ConceptNet/
get_polarity_data.py): split positive/negative masked-sentence pairs into
single labeled examples, filling [MASK] with the true object token."""

from __future__ import annotations

import argparse
import json
import os
import re
from hashlib import md5

_TOKEN_RE_PUNCT = re.compile(r"([.!?])")
_TOKEN_RE_OTHER = re.compile(r"[^a-zA-Z.!?]+")


def _tokenize(s: str):
    s = _TOKEN_RE_PUNCT.sub(r" \1", s)
    s = _TOKEN_RE_OTHER.sub(r" ", s)
    return s.split()


def process_pair(pair):
    mask = "[MASK]"
    filled_pos = pair["positive"].replace(mask, pair["masked"])
    filled_neg = pair["negative"].replace(mask, pair["masked"])
    rows = []
    for text, polarity in [(filled_pos, 1), (filled_neg, 0)]:
        rows.append({"sentence": text,
                     "id": md5(text.encode()).hexdigest(),
                     "polarity": polarity,
                     "predicate": pair["predicateType"],
                     "n_tokens": len(_tokenize(text))})
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--indir", type=str, required=True,
                   help="Directory containing {train,dev,test}.jsonl pairs")
    p.add_argument("--outdir", type=str, required=True)
    args = p.parse_args()
    os.makedirs(args.outdir)
    for fname in ("train.jsonl", "dev.jsonl", "test.jsonl"):
        pairs = [json.loads(l) for l in open(os.path.join(args.indir, fname))]
        seen = set()
        skipped = 0
        out = []
        for pair in pairs:
            key = (pair["positive"].lower(), pair["negative"].lower())
            if key in seen:
                skipped += 1
                continue
            seen.add(key)
            out.extend(process_pair(pair))
        print(f"{fname}: skipped {skipped} duplicate pairs")
        with open(os.path.join(args.outdir, fname), "w") as f:
            for row in out:
                json.dump(row, f)
                f.write("\n")


if __name__ == "__main__":
    main()
