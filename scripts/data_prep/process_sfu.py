"""SFU Review Corpus (Negation & Speculation) processor.

Capability match for reference data/SFU/process_sfu.py: parse the annotated
XML, derive per-sentence weak labels (uncertainty from speculation cues,
polarity from negation cues or a literal "n't" token), split compound
sentences on un-cued <C>and</C> conjunctions, strip leading punctuation,
ASCII-filter, md5-dedup on the lowercased sentence, and write shuffled
70/15/15 {train,dev,test}.jsonl plus per-split stats.

Usage:
  python scripts/data_prep/process_sfu.py CORPUS_DIR [CORPUS_DIR ...] \
      --outdir data/SFU/processed [--max_length 15] [--seed 0]
"""

from __future__ import annotations

import argparse
import json
import os
import string
import xml.etree.ElementTree as ET
from collections import defaultdict
from hashlib import md5

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("corpus_dirs", type=str, nargs="+",
                   help="Directories containing annotated XML files.")
    p.add_argument("--outdir", type=str, required=True)
    p.add_argument("--max_length", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def _fresh_attrs():
    return {"uncertainty": "certain", "polarity": "positive"}


def split_sentence(elements):
    """Walk a SENTENCE's children, accumulating word elements and label
    state; start a new sub-sentence at every un-cued <C>and</C>."""
    sentences, sent_attrs = [], []
    curr = []
    attrs = _fresh_attrs()
    for elem in elements:
        if elem.tag == "W":
            if elem.text and elem.text.lower() == "n't":
                attrs["polarity"] = "negative"
            curr.append(elem)
        elif elem.tag in ("C", "cue"):
            cue = elem.find("./cue") if elem.tag == "C" else elem
            if cue is not None:
                cue_type = cue.get("type")
                if cue_type == "speculation":
                    attrs["uncertainty"] = "uncertain"
                elif cue_type == "negation":
                    attrs["polarity"] = "negative"
                w = elem.find(".//W")
                if w is not None:
                    curr.append(w)
            else:
                w = elem.find(".//W")
                if w is not None and w.text and w.text.lower() == "and":
                    sentences.append(curr)
                    sent_attrs.append(attrs)
                    curr = []
                    attrs = _fresh_attrs()
                elif w is not None:
                    curr.append(w)
        else:
            # scope wrappers (xcope etc.): recurse and absorb
            sub_words, sub_attrs = split_sentence(elem.findall("./"))
            if sub_words and sub_words[0]:
                curr.extend(sub_words[0])
                if sub_attrs[0]["uncertainty"] == "uncertain":
                    attrs["uncertainty"] = "uncertain"
                if sub_attrs[0]["polarity"] == "negative":
                    attrs["polarity"] = "negative"
    sentences.append(curr)
    sent_attrs.append(attrs)
    return sentences, sent_attrs


def read_xml(path, extra_attrs=None):
    extra_attrs = extra_attrs or {}
    try:
        tree = ET.parse(path)
    except ET.ParseError:
        print(f"{path}\nnot well formed. continuing...")
        return []
    out = []
    for sentence in tree.getroot().findall(".//SENTENCE"):
        subwords, sub_attrs = split_sentence(sentence.findall("./*"))
        was_split = len(subwords) > 1
        for words, attrs in zip(subwords, sub_attrs):
            if len(words) <= 2:
                continue
            toks = [w.text for w in words if w is not None and w.text]
            if toks and toks[0] in string.punctuation:
                toks = toks[1:]
            text = " ".join(toks).encode("ascii", "ignore").decode("utf8")
            if not text.strip():
                continue
            out.append({"sentence": text, "was_split": was_split,
                        "n_tokens": len(words), **attrs, **extra_attrs})
    return out


def main():
    args = parse_args()
    rng = np.random.default_rng(args.seed)
    data = []
    seen = set()
    for corpus_dir in args.corpus_dirs:
        review_type = os.path.basename(corpus_dir.rstrip("/"))
        for fname in sorted(os.listdir(corpus_dir)):
            for sent in read_xml(os.path.join(corpus_dir, fname),
                                 {"review_type": review_type}):
                if args.max_length is not None and \
                        len(sent["sentence"].split()) > args.max_length:
                    continue
                h = md5(sent["sentence"].lower().encode()).hexdigest()
                if h in seen:
                    continue
                seen.add(h)
                sent["id"] = h
                data.append(sent)

    rng.shuffle(data)
    n = len(data)
    n_train = int(round(n * 0.7))
    n_dev = int(round(n * 0.15))
    splits = {"train": data[:n_train],
              "dev": data[n_train:n_train + n_dev],
              "test": data[n_train + n_dev:]}

    os.makedirs(args.outdir)
    for name, rows in splits.items():
        with open(os.path.join(args.outdir, f"{name}.jsonl"), "w") as f:
            for row in rows:
                json.dump(row, f)
                f.write("\n")
        counts = defaultdict(lambda: defaultdict(int))
        for row in rows:
            for key in ("review_type", "uncertainty", "polarity",
                        "was_split"):
                counts[key][row[key]] += 1
        print(f"===== {name} ({len(rows)}) =====")
        for key, sub in counts.items():
            print(key)
            for k, v in sorted(sub.items(), key=lambda kv: str(kv[0])):
                print(f"  {k}: {v}")
        print()


if __name__ == "__main__":
    main()
