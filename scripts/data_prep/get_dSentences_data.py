"""dSentences processor (reference data/dSentences/get_dSentences_data.py):
npz archive of sentences + 9 generative-factor labels -> jsonl splits.

Splits: --split_on content (random over unique contents), factor-based, or
random. Verb/object re-annotation (reference get_dSentences_data.py:110-144)
splits the lumped verb_obj_tuple factor: verb = tuple // 10, object = the
lemma id of the sentence's final token. Lemmas come from spacy when it is
installed (the reference's path) and otherwise from a rule-based English
noun lemmatizer covering the dSentences object vocabulary (documented
deviation: same lemma grouping for regular plurals + the standard
irregulars, no model download needed).
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


_IRREGULAR_NOUN_LEMMAS = {
    "men": "man", "women": "woman", "children": "child",
    "people": "person", "feet": "foot", "teeth": "tooth",
    "mice": "mouse", "geese": "goose", "oxen": "ox", "dice": "die",
    "knives": "knife", "wives": "wife", "lives": "life", "loaves": "loaf",
    "leaves": "leaf", "wolves": "wolf", "shelves": "shelf",
    "halves": "half", "thieves": "thief", "scarves": "scarf",
}


def _rule_lemma(word):
    """Rule-based English noun lemma (spacy-free fallback): irregulars +
    regular plural suffix stripping. Singulars pass through unchanged."""
    w = word.lower()
    if w in _IRREGULAR_NOUN_LEMMAS:
        return _IRREGULAR_NOUN_LEMMAS[w]
    if w.endswith("ies") and len(w) > 4:
        return w[:-3] + "y"
    for suf in ("sses", "shes", "ches", "xes", "zes"):
        if w.endswith(suf):
            return w[:-2]
    if w.endswith("s") and not w.endswith(("ss", "us", "is")):
        return w[:-1]
    return w


def make_lemmatizer():
    """spacy lemmas when available (the reference's path,
    get_dSentences_data.py:119-131), rule-based otherwise."""
    try:
        import spacy
        nlp = spacy.load("en_core_web_sm", disable=["parser", "ner"])

        def lemma(word):
            return nlp(word)[0].lemma_
        return lemma, "spacy"
    except Exception:
        return _rule_lemma, "rules"


def get_verb_object_annotations(examples, object_tokens, lemma=None):
    """Split the lumped verb_obj_tuple factor into separate `verb` and
    `object` annotations (reference get_dSentences_data.py:110-144):
    verb = verb_obj_tuple // 10 (a new verb every 10 raw indices),
    object = the lemma id of the sentence's final token, with lemma ids
    assigned by first occurrence over `object_tokens`."""
    if lemma is None:
        lemma, backend = make_lemmatizer()
        print(f"verb/object re-annotation using {backend} lemmas")
    obj2idx = {}
    lemma2idx = {}
    for obj in object_tokens:
        lem = lemma(obj)
        if lem not in lemma2idx:
            lemma2idx[lem] = len(lemma2idx)
        obj2idx[obj] = lemma2idx[lem]
    for ex in examples:
        ex["verb"] = ex["verb_obj_tuple"] // 10
        ex["object"] = obj2idx[ex["sentence"].split()[-1]]
    return examples


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
        object_tokens = [t.strip() for t in open(args.object_tokens_file)]
        examples = get_verb_object_annotations(examples, object_tokens)

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
