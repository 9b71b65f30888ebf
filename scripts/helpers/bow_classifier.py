"""Bag-of-words weak-labeling classifier (reference scripts/helpers/
bow_classifier.py).

estimate: CountVectorizer(binary unigrams) -> SelectKBest(f_classif, k=20)
  -> BernoulliNB per label (uncertainty/polarity) on a labeled corpus; logs
  macro P/R/F per split to {logdir}/results.log and joblib-saves
  model/vectorizer/feature_selector per label under {logdir}/models/{label}/.
apply: loads the saved triples and adds {label} + {label}_prob keys to an
  unlabeled corpus's jsonl files.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), "..", "..")))



import argparse
import json
import os
import string

import joblib
import numpy as np
from sklearn.feature_extraction.text import CountVectorizer
from sklearn.feature_selection import SelectKBest, f_classif
from sklearn.metrics import precision_recall_fscore_support
from sklearn.naive_bayes import BernoulliNB

from dvae_tpu.data import get_sentences_labels, preprocess_sentences


def parse_args():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers()

    est = sub.add_parser("estimate")
    est.set_defaults(estimate=True, apply=False)
    est.add_argument("data_dir", type=str,
                     help="Directory containing {train,dev,test}.jsonl")
    est.add_argument("logdir", type=str)

    app = sub.add_parser("apply")
    app.set_defaults(estimate=False, apply=True)
    app.add_argument("logdir", type=str,
                     help="logdir from a previous estimate run")
    app.add_argument("data_dir", type=str)
    app.add_argument("outdir", type=str)

    args = parser.parse_args()
    if not (getattr(args, "estimate", False) or
            getattr(args, "apply", False)):
        parser.print_help()
        raise SystemExit(0)
    return args


def tokenizer(s: str):
    toks = preprocess_sentences([s], None, None)[0]
    return [t for t in toks if t not in string.punctuation]


def estimate(args):
    outfile = os.path.join(args.logdir, "results.log")
    if os.path.exists(outfile):
        raise OSError(f"Existing results found at '{outfile}'. Aborting.")
    os.makedirs(args.logdir, exist_ok=True)

    sents, labels = {}, {}
    label_counts = None
    for split in ("train", "dev", "test"):
        s, labs, _, counts = get_sentences_labels(
            os.path.join(args.data_dir, f"{split}.jsonl"), shuffle=False)
        sents[split], labels[split] = s, labs
        if split == "train":
            label_counts = counts

    vectorizer = CountVectorizer(stop_words=None, ngram_range=(1, 1),
                                 binary=True, tokenizer=tokenizer,
                                 token_pattern=None)
    X = {"train": vectorizer.fit_transform(sents["train"])}
    X["dev"] = vectorizer.transform(sents["dev"])
    X["test"] = vectorizer.transform(sents["test"])

    for lab_name in label_counts:
        if lab_name not in ("uncertainty", "polarity"):
            continue
        ys = {split: [labels[split][i][lab_name]
                      for i in range(len(sents[split]))]
              for split in ("train", "dev", "test")}
        # k=20 chosen by the reference's sweep over range(2, 30)
        selector = SelectKBest(f_classif, k=20)
        Xsel = {"train": selector.fit_transform(X["train"], ys["train"]),
                "dev": selector.transform(X["dev"]),
                "test": selector.transform(X["test"])}
        chosen = np.array(vectorizer.get_feature_names_out())[
            selector.get_support()]
        model = BernoulliNB(fit_prior=True)
        model.fit(Xsel["train"], ys["train"])
        with open(outfile, "a") as f:
            f.write(lab_name + "\n")
            f.write("Features:\n")
            f.write(str(chosen) + "\n")
            f.write(f"{'':<10} {'precision':<10} {'recall':<10} "
                    f"{'F1':<10}\n")
            for split in ("train", "dev", "test"):
                preds = model.predict(Xsel[split])
                p, r, fs, _ = precision_recall_fscore_support(
                    ys[split], preds, average="macro")
                f.write(f"{split:<10} {p:<10.4f} {r:<10.4f} {fs:<10.4f}\n")
        model_dir = os.path.join(args.logdir, "models", lab_name)
        os.makedirs(model_dir, exist_ok=True)
        joblib.dump(model, os.path.join(model_dir, "model.sav"))
        joblib.dump(vectorizer, os.path.join(model_dir, "vectorizer.sav"))
        joblib.dump(selector, os.path.join(model_dir,
                                           "feature_selector.sav"))
    print(f"Results written to {outfile}")


def apply(args):
    os.makedirs(args.outdir, exist_ok=False)
    model_dir = os.path.join(args.logdir, "models")
    for fname in ("train.jsonl", "dev.jsonl", "test.jsonl"):
        fpath = os.path.join(args.data_dir, fname)
        if not os.path.exists(fpath):
            print(f"Warning! Expected data file {fpath}, not found.")
            continue
        print(f"Predicting on {fpath}")
        sents, labels, ids, _ = get_sentences_labels(fpath, shuffle=False)
        examples = [{"id": ids[i], "sentence": sents[i], **labels[i]}
                    for i in range(len(sents))]
        for lab_name in os.listdir(model_dir):
            if lab_name in examples[0]:
                print(f"Label {lab_name} already in {fpath}. Skipping.")
                continue
            d = os.path.join(model_dir, lab_name)
            model = joblib.load(os.path.join(d, "model.sav"))
            vectorizer = joblib.load(os.path.join(d, "vectorizer.sav"))
            selector = joblib.load(os.path.join(d, "feature_selector.sav"))
            Xs = selector.transform(vectorizer.transform(sents))
            preds = model.predict(Xs)
            probs = model.predict_proba(Xs).max(axis=1)
            for i, ex in enumerate(examples):
                ex[lab_name] = preds[i].item() \
                    if hasattr(preds[i], "item") else preds[i]
                ex[f"{lab_name}_prob"] = float(probs[i])
        with open(os.path.join(args.outdir, fname), "w") as f:
            for ex in examples:
                json.dump(ex, f)
                f.write("\n")


if __name__ == "__main__":
    args = parse_args()
    if args.estimate:
        estimate(args)
    else:
        apply(args)
