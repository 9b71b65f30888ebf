"""n-gram language-model perplexity per corpus (reference scripts/helpers/
ngram_ppl.py): n-gram LM with a 1e-8 probability floor, trained on each
corpus's train split and evaluated on train/dev/test, with UNK counts.
nltk-free reimplementation."""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), "..", "..")))



import argparse
import json
import os

from dvae_tpu.data import preprocess_sentences
from dvae_tpu.evaluation.ppl import estimate_ngram_lm
from dvae_tpu.evaluation.ppl import ngram_ppl as compute_ppl


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("data_dirs", nargs="+", type=str,
                   help="Directories containing {train,dev,test}.jsonl")
    p.add_argument("-n", type=int, default=2, help="n-gram order")
    return p.parse_args()


def read_split(data_dir, split):
    path = os.path.join(data_dir, f"{split}.jsonl")
    sents = [json.loads(line)["sentence"] for line in open(path)]
    return preprocess_sentences(sents, "<s>", "</s>")


def main():
    args = parse_args()
    for data_dir in args.data_dirs:
        train = read_split(data_dir, "train")
        model, vocab = estimate_ngram_lm(train, n=args.n)
        print(f"==== {data_dir} (n={args.n}) ====")
        for split in ("train", "dev", "test"):
            sents = read_split(data_dir, split)
            ppl, n_unk = compute_ppl(model, vocab, sents, n=args.n)
            print(f"  {split}: PPL={ppl:.2f}  UNK tokens={n_unk}")


if __name__ == "__main__":
    main()
