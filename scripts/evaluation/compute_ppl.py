"""CLI: perplexity of originals vs VAE reconstructions (reference
compute_ppl.py CLI). Uses locally cached GPT-2 weights when available;
otherwise falls back to an n-gram LM trained on the train-split originals
(the reference's ngram_ppl helper model) so a PPL(orig) vs PPL(recon)
table is always produced. Reconstructions are saved either way."""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), "..", "..")))


import argparse

from dvae_tpu.utils import apply_platform_override

apply_platform_override()  # DVAE_PLATFORM=cpu|... before any backend init


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("params_json", type=str)
    parser.add_argument("data_dir", type=str)
    parser.add_argument("logfile", type=str)
    parser.add_argument("-N", type=int, default=-1)
    parser.add_argument("--verbose", action="store_true", default=False)
    parser.add_argument("--ngram_order", type=int, default=2,
                        help="n-gram order for the --fallback floor LM")
    parser.add_argument("--fallback", type=str, default="kn3",
                        choices=["kn3", "floor"],
                        help="no-GPT-2 estimator: Kneser-Ney trigram "
                             "(default) or the reference's floor n-gram")
    parser.add_argument("--rescore", action="store_true", default=False,
                        help="re-score the SAVED reconstructions in "
                             "`logfile` under --fallback without loading "
                             "the model (no accelerator needed)")
    return parser.parse_args()


if __name__ == "__main__":
    args = parse_args()
    if args.rescore:
        from dvae_tpu.evaluation.model_evals import rescore_ppl
        rescore_ppl(args.data_dir, args.logfile,
                    ngram_order=args.ngram_order, fallback=args.fallback)
    else:
        from dvae_tpu.evaluation.model_evals import compute_ppl
        compute_ppl(args.params_json, args.data_dir, args.logfile,
                    N=args.N, verbose=args.verbose,
                    ngram_order=args.ngram_order, fallback=args.fallback)
