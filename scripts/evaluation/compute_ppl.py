"""CLI: GPT-2 perplexity of originals vs VAE reconstructions
(reference compute_ppl.py CLI). GPT-2 weights must be locally cached;
without them, reconstructions are still produced and saved."""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), "..", "..")))


import argparse


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("params_json", type=str)
    parser.add_argument("data_dir", type=str)
    parser.add_argument("logfile", type=str)
    parser.add_argument("-N", type=int, default=-1)
    parser.add_argument("--verbose", action="store_true", default=False)
    return parser.parse_args()


if __name__ == "__main__":
    args = parse_args()
    from dvae_tpu.evaluation.model_evals import compute_ppl
    compute_ppl(args.params_json, args.data_dir, args.logfile, N=args.N,
                verbose=args.verbose)
