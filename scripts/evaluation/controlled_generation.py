"""CLI: controlled generation via opposite-class mean-z transfer
(reference controlled_generation.py CLI)."""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), "..", "..")))


import argparse

from dvae_tpu.utils import apply_platform_override

apply_platform_override()  # DVAE_PLATFORM=cpu|... before any backend init


def parse_args():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers()

    c = sub.add_parser("compute")
    c.set_defaults(cmd="compute")
    c.add_argument("params_file", type=str)
    c.add_argument("outfile", type=str)
    c.add_argument("dataset", type=str, choices=["train", "dev", "test"])
    c.add_argument("--verbose", action="store_true", default=False)

    s = sub.add_parser("summarize")
    s.set_defaults(cmd="summarize")
    s.add_argument("outfile", type=str)
    return parser.parse_args()


if __name__ == "__main__":
    args = parse_args()
    from dvae_tpu.evaluation.model_evals import (
        compute_controlled_generation, summarize_controlled_generation)
    if args.cmd == "compute":
        compute_controlled_generation(args.params_file, args.outfile,
                                      args.dataset, verbose=args.verbose)
    elif args.cmd == "summarize":
        summarize_controlled_generation(args.outfile)
