"""CLI: consistency & self-BLEU evaluation (reference consistency.py CLI).

compute:   decoder_predictions_{ds}.csv + self_bleus_{ds}.csv
summarize: aggregate table + mean self-BLEU
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), "..", "..")))


import argparse

from dvae_tpu.utils import apply_platform_override

apply_platform_override()  # DVAE_PLATFORM=cpu|... before any backend init


def parse_args():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(help="Specify compute or summarize")

    c = sub.add_parser("compute")
    c.set_defaults(compute=True, summarize=False)
    c.add_argument("params_json", type=str)
    c.add_argument("outdir", type=str)
    c.add_argument("dataset", type=str, choices=["train", "dev", "test"])
    c.add_argument("--num_resamples", type=int, default=30)
    c.add_argument("--verbose", action="store_true", default=False)

    s = sub.add_parser("summarize")
    s.set_defaults(compute=False, summarize=True)
    s.add_argument("outdir", type=str)
    s.add_argument("dataset", type=str, choices=["train", "dev", "test"])
    return parser.parse_args()


if __name__ == "__main__":
    args = parse_args()
    from dvae_tpu.evaluation.model_evals import (compute_consistency,
                                                 summarize_consistency)
    if getattr(args, "compute", False):
        compute_consistency(args.params_json, args.outdir, args.dataset,
                            num_resamples=args.num_resamples,
                            verbose=args.verbose)
    elif getattr(args, "summarize", False):
        summarize_consistency(args.outdir, args.dataset)
