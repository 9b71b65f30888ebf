"""CLI: disentanglement / MIG evaluation.

Same subcommands as the reference (scripts/evaluation/disentanglement.py):
  test       -- synthetic oracle self-tests of the MI/MIG estimator
  compute    -- MIGS_{ds}.jsonl + predictions_{ds}.csv from metadata logs
  summarize  -- tables + boxplots
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), "..", "..")))


import argparse


def parse_args():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(help="Specify test, compute, or summarize")

    t = sub.add_parser("test")
    t.set_defaults(test=True, compute=False, summarize=False)
    t.add_argument("-N", type=int, default=100000)
    t.add_argument("-K", type=int, default=2)
    t.add_argument("--n_features", type=int, default=1)

    c = sub.add_parser("compute")
    c.set_defaults(test=False, compute=True, summarize=False)
    c.add_argument("metadata_dir", type=str)
    c.add_argument("data_dir", type=str)
    c.add_argument("dataset", type=str, choices=["train", "dev", "test"])
    c.add_argument("outdir", type=str)
    c.add_argument("--epoch", type=int, default=-1)
    c.add_argument("--num_resamples", type=int, default=10)

    s = sub.add_parser("summarize")
    s.set_defaults(test=False, compute=False, summarize=True)
    s.add_argument("dataset", type=str, choices=["train", "dev", "test"])
    s.add_argument("outdir", type=str)

    args = parser.parse_args()
    if not any([getattr(args, "test", False), getattr(args, "compute", False),
                getattr(args, "summarize", False)]):
        parser.print_help()
    return args


if __name__ == "__main__":
    from dvae_tpu.evaluation import disentanglement as D
    args = parse_args()
    if getattr(args, "test", False):
        print("BIJECTIVE ORACLE")
        print("  random")
        D.test_bijective_oracle(args.N, args.K, args.n_features)
        print("  predictive")
        D.test_bijective_oracle(args.N, args.K, args.n_features,
                                predictive=True)
        print("\nBIJECTIVE")
        print("  random")
        D.test_bijective(args.N, args.K)
        print("  predictive")
        D.test_bijective(args.N, args.K, predictive=True)
        print("\n\nRANDOM")
        D.test_random(args.N, args.K, args.n_features)
        print("KINDA PREDICTIVE")
        D.test_kinda_predictive(args.N, args.K, args.n_features)
        print("PREDICTIVE")
        D.test_predictive(args.N, args.K, args.n_features)
    elif getattr(args, "compute", False):
        D.compute(args.metadata_dir, args.data_dir, args.dataset,
                  args.outdir, epoch=args.epoch,
                  num_resamples=args.num_resamples, progress=True)
    elif getattr(args, "summarize", False):
        D.summarize(args.dataset, args.outdir)
