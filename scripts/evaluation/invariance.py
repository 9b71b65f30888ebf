"""CLI: latent invariance analysis (reference invariance.py CLI)."""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), "..", "..")))


import argparse

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("metadata_dir", type=str)
    parser.add_argument("data_dir", type=str)
    parser.add_argument("data_split", type=str,
                        choices=["train", "dev", "test"])
    parser.add_argument("--num_resamples", type=int, default=10)
    parser.add_argument("--plot_path", type=str, default=None)
    args = parser.parse_args()

    from dvae_tpu.evaluation.invariance import compute
    compute(args.metadata_dir, args.data_dir, args.data_split,
            num_resamples=args.num_resamples, plot_path=args.plot_path)
