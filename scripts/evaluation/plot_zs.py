"""CLI: latent histograms + content t-SNE (reference plot_zs.py CLI)."""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), "..", "..")))


import argparse

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("metadata_dir", type=str)
    parser.add_argument("data_dir", type=str)
    parser.add_argument("--data_split", type=str, default="train")
    parser.add_argument("--epoch", type=int, default=-1)
    parser.add_argument("--outfile", type=str, default="latent_plots.png")
    args = parser.parse_args()

    from dvae_tpu.evaluation.plots import plot_latents
    plot_latents(args.metadata_dir, args.data_dir, args.data_split,
                 epoch=args.epoch, outfile=args.outfile)
    print(f"Saved {args.outfile}")
