"""CLI: multi-model MIG boxplots + MI bars (reference plot_migs.py CLI)."""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), "..", "..")))


import argparse

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("MIG_files", type=str, nargs="+",
                        help="MIGS_{dataset}.jsonl files, one per model")
    parser.add_argument("outfile", type=str)
    parser.add_argument("--model_names", type=str, nargs="+", required=True)
    args = parser.parse_args()

    from dvae_tpu.evaluation.plots import plot_migs
    plot_migs(args.MIG_files, args.outfile, args.model_names)
    print(f"Saved {args.outfile}")
