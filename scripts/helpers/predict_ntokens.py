"""Latent -> sentence-length regression (reference scripts/helpers/
predict_ntokens.py, paper table 12): LinearRegression R-squared predicting
n_tokens from every combination of latent spaces, plus per-dimension
R-squared for the content space."""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), "..", "..")))



import argparse
import itertools
import json
import os

import numpy as np
from sklearn.linear_model import LinearRegression

from dvae_tpu.evaluation.metadata import (get_last_epoch, latent_files,
                                          read_ordered_ids)


def get_n_tokens(data_dir, dataset):
    path = os.path.join(data_dir, f"{dataset}.jsonl")
    out = {}
    for line in open(path):
        datum = json.loads(line)
        n = datum.get("n_tokens", len(datum["sentence"].split()))
        out[datum["id"]] = n
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("metadata_dir", type=str)
    p.add_argument("data_dir", type=str)
    p.add_argument("--dataset", type=str, required=True,
                   choices=["train", "dev", "test"])
    p.add_argument("--latent_names", type=str, default=None, nargs="+")
    p.add_argument("--epoch", type=int, default=-1)
    args = p.parse_args()

    epoch = args.epoch if args.epoch != -1 else get_last_epoch(
        os.path.join(args.metadata_dir, "z"))
    latent_names, z_files, _, _ = latent_files(args.metadata_dir,
                                               args.dataset, epoch)
    if args.latent_names:
        keep = set(args.latent_names)
        z_files = [f for n, f in zip(latent_names, z_files) if n in keep]
        latent_names = [n for n in latent_names if n in keep]
    ids = read_ordered_ids(args.metadata_dir, args.dataset, epoch)
    id2len = get_n_tokens(args.data_dir, args.dataset)
    y = np.array([id2len[u] for u in ids], dtype=np.float64)

    zs = {}
    for name, zf in zip(latent_names, z_files):
        z = np.loadtxt(zf, delimiter=",")
        zs[name] = z[:, None] if z.ndim == 1 else z

    print(f"Predicting n_tokens from latents ({args.dataset}, "
          f"epoch {epoch}); N={len(y)}")
    for r in range(1, len(latent_names) + 1):
        for combo in itertools.combinations(latent_names, r):
            Z = np.concatenate([zs[n] for n in combo], axis=1)
            reg = LinearRegression().fit(Z, y)
            print(f"  {'+'.join(combo):<40} R^2 = {reg.score(Z, y):.4f}")
    if "content" in zs:
        print("Per-dimension R^2 (content):")
        Zc = zs["content"]
        for d in range(Zc.shape[1]):
            reg = LinearRegression().fit(Zc[:, d:d + 1], y)
            print(f"  dim {d:<3} R^2 = {reg.score(Zc[:, d:d + 1], y):.4f}")


if __name__ == "__main__":
    main()
