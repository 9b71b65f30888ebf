"""Merge multiple corpora into a combined dataset (reference
scripts/helpers/combine_datasets.py): dedup by id across sources, tag
`source_dataset`, truncate TRAIN per-source to Ns, keep only the key
intersection across sources.

Fixes reference quirk #6: dev/test are NOT truncated with the train Ns
(the reference computed Ns=[-1,...] for them but then passed args.Ns --
combine_datasets.py:43-49).
"""

from __future__ import annotations

import argparse
import json
import os


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dirs", nargs="+", type=str, required=True)
    p.add_argument("--dataset_names", nargs="+", type=str, required=True)
    p.add_argument("--Ns", nargs="+", type=int, required=True,
                   help="Per-dataset train example caps; -1 for all.")
    p.add_argument("--outdir", type=str, required=True)
    return p.parse_args()


def merge_datasets(filepaths, dataset_names, Ns):
    assert len(filepaths) == len(dataset_names) == len(Ns)
    to_merge = []
    keys_per_dataset = {}
    seen_ids = set()
    for fpath, name, N in zip(filepaths, dataset_names, Ns):
        rows = []
        keys = set()
        for line in open(fpath):
            datum = json.loads(line)
            if datum["id"] in seen_ids:
                continue
            seen_ids.add(datum["id"])
            datum["source_dataset"] = name
            keys.update(datum.keys())
            rows.append(datum)
        keys_per_dataset[fpath] = keys
        to_merge.extend(rows[:N] if N >= 0 else rows)
    keep = set.intersection(*keys_per_dataset.values())
    assert "sentence" in keep
    for datum in to_merge:
        yield {k: datum[k] for k in keep if k in datum}


def main():
    args = parse_args()
    if len(args.data_dirs) < 2:
        raise ValueError("Must specify more than 1 data_dirs.")
    if len(args.data_dirs) != len(args.dataset_names):
        raise ValueError("data_dirs and dataset_names lengths differ.")
    os.makedirs(args.outdir, exist_ok=False)
    for setname in ("train", "dev", "test"):
        paths = [os.path.join(d, f"{setname}.jsonl")
                 for d in args.data_dirs]
        for pth in paths:
            if not os.path.exists(pth):
                raise OSError(f"Expected file at '{pth}'")
        Ns = args.Ns if setname == "train" else [-1] * len(paths)
        print(f"Merging {setname} (Ns: {Ns})")
        with open(os.path.join(args.outdir, f"{setname}.jsonl"), "w") as f:
            for datum in merge_datasets(paths, args.dataset_names, Ns):
                json.dump(datum, f)
                f.write("\n")


if __name__ == "__main__":
    main()
