"""Cross-implementation MIG parity check.

Runs the REFERENCE's disentanglement evaluator
(/root/reference/scripts/evaluation/disentanglement.py:70-148, imported
unmodified from the reference tree) on dvae-tpu-generated metadata logs, and
dvae_tpu's own estimator on the same logs, then prints a side-by-side
mean/std table of per-label MI and MIG so metric parity is demonstrated
rather than asserted. Also checks the predictions CSV emitted by both has a
byte-identical header and row schema.

Environment note: the installed sklearn (>=1.2) removed the
LogisticRegression(penalty="none") spelling the reference uses
(disentanglement.py:189); penalty=None is sklearn's documented exact
replacement, so we shim only that spelling translation before calling the
reference code.

Usage:
  python scripts/evaluation/crosscheck_reference_mig.py \
      logs/combined/sfu_conceptnet/vae_cyclic/metadata \
      data/combined/sfu_conceptnet dev out_dir [--epoch -1] \
      [--num_resamples 10]
"""

import argparse
import csv
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..")))

REFERENCE_EVAL_DIR = "/root/reference/scripts/evaluation"


def load_reference_module():
    sys.path.insert(0, REFERENCE_EVAL_DIR)
    import disentanglement as ref_dis  # noqa: E501 (reference module)
    sys.path.pop(0)

    import sklearn
    major, minor = (int(x) for x in sklearn.__version__.split(".")[:2])
    if (major, minor) >= (1, 2):
        from sklearn.linear_model import LogisticRegression

        def compat_lr(*args, **kwargs):
            if kwargs.get("penalty") == "none":
                kwargs["penalty"] = None
            return LogisticRegression(*args, **kwargs)

        ref_dis.LogisticRegression = compat_lr
    return ref_dis


def summarize_migs_file(path):
    """(label -> MIG list, label -> latent -> MI list) from a MIGS jsonl."""
    migs = defaultdict(list)
    mis = defaultdict(lambda: defaultdict(list))
    for line in open(path):
        datum = json.loads(line)
        for label, entry in datum.items():
            if label == "sample_num":
                continue
            migs[label].append(entry["MIG"])
            for name, mi in zip(entry["sorted_latents"],
                                entry["sorted_MIs"]):
                mis[label][name].append(mi)
    return migs, mis


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("metadata_dir")
    ap.add_argument("data_dir")
    ap.add_argument("dataset", choices=["train", "dev", "test"])
    ap.add_argument("outdir")
    ap.add_argument("--epoch", type=int, default=-1)
    ap.add_argument("--num_resamples", type=int, default=10)
    args = ap.parse_args()

    ref_out = os.path.join(args.outdir, "reference_impl")
    ours_out = os.path.join(args.outdir, "dvae_tpu_impl")
    os.makedirs(ref_out, exist_ok=True)
    os.makedirs(ours_out, exist_ok=True)

    print("== running REFERENCE disentanglement.compute ==", flush=True)
    ref_dis = load_reference_module()
    ref_args = argparse.Namespace(
        metadata_dir=args.metadata_dir, data_dir=args.data_dir,
        dataset=args.dataset, outdir=ref_out, epoch=args.epoch,
        num_resamples=args.num_resamples)
    np.random.seed(0)
    ref_dis.compute(ref_args)

    print("== running dvae_tpu disentanglement.compute ==", flush=True)
    from dvae_tpu.evaluation.disentanglement import compute as ours_compute
    ours_compute(args.metadata_dir, args.data_dir, args.dataset, ours_out,
                 epoch=args.epoch, num_resamples=args.num_resamples, seed=0)

    migs_name = f"MIGS_{args.dataset}.jsonl"
    preds_name = f"predictions_{args.dataset}.csv"
    r_migs, r_mis = summarize_migs_file(os.path.join(ref_out, migs_name))
    o_migs, o_mis = summarize_migs_file(os.path.join(ours_out, migs_name))

    assert set(r_migs) == set(o_migs), (set(r_migs), set(o_migs))
    rows = []
    print(f"\n{'label':<14}{'latent':<14}{'ref MI':>16}{'ours MI':>16}")
    for label in sorted(r_mis):
        for latent in sorted(r_mis[label]):
            rm = np.mean(r_mis[label][latent])
            rs = np.std(r_mis[label][latent])
            om = np.mean(o_mis[label][latent])
            osd = np.std(o_mis[label][latent])
            print(f"{label:<14}{latent:<14}"
                  f"{rm:>9.4f}±{rs:<6.4f}{om:>9.4f}±{osd:<6.4f}")
            rows.append({"kind": "MI", "label": label, "latent": latent,
                         "ref_mean": rm, "ref_std": rs,
                         "ours_mean": om, "ours_std": osd})
    print(f"\n{'label':<14}{'':<14}{'ref MIG':>16}{'ours MIG':>16}")
    for label in sorted(r_migs):
        rm, rs = np.mean(r_migs[label]), np.std(r_migs[label])
        om, osd = np.mean(o_migs[label]), np.std(o_migs[label])
        print(f"{label:<14}{'':<14}"
              f"{rm:>9.4f}±{rs:<6.4f}{om:>9.4f}±{osd:<6.4f}")
        rows.append({"kind": "MIG", "label": label, "latent": "",
                     "ref_mean": rm, "ref_std": rs,
                     "ours_mean": om, "ours_std": osd})

    # predictions CSV schema byte-compat: identical header, same column
    # count and (sample_num, latent, label) triples per row set
    with open(os.path.join(ref_out, preds_name)) as f:
        ref_rows = list(csv.reader(f))
    with open(os.path.join(ours_out, preds_name)) as f:
        our_rows = list(csv.reader(f))
    assert ref_rows[0] == our_rows[0], (ref_rows[0], our_rows[0])
    assert len(ref_rows) == len(our_rows)
    ref_keys = sorted(tuple(r[:3]) for r in ref_rows[1:])
    our_keys = sorted(tuple(r[:3]) for r in our_rows[1:])
    assert ref_keys == our_keys
    print(f"\npredictions CSV schema: header identical, "
          f"{len(ref_rows) - 1} rows, same (sample, latent, label) keys")

    with open(os.path.join(args.outdir, "crosscheck.json"), "w") as f:
        json.dump({"dataset": args.dataset, "epoch": args.epoch,
                   "num_resamples": args.num_resamples,
                   "metadata_dir": args.metadata_dir, "rows": rows}, f,
                  indent=2)
    print(f"\nwrote {os.path.join(args.outdir, 'crosscheck.json')}")


if __name__ == "__main__":
    main()
