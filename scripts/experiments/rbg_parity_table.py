"""rbg fast-profile certification table (round 4, VERDICT r3 #4).

Compares the full eval suite between a parity-default twin (threefry +
f32) and the bench-configuration twin (rbg + bf16 + scan +
epoch_scan_unroll=2) of the SAME variant/seed: MIG (30 resamples),
consistency/self-BLEU, controlled-generation flip accuracy, attribute-
transfer accuracy, and originals-vs-reconstructions PPL. The two runs
draw different random streams (rbg is distribution-equal, not
bit-equal), so agreement is expected at the across-seed noise scale,
not bitwise.

Usage:
  python scripts/experiments/rbg_parity_table.py \
      --logs_a logs/combined/sfu_conceptnet_fv80/vae_adv+mi \
      --logs_b logs/combined/sfu_conceptnet_fv80/vae_adv+mi_rbg \
      --evals_a evaluation_results/sfu_conceptnet_fv80/vae_adv+mi \
      --evals_b evaluation_results/sfu_conceptnet_fv80/vae_adv+mi_rbg \
      --labels threefry_f32 rbg_bf16 [--dataset dev] [--out table.md]
"""

import argparse
import json
import os
import re
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..")))


def mig_stats(migs_path):
    """{label: (mig_mean, mig_std)} + {(label, latent): mi_mean}."""
    migs = defaultdict(list)
    top = {}
    for line in open(migs_path):
        d = json.loads(line)
        for lab, e in d.items():
            if lab == "sample_num":
                continue
            migs[lab].append(e["MIG"])
            top[lab] = e["sorted_latents"][0]
    return {lab: (float(np.mean(v)), float(np.std(v)))
            for lab, v in migs.items()}, top


def self_bleu(csv_path):
    import csv as _csv
    with open(csv_path) as f:
        rows = list(_csv.DictReader(f))
    vals = [float(r["BLEU"]) for r in rows]
    return float(np.mean(vals)), float(np.std(vals))


def flip_accs(summary_path):
    """{row_label: acc} from a controlled-generation summary
    (| label | P | R | F | Acc |) or an attribute-transfer summary
    (| label | Accuracy |) -- the last numeric column either way."""
    accs = {}
    for line in open(summary_path):
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(cells) < 2 or not re.fullmatch(r"[0-9.]+", cells[-1]):
            continue
        accs[cells[0]] = float(cells[-1])
    return accs


def ppl(path):
    d = json.load(open(path))
    out = {"estimator": d.get("estimator")}
    for split in ("dev", "test", "train"):
        if split in d:
            out[split] = (d[split]["original_ppl"],
                          d[split]["reconstruction_ppl"])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logs_a", required=True)
    ap.add_argument("--logs_b", required=True)
    ap.add_argument("--evals_a", required=True)
    ap.add_argument("--evals_b", required=True)
    ap.add_argument("--labels", nargs=2, default=["threefry_f32",
                                                  "rbg_bf16"])
    ap.add_argument("--dataset", default="dev")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    ds = args.dataset
    la, lb = args.labels

    lines = [f"| metric | {la} | {lb} |", "|---|---|---|"]

    for name, logd in (("a", args.logs_a), ("b", args.logs_b)):
        p = os.path.join(logd, "evaluation", f"MIGS_{ds}.jsonl")
        assert os.path.exists(p), p
    (migs_a, top_a) = mig_stats(os.path.join(args.logs_a, "evaluation",
                                             f"MIGS_{ds}.jsonl"))
    (migs_b, top_b) = mig_stats(os.path.join(args.logs_b, "evaluation",
                                             f"MIGS_{ds}.jsonl"))
    for lab in sorted(migs_a):
        a, b = migs_a[lab], migs_b.get(lab, (float("nan"), float("nan")))
        lines.append(f"| MIG {lab} (30 resamples) | "
                     f"{a[0]:.4f}±{a[1]:.4f} | {b[0]:.4f}±{b[1]:.4f} |")
    lines.append(f"| top-MI latent per label | "
                 f"{', '.join(f'{k}:{v}' for k, v in sorted(top_a.items()))} | "
                 f"{', '.join(f'{k}:{v}' for k, v in sorted(top_b.items()))} |")

    sa = self_bleu(os.path.join(args.evals_a, f"self_bleus_{ds}.csv"))
    sb = self_bleu(os.path.join(args.evals_b, f"self_bleus_{ds}.csv"))
    lines.append(f"| consistency self-BLEU | {sa[0]:.4f}±{sa[1]:.4f} "
                 f"| {sb[0]:.4f}±{sb[1]:.4f} |")

    for kind in ("controlled", "transfer"):
        fa = flip_accs(os.path.join(args.evals_a,
                                    f"{kind}_summary_{ds}.txt"))
        fb = flip_accs(os.path.join(args.evals_b,
                                    f"{kind}_summary_{ds}.txt"))
        for row in sorted(set(fa) & set(fb)):
            lines.append(f"| {kind} acc: {row} | {fa[row]:.3f} "
                         f"| {fb[row]:.3f} |")

    pa = ppl(os.path.join(args.evals_a,
                          "ppl_reconstructions.jsonl.ppl.json"))
    pb = ppl(os.path.join(args.evals_b,
                          "ppl_reconstructions.jsonl.ppl.json"))
    for split in ("dev", "test"):
        if split in pa and split in pb:
            lines.append(
                f"| {split} PPL orig / recon ({pa['estimator']}) | "
                f"{pa[split][0]:.2f} / {pa[split][1]:.2f} | "
                f"{pb[split][0]:.2f} / {pb[split][1]:.2f} |")

    table = "\n".join(lines)
    print(table)
    if args.out:
        with open(args.out, "w") as f:
            f.write(table + "\n")
        print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
