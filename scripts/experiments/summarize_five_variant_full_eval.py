"""Cross-variant summary of the full paper-style evaluation suite over the
five flagship loss ablations (reference README.md:61-113 protocol): one
table per evaluation family, built from the raw artifacts that
scripts/experiments/five_variant_full_eval.sh produces under
evaluation_results/five_variant_study/<variant>/:

  - consistency (reference scripts/evaluation/consistency.py): mean F1 of
    the discriminator's label predictions on the input (y vs y_hat), on the
    re-encoded reconstruction (y vs y_hat_prime), and between the two
    (y_hat vs y_hat_prime), plus self-BLEU across resamples.
  - controlled generation (controlled_generation.py): for each transferred
    latent, how often the re-encoded output's prediction hits the flipped
    target, and how often the OTHER label is retained.
  - attribute transfer (attribute_transfer.py): same accuracies when z
    comes from a real opposite-label source example instead of a class mean.
  - perplexity (compute_ppl.py): originals vs reconstructions on dev under
    the KN3 fallback (or GPT-2 where weights resolve).

Writes full_eval_summary.{json,md} next to the per-variant directories.
"""

import csv
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.abspath(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..")))

import argparse

import numpy as np

VARIANTS = ["vae_inf", "vae_elbo", "vae_adv", "vae_mi", "vae_adv+mi"]
OUTDIR = "evaluation_results/five_variant_study"
DS = "dev"


def consistency_stats(vdir):
    path = os.path.join(vdir, f"decoder_predictions_{DS}.csv")
    if not os.path.exists(path):
        return None
    f1 = defaultdict(list)
    with open(path) as f:
        for row in csv.DictReader(f):
            f1[(row["label"], row["true"], row["pred"])].append(
                float(row["F1"]))
    out = {lab: {} for (lab, _, _) in f1}
    for (lab, true, pred), vals in f1.items():
        out[lab][f"{true}~{pred}"] = {"mean": float(np.mean(vals)),
                                      "std": float(np.std(vals))}
    sb_path = os.path.join(vdir, f"self_bleus_{DS}.csv")
    if os.path.exists(sb_path):
        with open(sb_path) as f:
            vals = [float(r["BLEU"]) for r in csv.DictReader(f)]
        out["self_bleu"] = {"mean": float(np.mean(vals)),
                            "std": float(np.std(vals))}
    return out


def _swap_stats(path, latent_key, got_key, want_key):
    """Transfer-success and other-label-retention accuracy per latent,
    shared by the controlled-generation and attribute-transfer JSONL
    artifacts (same row shape, different key names)."""
    if not os.path.exists(path):
        return None
    hit = defaultdict(list)
    keep = defaultdict(list)
    for line in open(path):
        d = json.loads(line)
        lat = d[latent_key]
        for lab, p in d["predictions"].items():
            ok = float(p[got_key] == p[want_key])
            (hit if lab == lat else keep)[lat].append(ok)
    return {lat: {"transfer_acc": float(np.mean(hit[lat])),
                  "retain_acc": (float(np.mean(keep[lat]))
                                 if keep[lat] else None),
                  "n": len(hit[lat])}
            for lat in sorted(hit)}


def controlled_stats(vdir):
    return _swap_stats(os.path.join(vdir, f"controlled_{DS}.csv"),
                       "transferred_latent", "output", "target")


def transfer_stats(vdir):
    return _swap_stats(os.path.join(vdir, f"transfer_{DS}.csv"),
                       "latent", "pred", "true")


def length_regression_stats(vdir):
    """Parse predict_ntokens_dev.txt (latent -> n_tokens R^2; reference
    scripts/helpers/predict_ntokens.py, paper Table 12): the single-space
    combination rows up to the per-dimension section."""
    path = os.path.join(vdir, f"predict_ntokens_{DS}.txt")
    if not os.path.exists(path):
        return None
    out = {}
    for line in open(path):
        if line.startswith("Per-dimension"):
            break
        parts = line.split()
        if len(parts) == 4 and parts[1] == "R^2" and parts[2] == "=":
            out[parts[0]] = float(parts[3])
    return out or None


def ppl_stats(vdir):
    path = os.path.join(vdir, "ppl_reconstructions.jsonl.ppl.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        d = json.load(f)
    return {"estimator": d.get("estimator"),
            "dev_original": d[DS]["original_ppl"],
            "dev_reconstruction": d[DS]["reconstruction_ppl"]}


def fmt(x, pat="{:.3f}"):
    return "--" if x is None else pat.format(x)


def main(argv=()):
    # argv defaults to () (not sys.argv) so tests that monkeypatch the
    # module globals can call main() directly.
    global OUTDIR, DS
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--outdir", default=OUTDIR,
                    help="study directory holding the per-variant "
                         "artifact subdirectories (summary written here)")
    ap.add_argument("--dataset", default=DS)
    args = ap.parse_args(argv)
    OUTDIR, DS = args.outdir, args.dataset

    table = {}
    for v in VARIANTS:
        vdir = os.path.join(OUTDIR, v)
        table[v] = {"consistency": consistency_stats(vdir),
                    "controlled_generation": controlled_stats(vdir),
                    "attribute_transfer": transfer_stats(vdir),
                    "perplexity": ppl_stats(vdir),
                    "length_regression": length_regression_stats(vdir)}

    with open(os.path.join(OUTDIR, "full_eval_summary.json"), "w") as f:
        json.dump(table, f, indent=2)

    labels = sorted({lab for t in table.values()
                     if t["consistency"] for lab in t["consistency"]
                     if lab != "self_bleu"})
    lines = ["# Five-variant full evaluation (dev split)", ""]

    lines += ["## Consistency (discriminator F1; reference "
              "consistency.py protocol)", ""]
    if not labels:
        lines += ["(no consistency artifacts yet)", ""]
    else:
        hdr = "| variant | " + " | ".join(
            f"{l} y~ŷ | {l} ŷ~ŷ′" for l in labels) + " | self-BLEU |"
        lines += [hdr, "|" + "---|" * (2 * len(labels) + 2)]
    for v in VARIANTS if labels else []:
        c = table[v]["consistency"]
        cells = []
        for l in labels:
            if c and l in c:
                cells.append(fmt(c[l].get("y~y_hat", {}).get("mean")))
                cells.append(fmt(c[l].get("y_hat~y_hat_prime",
                                          {}).get("mean")))
            else:
                cells += ["--", "--"]
        sb = (fmt(c["self_bleu"]["mean"]) if c and "self_bleu" in c
              else "--")
        lines.append(f"| {v} | " + " | ".join(cells) + f" | {sb} |")

    for fam, title in [("controlled_generation",
                        "Controlled generation (class-mean z swap; "
                        "transfer hits target / other label retained)"),
                       ("attribute_transfer",
                        "Attribute transfer (real-source z swap)")]:
        lines += ["", f"## {title}", ""]
        lats = sorted({lat for t in table.values()
                       if t[fam] for lat in t[fam]})
        if not lats:
            lines += [f"(no {fam} artifacts yet)"]
            continue
        hdr = "| variant | " + " | ".join(
            f"{l} transfer | {l} retain" for l in lats) + " |"
        lines += [hdr, "|" + "---|" * (2 * len(lats) + 1)]
        for v in VARIANTS:
            s = table[v][fam]
            cells = []
            for l in lats:
                if s and l in s:
                    cells.append(fmt(s[l]["transfer_acc"]))
                    cells.append(fmt(s[l]["retain_acc"]))
                else:
                    cells += ["--", "--"]
            lines.append(f"| {v} | " + " | ".join(cells) + " |")

    lines += ["", "## Perplexity (dev; KN3 fallback unless GPT-2 "
              "weights resolve)", "",
              "| variant | originals | reconstructions |", "|---|---|---|"]
    for v in VARIANTS:
        p = table[v]["perplexity"]
        lines.append(
            f"| {v} | {fmt(p and p['dev_original'], '{:.1f}')} | "
            f"{fmt(p and p['dev_reconstruction'], '{:.1f}')} |")

    lr_keys = sorted({k for v in VARIANTS
                      for k in (table[v]["length_regression"] or {})})
    if any(table[v]["length_regression"] for v in VARIANTS):
        lines += ["", "## Latent -> n_tokens regression (R^2; paper "
                  "Table 12 protocol)", "",
                  "| variant | " + " | ".join(lr_keys) + " |",
                  "|" + "---|" * (len(lr_keys) + 1)]
        for v in VARIANTS:
            lr = table[v]["length_regression"]
            lines.append("| " + v + " | " + " | ".join(
                fmt(lr.get(k) if lr else None) for k in lr_keys) + " |")

    md = "\n".join(lines) + "\n"
    with open(os.path.join(OUTDIR, "full_eval_summary.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    import sys
    main(sys.argv[1:])
