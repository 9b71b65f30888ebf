"""Summarize the round-2 multi-seed uncertainty study (VERDICT next #5).

Reads MIGS_dev.jsonl for the baseline cyclic models (seeds 10/20/30) and
the pos_weight=10 variants (same seeds), prints per-seed dedicated-latent
vs content MI for each label plus MIG mean/std across resamples, counts in
how many seeds the dedicated uncertainty latent wins its MI race, and
renders the paper-protocol multi-model MIG boxplot via plot_migs
(reference scripts/evaluation/plot_migs.py:68-115).

Usage: python scripts/experiments/summarize_uncertainty_study.py
"""

import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..")))

BASE = "logs"
MODELS = [
    ("baseline", 10, "combined/sfu_conceptnet/vae_cyclic"),
    ("baseline", 20, "combined/sfu_conceptnet/vae_cyclic_s20"),
    ("baseline", 30, "combined/sfu_conceptnet/vae_cyclic_s30"),
    ("posw10", 10, "combined/sfu_conceptnet/vae_cyclic_uposw"),
    ("posw10", 20, "combined/sfu_conceptnet/vae_cyclic_uposw_s20"),
    ("posw10", 30, "combined/sfu_conceptnet/vae_cyclic_uposw_s30"),
    # round-2 bf16 ("auto" compute) reruns of the same protocol
    ("bf16-baseline", 10, "vae_cyclic_bf16"),
    ("bf16-posw10", 10, "bf16_uposw_s10"),
    ("bf16-posw10", 20, "bf16_uposw_s20"),
    ("bf16-posw10", 30, "bf16_uposw_s30"),
    # round-3 widening to >=5 bf16 seeds (VERDICT r2 next #7)
    ("bf16-posw10", 40, "bf16_uposw_s40"),
    ("bf16-posw10", 50, "bf16_uposw_s50"),
]


def load_migs(model_dir):
    # evaluation_r2 holds round-2 recomputes of round-1 models (current
    # resampling protocol); prefer it over the stale round-1 outputs
    path = os.path.join(BASE, model_dir, "evaluation_r2", "MIGS_dev.jsonl")
    if not os.path.exists(path):
        path = os.path.join(BASE, model_dir, "evaluation", "MIGS_dev.jsonl")
    if not os.path.exists(path):
        return None
    rows = [json.loads(line) for line in open(path)]
    out = defaultdict(lambda: defaultdict(list))
    for row in rows:
        for label, entry in row.items():
            if label == "sample_num":
                continue
            out[label]["MIG"].append(entry["MIG"])
            for name, mi in zip(entry["sorted_latents"],
                                entry["sorted_MIs"]):
                out[label][f"MI:{name}"].append(mi)
    return out, path


def main():
    rows = []
    found_paths = {}
    for variant, seed, model_dir in MODELS:
        loaded = load_migs(model_dir)
        if loaded is None:
            print(f"[missing] {model_dir}")
            continue
        migs, path = loaded
        found_paths[f"{variant}_s{seed}"] = path
        for label in sorted(migs):
            m = migs[label]
            ded = np.mean(m[f"MI:{label}"])
            others = [np.mean(v) for k, v in m.items()
                      if k.startswith("MI:") and k != f"MI:{label}"]
            rows.append({
                "variant": variant, "seed": seed, "label": label,
                "MI_dedicated": ded,
                "MI_content": np.mean(m.get("MI:content", [np.nan])),
                "MI_best_other": max(others),
                "wins": ded > max(others),
                "MIG_mean": np.mean(m["MIG"]),
                "MIG_std": np.std(m["MIG"]),
            })

    hdr = (f"{'variant':<10}{'seed':<6}{'label':<13}{'MI(ded)':>9}"
           f"{'MI(cont)':>10}{'MI(best-oth)':>13}{'wins':>6}"
           f"{'MIG':>14}")
    print(hdr)
    for r in rows:
        print(f"{r['variant']:<10}{r['seed']:<6}{r['label']:<13}"
              f"{r['MI_dedicated']:>9.4f}{r['MI_content']:>10.4f}"
              f"{r['MI_best_other']:>13.4f}{str(r['wins']):>6}"
              f"{r['MIG_mean']:>8.3f}±{r['MIG_std']:<5.3f}")

    for variant in ("baseline", "posw10", "bf16-baseline",
                    "bf16-posw10"):
        for label in ("polarity", "uncertainty"):
            vs = [r for r in rows
                  if r["variant"] == variant and r["label"] == label]
            if vs:
                wins = sum(r["wins"] for r in vs)
                migs_ = [r["MIG_mean"] for r in vs]
                print(f"{variant}/{label}: dedicated latent wins MI in "
                      f"{wins}/{len(vs)} seeds; MIG across seeds "
                      f"{np.mean(migs_):.3f}±{np.std(migs_):.3f}")

    if len(found_paths) >= 2:
        from dvae_tpu.evaluation.plots import plot_migs
        out = "evaluation_results/uncertainty_study_migs.png"
        os.makedirs("evaluation_results", exist_ok=True)
        names = list(found_paths)
        plot_migs([found_paths[n] for n in names], out, names)
        print(f"boxplot -> {out}")

    with open("evaluation_results/uncertainty_study.json", "w") as f:
        json.dump(rows, f, indent=2, default=float)
    print("table -> evaluation_results/uncertainty_study.json")


if __name__ == "__main__":
    main()
