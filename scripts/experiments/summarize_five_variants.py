"""Summarize the 5-variant flagship reproduction sweep (the paper's
central experiment -- reference README.md:61-113): per-variant dev MIG
mean +/- std per label, the Figure-5-style comparison boxplot via
plot_migs, and a JSON table. Run after scripts/experiments/
round3_five_variants.sh (or /tmp/run_sweep.sh) has produced
logs/combined/sfu_amazon_100k/<variant>/evaluation/MIGS_dev.jsonl.
"""

import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..")))

import numpy as np

VARIANTS = ["vae_inf", "vae_elbo", "vae_adv", "vae_mi", "vae_adv+mi"]
# Defaults reproduce the flagship study; --base/--outdir/--seeds point
# the same aggregation at another corpus (e.g. the dSentences study).
SEED_SUFFIXES = ["", "_s20", "_s30"]  # "" = each config's shipped seed
BASE = "logs/combined/sfu_amazon_100k"
OUTDIR = "evaluation_results/five_variant_study"


def _accumulate(path, per_label):
    for line in open(path):
        datum = json.loads(line)
        for lab, d in datum.items():
            if lab == "sample_num":
                continue
            e = per_label.setdefault(lab, {"migs": [], "aligned": 0,
                                           "n": 0})
            e["migs"].append(d["MIG"])
            e["n"] += 1
            # MIG is top-2-gap and does not care WHICH latent is
            # top; a variant can "win" MIG by collapsing all label
            # info into content. Track whether the designated latent
            # actually carries the most MI.
            if d["sorted_latents"][0] == lab:
                e["aligned"] += 1


def main(argv=None):
    global BASE, OUTDIR, SEED_SUFFIXES
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default=BASE)
    ap.add_argument("--outdir", default=OUTDIR)
    ap.add_argument("--seeds", nargs="*", default=SEED_SUFFIXES,
                    help='seed dir suffixes; "" = the shipped seed')
    args = ap.parse_args(argv)
    BASE, OUTDIR, SEED_SUFFIXES = args.base, args.outdir, args.seeds

    os.makedirs(OUTDIR, exist_ok=True)
    # guard the REQUESTED seed suffixes, not the bare base paths: a
    # seed-only invocation (--seeds _s20 _s30) must not demand the
    # unseeded dirs, and a base-only layout must not satisfy a seed run
    missing = [v for v in VARIANTS
               if not any(os.path.exists(
                   f"{BASE}/{v}{suf}/evaluation/MIGS_dev.jsonl")
                   for suf in SEED_SUFFIXES)]
    if missing:
        raise SystemExit(
            f"no MIG files for variants {missing} under {BASE} "
            f"(seed suffixes {SEED_SUFFIXES})")

    table = {}
    seed_table = {}
    for v in VARIANTS:
        # seed-pooled aggregate: every (seed x resample) MIG draw
        per_label = {}
        seeds_used = []
        per_seed_means = {}
        for suf in SEED_SUFFIXES:
            p = f"{BASE}/{v}{suf}/evaluation/MIGS_dev.jsonl"
            if not os.path.exists(p):
                continue
            seeds_used.append(suf or "base")
            one = {}
            _accumulate(p, one)
            for lab, e in one.items():
                per_seed_means.setdefault(lab, []).append(
                    float(np.mean(e["migs"])))
                tot = per_label.setdefault(lab, {"migs": [], "aligned": 0,
                                                 "n": 0})
                tot["migs"].extend(e["migs"])
                tot["aligned"] += e["aligned"]
                tot["n"] += e["n"]
        table[v] = {lab: {"mig_mean": float(np.mean(e["migs"])),
                          "mig_std": float(np.std(e["migs"])),
                          "aligned_top_frac": e["aligned"] / e["n"],
                          "n": e["n"]}
                    for lab, e in per_label.items()}
        seed_table[v] = {"seeds": seeds_used,
                         "per_seed_mig_means": per_seed_means}

    with open(os.path.join(OUTDIR, "five_variant_migs.json"), "w") as f:
        json.dump({"pooled": table, "by_seed": seed_table}, f, indent=2)

    # union across variants: a label missing from one variant's MIGS file
    # (e.g. a dataset lacking it) prints as "--" instead of KeyError-ing
    labels = sorted({lab for t in table.values() for lab in t})
    print(f"{'variant':12s} " +
          "  ".join(f"{l + ' (MIG, aligned-top)':>34s}" for l in labels))
    for v in VARIANTS:
        row = "  ".join(
            (f"{table[v][l]['mig_mean']:.4f} +/- "
             f"{table[v][l]['mig_std']:.4f}  "
             f"{table[v][l]['aligned_top_frac']:.0%}")
            if l in table[v] else f"{'--':>34s}" for l in labels)
        print(f"{v:12s} {row}")

    # boxplot over the seed-pooled draws: one combined JSONL per variant
    import tempfile
    pooled_files = []
    tmpdir = tempfile.mkdtemp(prefix="fv_pooled_")
    for v in VARIANTS:
        p = os.path.join(tmpdir, f"{v}.jsonl")
        with open(p, "w") as out:
            for suf in SEED_SUFFIXES:
                src = f"{BASE}/{v}{suf}/evaluation/MIGS_dev.jsonl"
                if os.path.exists(src):
                    out.write(open(src).read())
        pooled_files.append(p)
    from dvae_tpu.evaluation.plots import plot_migs
    plot_migs(pooled_files, os.path.join(OUTDIR, "five_variant_migs.png"),
              VARIANTS)
    print(f"wrote {OUTDIR}/five_variant_migs.{{json,png}}")


if __name__ == "__main__":
    main()
