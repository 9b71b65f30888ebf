"""Disentanglement (MIG) evaluation over logged latent metadata.

Capability match for reference scripts/evaluation/disentanglement.py:
  compute: for each of num_resamples, resample z ~ N(mu, exp(logvar)) from
    the metadata logs, fit a logistic-regression probe per (latent, label)
    (macro P/R/F), estimate MI(z; label) with sklearn, and append MIG rows
    to MIGS_{dataset}.jsonl + probe scores to predictions_{dataset}.csv.
  summarize: aggregate tables + boxplots into outdir/plots/.
  oracle tests: synthetic z/label pairs with known MI structure.
"""

from __future__ import annotations

import csv
import json
import os
from collections import defaultdict
from typing import Optional

import numpy as np

from dvae_tpu.evaluation.metadata import (compute_entropy_freq, compute_mi,
                                          compute_migs, get_labels,
                                          get_last_epoch, latent_files,
                                          read_ordered_ids,
                                          sample_from_latent, train_lr)


def compute(metadata_dir: str, data_dir: str, dataset: str, outdir: str,
            epoch: int = -1, num_resamples: int = 10,
            seed: Optional[int] = None, progress: bool = False) -> None:
    os.makedirs(outdir, exist_ok=True)
    if epoch == -1:
        epoch = get_last_epoch(os.path.join(metadata_dir, "z"))
    latent_names, z_files, mu_files, lv_files = latent_files(
        metadata_dir, dataset, epoch)
    ids = read_ordered_ids(metadata_dir, dataset, epoch)
    id2labels, labels_set = get_labels(data_dir, dataset, latent_names)

    Vs = defaultdict(list)
    for uuid in ids:
        for lab_name, val in id2labels[uuid].items():
            Vs[lab_name].append(val)

    migs_outfile = os.path.join(outdir, f"MIGS_{dataset}.jsonl")
    preds_outfile = os.path.join(outdir, f"predictions_{dataset}.csv")
    rng = np.random.default_rng(seed)
    # load each latent's (mu, logvar) once; resample cheaply per round
    loaded = []
    for latent_name, zf, mf, lf in zip(latent_names, z_files, mu_files,
                                       lv_files):
        mus = np.loadtxt(mf, delimiter=",")
        lvs = np.loadtxt(lf, delimiter=",")
        loaded.append((latent_name, mus, lvs))

    Hvs = {}
    for i in range(num_resamples):
        if progress:
            print(f"resample {i + 1}/{num_resamples}", flush=True)
        mis = defaultdict(dict)
        pred_results = []
        for latent_name, mus, lvs in loaded:
            for lab_name in labels_set:
                # fresh z per (latent, label) pair, matching the
                # reference's resampling protocol exactly
                # (disentanglement.py:117-124)
                zs = sample_from_latent(mus, lvs, rng)
                id2z = dict(zip(ids, zs))
                _, (p, r, f, _) = train_lr(id2z, lab_name, id2labels,
                                           random_state=i)
                pred_results.append([i, latent_name, lab_name, p, r, f])
                if lab_name not in Hvs:
                    Hvs[lab_name] = compute_entropy_freq(Vs[lab_name])
                mis[lab_name][latent_name] = compute_mi(zs, Vs[lab_name])
        migs = compute_migs(mis, Hvs)
        with open(migs_outfile, "a") as f:
            migs["sample_num"] = i
            json.dump(migs, f)
            f.write("\n")
        with open(preds_outfile, "a") as f:
            w = csv.writer(f, delimiter=",")
            if i == 0:
                w.writerow(["sample_num", "latent_name", "label_name",
                            "precision", "recall", "F1"])
            for line in pred_results:
                w.writerow(line)


def summarize(dataset: str, outdir: str):
    """Aggregate MIG/MI/probe tables; save boxplots to outdir/plots/."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    plot_dir = os.path.join(outdir, "plots")
    os.makedirs(plot_dir, exist_ok=True)
    migs_data = [json.loads(line) for line in
                 open(os.path.join(outdir, f"MIGS_{dataset}.jsonl"))]

    migs = defaultdict(list)
    mis_rows = []
    for i, datum in enumerate(migs_data):
        for label_name, d in datum.items():
            if label_name == "sample_num":
                continue
            migs[label_name].append(d["MIG"])
            for latent_name, latent_mi in zip(d["sorted_latents"],
                                              d["sorted_MIs"]):
                mis_rows.append({"sample_num": i, "label_name": label_name,
                                 "latent_name": latent_name,
                                 "MI": latent_mi})

    fig, axs = plt.subplots(1, 2, figsize=[8, 6])
    mi_df = pd.DataFrame(mis_rows)
    print("======== MIs ========")
    print(mi_df.groupby(["label_name", "latent_name"])["MI"].agg(
        ["mean", "std"]).to_string())
    print()
    mi_df.boxplot(column=["MI"], by=["label_name", "latent_name"],
                  ax=axs[0], rot=60)
    axs[0].set_title("MI per (label, latent) pair")

    migs_df = pd.DataFrame(migs)
    print("======== MIGs ========")
    summ = migs_df.agg(["mean", "std", "size"]).T.reset_index()
    summ.columns = ["latent", "mean", "sd", "N"]
    print(summ.to_string())
    print()
    migs_df.boxplot(column=sorted(migs_df.columns), ax=axs[1])
    axs[1].set_title("MIGs")
    fig.tight_layout()
    for ext in ("png", "pdf"):
        fig.savefig(os.path.join(plot_dir,
                                 f"disentanglement_{dataset}.{ext}"),
                    dpi=300)

    preds_path = os.path.join(outdir, f"predictions_{dataset}.csv")
    if os.path.exists(preds_path):
        preds_df = pd.read_csv(preds_path)
        print("=== Predictive Performance ===")
        print(preds_df.groupby(["latent_name", "label_name"])[
            ["precision", "recall", "F1"]].agg(["mean", "std"]).to_string())
        fig2, axs2 = plt.subplots(
            1, max(preds_df.latent_name.nunique(), 1), figsize=[10, 4],
            squeeze=False)
        for i, latent_name in enumerate(
                sorted(preds_df.latent_name.unique())):
            df = preds_df[preds_df.latent_name == latent_name]
            means = df.groupby("label_name")[
                ["precision", "recall", "F1"]].mean()
            errs = df.groupby("label_name")[
                ["precision", "recall", "F1"]].std()
            means.plot.bar(ax=axs2[0][i], yerr=errs, ylim=(0.2, 1.0), rot=0)
            axs2[0][i].set_title(f"Latent: {latent_name}")
        fig2.tight_layout()
        for ext in ("png", "pdf"):
            fig2.savefig(os.path.join(plot_dir,
                                      f"predictions_{dataset}.{ext}"),
                         dpi=300)
    return migs_df


# -------- synthetic oracle tests (reference disentanglement.py:298-401) ----

def _report(zs, vs, discrete_z):
    from sklearn.linear_model import LogisticRegression
    clf = LogisticRegression(random_state=10, class_weight="balanced",
                             C=np.inf).fit(zs, vs)
    acc = clf.score(zs, vs)
    Hv = compute_entropy_freq(vs)
    mi = compute_mi(zs, vs, discrete_z=discrete_z)
    print("LR accuracy: ", acc)
    print("H[v]: ", Hv)
    print("MI: ", mi)
    return acc, Hv, mi


def test_random(N, K, n_features=1):
    """Independent z, labels: MI should be ~0, accuracy ~chance."""
    zs = np.random.randn(N, n_features)
    if K < 2:
        raise ValueError("K must be >1")
    if K == 2:
        vs = np.random.binomial(1, 0.5, size=N)
    else:
        vs = np.random.dirichlet([0.5] * K, size=N).argmax(axis=1)
    return _report(zs, vs, discrete_z=False)


def _thresholded(N, K, n_features, noise_frac=0.0):
    zs = np.random.uniform(-K, K, size=(N, n_features))
    z0 = zs[:, 0]
    step = (z0.max() - z0.min()) / K
    thresholds = [z0.min() + step * (i + 1) for i in range(K)]
    thresholds[-1] = z0.max()
    vs = np.array([next(i for i in range(K) if z <= thresholds[i])
                   for z in z0])
    if noise_frac > 0:
        idxs = np.random.randint(0, len(vs), size=int(N * noise_frac))
        vs[idxs] = np.random.randint(0, K, size=int(N * noise_frac))
    return zs, vs


def test_kinda_predictive(N, K, n_features=1):
    zs, vs = _thresholded(N, K, n_features, noise_frac=0.2)
    return _report(zs, vs, discrete_z=False)


def test_predictive(N, K, n_features=1):
    zs, vs = _thresholded(N, K, n_features)
    return _report(zs, vs, discrete_z=False)


def test_bijective(N, K, predictive=False):
    vs = np.random.randint(0, K, size=N)
    zs = vs if predictive else np.random.randint(0, K, size=N)
    return _report(zs.reshape(-1, 1), vs, discrete_z=True)


def test_bijective_oracle(N, K, n_features=1, predictive=False):
    """Exact-count entropy oracle: MI = H[z] + H[v] - H[v,z]."""
    import pandas as pd
    vs = np.random.randint(0, K, size=N)
    if predictive:
        zs = vs.reshape(-1, 1).repeat(n_features, axis=1)
    else:
        zs = np.random.randint(0, K, size=(N, n_features))

    def H_oracle(arr):
        probs = pd.DataFrame(arr).value_counts().div(len(arr))
        return float(-np.sum(probs.values * np.log(probs.values)))

    Hz = H_oracle(zs)
    Hv = H_oracle(vs)
    joint = np.concatenate((zs, vs.reshape(-1, 1)), axis=1)
    df = pd.DataFrame(joint)
    probs = df.groupby(list(df.columns)).size().div(len(df))
    Hvz = float(-np.sum(probs.values * np.log(probs.values)))
    mi = Hv + Hz - Hvz
    print("H[z]: ", Hz)
    print("H[v]: ", Hv)
    print("H[v,z]: ", Hvz)
    print("MI = H[z] + H[v] - H[v,z]: ", mi)
    return Hz, Hv, Hvz, mi
