"""Invariance analysis: does a supervised latent move when OTHER labels
vary? (Capability match for reference scripts/evaluation/invariance.py.)

For each supervised latent (the static label) and each other label (the
varied label), resample z from the logged (mu, logvar) and report the mean/
std of z within each (static value, varied value) cell, the absolute
differences across varied values, and a KDE grid plot.
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Optional

import numpy as np

from dvae_tpu.evaluation.metadata import (get_labels, get_last_epoch,
                                          latent_files, read_ordered_ids,
                                          sample_from_latent)


def compute(metadata_dir: str, data_dir: str, data_split: str,
            num_resamples: int = 10, epoch: int = -1,
            seed: Optional[int] = None, plot_path: Optional[str] = None):
    import pandas as pd
    if epoch == -1:
        epoch = get_last_epoch(os.path.join(metadata_dir, "z"))
    latent_names, _, mu_files, lv_files = latent_files(
        metadata_dir, data_split, epoch)
    ids = read_ordered_ids(metadata_dir, data_split, epoch)
    id2labels, labels_set = get_labels(data_dir, data_split, latent_names)
    if len(labels_set) <= 1:
        raise ValueError(
            "This analysis requires at least two generative factors")

    Vs = defaultdict(list)
    for uuid in ids:
        for lab_name, val in id2labels[uuid].items():
            Vs[lab_name].append(val)

    rng = np.random.default_rng(seed)
    rows = []
    zs_log: dict = defaultdict(dict)
    loaded = [(n, np.loadtxt(m, delimiter=","), np.loadtxt(l, delimiter=","))
              for n, m, l in zip(latent_names, mu_files, lv_files)]
    for i in range(num_resamples):
        for latent_name, mus, lvs in loaded:
            static_label = latent_name
            if static_label == "content":
                continue
            for vary_label in labels_set:
                if vary_label == static_label:
                    continue
                zs = sample_from_latent(mus, lvs, rng)
                for static_val in set(Vs[static_label]):
                    static_mask = np.array(Vs[static_label]) == static_val
                    for vary_val in set(Vs[vary_label]):
                        vary_mask = np.array(Vs[vary_label]) == vary_val
                        cell = zs[np.logical_and(static_mask, vary_mask)]
                        zs_log[static_val].setdefault(vary_label, {})[
                            vary_val] = cell
                        rows.append([i, latent_name, static_label,
                                     static_val, vary_label, vary_val,
                                     cell.mean(), cell.std()])
    df = pd.DataFrame(rows, columns=[
        "sample_num", "latent", "static_label", "static_label_val",
        "vary_label", "vary_label_val", "z_mean", "z_std"])
    summarize(df)
    if plot_path:
        make_plot(zs_log, plot_path)
    return df


def summarize(df) -> None:
    grouped = df.groupby(["latent", "static_label", "static_label_val",
                          "vary_label", "vary_label_val"])[
        ["z_mean", "z_std"]].mean()
    diffs = grouped.groupby(["latent", "static_label", "static_label_val",
                             "vary_label"]).diff()
    diffs = diffs.droplevel("vary_label_val").dropna(
        axis=0, how="all").abs()
    diffs.columns = ["z_mean_diff", "z_std_diff"]
    print(diffs)


def make_plot(zs_log: dict, plot_path: str) -> None:
    """KDE grid: one panel per (static value, varied label), one curve per
    varied value (reference invariance.py:115-174)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import seaborn as sns

    statics = list(zs_log.keys())
    n_rows = len(statics)
    n_cols = max(len(v) for v in zs_log.values())
    fig, axs = plt.subplots(n_rows, n_cols,
                            figsize=(4 * n_cols, 3 * n_rows),
                            squeeze=False)
    for r, static_val in enumerate(statics):
        for c, (vary_label, by_val) in enumerate(zs_log[static_val].items()):
            ax = axs[r][c]
            for vary_val, cell in by_val.items():
                if len(np.atleast_1d(cell)) > 1:
                    sns.kdeplot(np.asarray(cell).flatten(), ax=ax,
                                label=str(vary_val))
            ax.set_title(f"static={static_val} | vary={vary_label}")
            ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(plot_path, dpi=300)
