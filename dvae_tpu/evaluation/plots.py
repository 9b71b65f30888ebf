"""Latent-space plots (capability match for reference plot_zs.py and
plot_migs.py):
  plot_latents: histograms of 1-d supervised latents colored by label +
    t-SNE scatter of the content space.
  plot_migs: multi-model MIG boxplots + MI bar charts (paper figure 5).
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import List, Optional, Sequence

import numpy as np

from dvae_tpu.evaluation.metadata import (get_labels, get_last_epoch,
                                          latent_files, read_ordered_ids,
                                          sample_from_latent)


def plot_latents(metadata_dir: str, data_dir: str, data_split: str = "train",
                 epoch: int = -1, outfile: Optional[str] = None,
                 max_tsne: int = 2000, seed: int = 0):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import seaborn as sns
    from sklearn.manifold import TSNE

    if epoch == -1:
        epoch = get_last_epoch(os.path.join(metadata_dir, "z"))
    latent_names, _, mu_files, lv_files = latent_files(
        metadata_dir, data_split, epoch)
    ids = read_ordered_ids(metadata_dir, data_split, epoch)
    id2labels, labels_set = get_labels(data_dir, data_split, latent_names)
    Vs = {lab: np.array([id2labels[u].get(lab) for u in ids])
          for lab in labels_set}

    rng = np.random.default_rng(seed)
    panels = [n for n in latent_names if n != "content"]
    has_content = "content" in latent_names
    n_panels = len(panels) + (1 if has_content else 0)
    fig, axs = plt.subplots(1, max(n_panels, 1),
                            figsize=(4 * max(n_panels, 1), 4),
                            squeeze=False)
    col = 0
    for name, mf, lf in zip(latent_names, mu_files, lv_files):
        zs = sample_from_latent(np.loadtxt(mf, delimiter=","),
                                np.loadtxt(lf, delimiter=","), rng)
        if name == "content":
            continue
        ax = axs[0][col]
        labs = Vs.get(name)
        for val in sorted(set(labs.tolist())):
            sns.histplot(zs[labs == val].flatten(), ax=ax, label=str(val),
                         kde=True, stat="density", alpha=0.5)
        ax.set_title(f"z: {name}")
        ax.legend()
        col += 1
    if has_content:
        idx = latent_names.index("content")
        zs = sample_from_latent(
            np.loadtxt(mu_files[idx], delimiter=","),
            np.loadtxt(lv_files[idx], delimiter=","), rng)
        sel = rng.permutation(len(zs))[:max_tsne]
        perplexity = min(30.0, max(2.0, (len(sel) - 1) / 3))
        emb = TSNE(n_components=2, random_state=seed, init="random",
                   perplexity=perplexity).fit_transform(zs[sel])
        ax = axs[0][col]
        color_lab = sorted(labels_set)[0] if labels_set else None
        colors = Vs[color_lab][sel] if color_lab else None
        for val in sorted(set(colors.tolist())) if colors is not None \
                else [None]:
            m = colors == val if colors is not None else slice(None)
            ax.scatter(emb[m, 0], emb[m, 1], s=4, label=str(val))
        ax.set_title(f"t-SNE content (color: {color_lab})")
        ax.legend()
    fig.tight_layout()
    if outfile:
        fig.savefig(outfile, dpi=300)
    return fig


def plot_migs(mig_files: Sequence[str], outfile: str,
              model_names: Sequence[str]):
    """MIG boxplots + MI bars across models (reference plot_migs.py)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    assert len(mig_files) == len(model_names)
    mig_rows, mi_rows = [], []
    for path, model in zip(mig_files, model_names):
        for line in open(path):
            datum = json.loads(line)
            for lab, d in datum.items():
                if lab == "sample_num":
                    continue
                mig_rows.append({"model": model, "label": lab,
                                 "MIG": d["MIG"]})
                for ln, mi in zip(d["sorted_latents"], d["sorted_MIs"]):
                    mi_rows.append({"model": model, "label": lab,
                                    "latent": ln, "MI": mi})
    mig_df = pd.DataFrame(mig_rows)
    mi_df = pd.DataFrame(mi_rows)
    labels = sorted(mig_df.label.unique())
    fig, axs = plt.subplots(2, len(labels),
                            figsize=(5 * len(labels), 8), squeeze=False)
    for c, lab in enumerate(labels):
        sub = mig_df[mig_df.label == lab]
        sub.boxplot(column="MIG", by="model", ax=axs[0][c], rot=30)
        axs[0][c].set_title(f"MIG: {lab}")
        mi_sub = mi_df[mi_df.label == lab]
        means = mi_sub.groupby(["model", "latent"])["MI"].mean().unstack()
        errs = mi_sub.groupby(["model", "latent"])["MI"].std().unstack()
        means.plot.bar(ax=axs[1][c], yerr=errs, rot=30)
        axs[1][c].set_title(f"MI per latent: {lab}")
    fig.suptitle("")
    fig.tight_layout()
    fig.savefig(outfile, dpi=300)
    return fig
