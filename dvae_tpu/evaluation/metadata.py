"""Shared helpers for the offline evaluation suite.

Operates purely on the training artifacts (metadata CSV logs + corpus
jsonl), so it matches the reference's eval-layer contract
(scripts/evaluation/disentanglement.py:70-176) with numpy in place of
torch.distributions.

NOTE on the sampling convention: metadata logvar files hold tanh-bounded
logvar where the model's sampling std is exp(logvar) (model.py:392, quirk
#2). The reference eval resamples z ~ Normal(mu, scale=exp(logvar))
(disentanglement.py:226-235), which we reproduce exactly.
"""

from __future__ import annotations

import json
import os
import re
from collections import Counter, defaultdict
from glob import glob
from typing import Dict, List, Sequence, Tuple

import numpy as np
from sklearn.feature_selection import mutual_info_classif
from sklearn.linear_model import LogisticRegression
from sklearn.metrics import precision_recall_fscore_support
from sklearn.preprocessing import StandardScaler


def get_last_epoch(directory: str) -> int:
    files = os.listdir(directory)
    epochs = {int(re.findall(r".*_([0-9]+)\.log", f)[0]) for f in files}
    return max(epochs)


def get_latent_names(filenames: Sequence[str]) -> List[str]:
    return [re.findall(r".*?_(\w+)_[0-9]+.log", f)[0] for f in filenames]


def latent_files(metadata_dir: str, dataset: str, epoch: int):
    """(latent_names, z_files, mu_files, logvar_files) for one epoch."""
    z_files = sorted(glob(os.path.join(metadata_dir, "z",
                                       f"{dataset}_*_{epoch}.log")))
    mu_files = sorted(glob(os.path.join(metadata_dir, "mu",
                                        f"{dataset}_*_{epoch}.log")))
    lv_files = sorted(glob(os.path.join(metadata_dir, "logvar",
                                        f"{dataset}_*_{epoch}.log")))
    return get_latent_names(z_files), z_files, mu_files, lv_files


def read_ordered_ids(metadata_dir: str, dataset: str,
                     epoch: int) -> List[str]:
    path = os.path.join(metadata_dir, "ordered_ids",
                        f"{dataset}_{epoch}.log")
    return [line.strip() for line in open(path)]


def get_labels(data_dir: str, dataset: str,
               latent_names: Sequence[str]) -> Tuple[Dict, set]:
    """{id: {label: value}} restricted to supervised latents."""
    path = os.path.join(data_dir, f"{dataset}.jsonl")
    id2labels = {}
    labels_set: set = set()
    with open(path) as f:
        for line in f:
            datum = json.loads(line)
            labs = {k: v for k, v in datum.items() if k in latent_names}
            id2labels[datum["id"]] = labs
            labels_set.update(labs.keys())
    return id2labels, labels_set


def sample_from_latent(mus: np.ndarray, logvars: np.ndarray,
                       rng: np.random.Generator = None) -> np.ndarray:
    """Resample z from logged (mu, logvar), reproducing the reference
    evaluators' DIMENSION-DEPENDENT convention exactly
    (disentanglement.py:226-235, invariance.py:205-212, plot_zs.py):

      1-D latent:    D.Normal(mu, logvar.exp())            -> SCALE
                     = exp(logvar)  (model quirk #2's convention)
      multi-dim:     D.MultivariateNormal(mu,
                     diag(logvar.exp()))                   -> COVARIANCE
                     = exp(logvar), i.e. scale = exp(logvar / 2)

    The two conventions disagree (found round 4 as the root cause of the
    content-MI crosscheck discrepancy: with trained logvars < 0 a uniform
    scale=exp(logvar) under-disperses multi-dim content z, inflating its
    MI by ~0.03 nats); parity with the reference's numbers requires
    matching both branches, quirk included."""
    if rng is None:
        rng = np.random.default_rng()
    mus = np.asarray(mus, np.float32)
    lvs = np.asarray(logvars, np.float32)
    scales = np.exp(lvs) if mus.ndim == 1 else np.exp(0.5 * lvs)
    return rng.normal(mus, scales).astype(np.float32)


def train_lr(id2z: Dict, label_name: str, id2labels: Dict,
             random_state: int = 0):
    """Logistic-regression probe: macro P/R/F of predicting a label from one
    latent (reference disentanglement.py:179-192)."""
    ordered_ids = list(id2z.keys())
    np.random.shuffle(ordered_ids)
    V = np.array([id2labels[u][label_name] for u in ordered_ids])
    Z = np.array([id2z[u] for u in ordered_ids])
    if Z.ndim == 1:
        Z = Z[:, None]
    Z = StandardScaler().fit_transform(Z)
    clf = LogisticRegression(random_state=random_state,
                             class_weight="balanced",
                             C=np.inf).fit(Z, V)
    preds = clf.predict(Z)
    return clf, precision_recall_fscore_support(V, preds, average="macro")


def compute_entropy_freq(xs, mean: bool = True) -> float:
    xs = np.array(xs)
    counts = Counter(xs.tolist())
    probs = np.array([counts[x] / len(xs) for x in xs])
    if mean:
        probs = [np.mean(probs[xs == x]) for x in set(xs.tolist())]
    else:
        probs = probs / probs.sum()
    return float(-np.sum(probs * np.log(probs)))


def compute_mi(zs: np.ndarray, vs, discrete_z: bool = False) -> float:
    if zs.ndim == 1:
        zs = zs.reshape(-1, 1)
    return float(mutual_info_classif(zs, vs,
                                     discrete_features=discrete_z).sum())


def compute_migs(mi_dict: Dict[str, Dict[str, float]],
                 Hvs: Dict[str, float]) -> Dict:
    """MIG per label: (top MI - runner-up MI) / H(label)
    (reference disentanglement.py:273-291)."""
    migs = defaultdict(dict)
    for lab_name, by_latent in mi_dict.items():
        pairs = sorted(((mi, ln) for ln, mi in by_latent.items()),
                       reverse=True)
        sorted_mis = [p[0] for p in pairs]
        sorted_names = [p[1] for p in pairs]
        Hv = Hvs[lab_name]
        migs[lab_name] = {
            "sorted_latents": sorted_names,
            "MIG": (sorted_mis[0] - sorted_mis[1]) / Hv,
            "sorted_MIs": sorted_mis,
            "label_entropy": Hv,
        }
    return dict(migs)
