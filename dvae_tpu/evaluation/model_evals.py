"""Model-reloading evaluations: consistency, controlled generation,
attribute transfer, reconstruction-for-PPL.

Capability match for reference scripts/evaluation/{consistency,
controlled_generation, attribute_transfer, compute_ppl}.py, rebuilt around
fused jitted programs: where the reference ran 2-3 separate torch forwards
per batch per resample (SURVEY.md section 3.5 flags this as the second
hottest path), each evaluation step here is ONE XLA program (forward ->
latent surgery -> free-running decode -> re-encode -> discriminator
predictions).

All of these feed CLEAN text as both input and target (the reference eval
scripts pass sents as both noisy and original -- consistency.py:100-102),
and load the latest checkpoint for the config.
"""

from __future__ import annotations

import csv
import json
import os
from collections import defaultdict
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dvae_tpu.config import load_config
from dvae_tpu.data.pipeline import collate
from dvae_tpu.data.sampler import ShuffleBatchSampler
from dvae_tpu.evaluation.metadata import read_ordered_ids
from dvae_tpu.models import (concat_z, forward, predict_from_logits, sample)
from dvae_tpu.training.checkpoint import load_latest_checkpoint
from dvae_tpu.training.driver import Experiment
from dvae_tpu.training.step import create_train_state
from dvae_tpu.utils import compute_bleu, tensor2text


class EvalSession:
    """Config + vocab + latest checkpoint + jitted eval programs."""

    def __init__(self, params_file: str):
        params = load_config(params_file)
        self.params = params
        self.exp = Experiment(params, require_vocab_file=True)
        self.cfg = self.exp.cfg
        from dvae_tpu.config import flat_optimizer_enabled
        state = create_train_state(self.exp.init_params,
                                   params["learn_rate"],
                                   params["random_seed"],
                                   flat=flat_optimizer_enabled(params))
        state, next_epoch, ckpt = load_latest_checkpoint(
            state, self.exp.ckpt_dir)
        if ckpt is None:
            raise OSError(f"No checkpoints found in {self.exp.ckpt_dir}")
        self.state = state
        self.last_epoch = next_epoch - 1
        self.ckpt_name = ckpt
        self._programs: Dict = {}
        self._base_key = jax.random.PRNGKey(params["random_seed"] + 7)

    # ---------- batching ----------
    def batches(self, dataset: str):
        ds = self.exp.datasets[dataset]
        B = self.params["batch_size"]
        sampler = ShuffleBatchSampler(len(ds), B, shuffle=False)
        for idxs in sampler.epoch_batches():
            yield collate(ds, idxs, B)

    def n_batches(self, dataset: str) -> int:
        return -(-len(self.exp.datasets[dataset])
                 // self.params["batch_size"])

    def text(self, token_rows: np.ndarray,
             strip_markers: bool = False) -> List[str]:
        """Token ids -> space-joined text. strip_markers drops the first
        and last token (SOS/EOS), the reference's compute_ppl convention
        (compute_ppl.py:196 `tensor2text(...)[1:-1]`)."""
        rows = [tensor2text(row, self.exp.idx2word, self.cfg.eos_idx)
                for row in np.asarray(token_rows)]
        if strip_markers:
            rows = [r[1:-1] for r in rows]
        return [" ".join(r) for r in rows]

    # ---------- fused programs ----------
    def consistency_program(self, num_resamples: int = 1):
        """forward (train-mode dropout+resampling, reference
        consistency.py:152) -> dsc preds -> re-encode the predictions with
        lengths inferred by counting EOS/PAD (consistency.py:186-190) ->
        dsc preds again. The resample axis is batched ON DEVICE via
        lax.scan (the reference looped 30 resamples x 2 forwards in Python,
        SURVEY.md hard-part #6): one XLA program per input batch returns
        [R, B(, T)]-stacked predictions."""
        key_ = ("consistency", num_resamples)
        if key_ in self._programs:
            return self._programs[key_]
        cfg, constants = self.cfg, self.exp.constants

        def one_resample(params, X, lengths, seed):
            key = jax.random.fold_in(self._base_key, seed)
            k1, k2 = jax.random.split(key)
            out = forward(params, constants, cfg, X, lengths, k1,
                          jnp.asarray(0.0), train=True)
            preds_x = {n: predict_from_logits(out["dsc_logits"][n])
                       for n in cfg.dsc_names}
            xhat = out["token_predictions"]
            cond = (xhat == cfg.eos_idx) | (xhat == cfg.pad_idx)
            lengths_hat = xhat.shape[1] - cond.sum(axis=1)
            out2 = forward(params, constants, cfg, xhat, lengths_hat, k2,
                           jnp.asarray(0.0), train=True)
            preds_hat = {n: predict_from_logits(out2["dsc_logits"][n])
                         for n in cfg.dsc_names}
            return preds_x, preds_hat, xhat

        def prog(params, X, lengths, base_seed):
            def body(_, r):
                return None, one_resample(params, X, lengths,
                                          base_seed + r)
            _, outs = jax.lax.scan(body, None,
                                   jnp.arange(num_resamples))
            return outs  # leaves stacked on the resample axis

        self._programs[key_] = jax.jit(prog)
        return self._programs[key_]

    def transfer_program(self, latent_name: str, from_source: bool):
        """Encode target (and optionally source) batch, swap one latent's z,
        free-running decode, re-encode with the ORIGINAL lengths (reference
        controlled_generation.py:105), return predictions."""
        key_ = (latent_name, from_source)
        if key_ in self._programs:
            return self._programs[key_]
        cfg, constants = self.cfg, self.exp.constants

        def prog(params, X, lengths, replacement_z, seed):
            key = jax.random.fold_in(self._base_key, seed)
            k1, k2, k3 = jax.random.split(key, 3)
            out = forward(params, constants, cfg, X, lengths, k1,
                          jnp.asarray(0.0), train=False)
            zs = {n: out["latent_params"][n].z for n in cfg.latent_names}
            zs[latent_name] = replacement_z.reshape(zs[latent_name].shape)
            z = jnp.concatenate([zs[n] for n in cfg.latent_names], axis=-1)
            trans = sample(params["main"], constants, cfg, z, k2,
                           max_length=X.shape[1], train=False)
            xhat = trans["token_predictions"]
            out2 = forward(params, constants, cfg, xhat, lengths, k3,
                           jnp.asarray(0.0), train=False)
            preds = {n: predict_from_logits(out2["dsc_logits"][n])
                     for n in cfg.dsc_names}
            return xhat, preds

        def prog_src(params, X, lengths, srcX, src_lengths, seed):
            key = jax.random.fold_in(self._base_key, seed)
            k0, krest = jax.random.split(key)
            src_out = forward(params, constants, cfg, srcX, src_lengths,
                              k0, jnp.asarray(0.0), train=False)
            src_z = src_out["latent_params"][latent_name].z
            return prog(params, X, lengths, src_z, seed + 1)

        self._programs[key_] = jax.jit(prog_src if from_source else prog)
        return self._programs[key_]

    def reconstruct_program(self):
        if "reconstruct" in self._programs:
            return self._programs["reconstruct"]
        cfg, constants = self.cfg, self.exp.constants

        def prog(params, X, lengths, seed):
            key = jax.random.fold_in(self._base_key, seed)
            out = forward(params, constants, cfg, X, lengths, key,
                          jnp.asarray(0.0), train=False)
            return out["token_predictions"]

        self._programs["reconstruct"] = jax.jit(prog)
        return self._programs["reconstruct"]


# =====================================================================
#  Consistency & self-BLEU (reference consistency.py)
# =====================================================================

def compute_consistency(params_file: str, outdir: str, dataset: str,
                        num_resamples: int = 30,
                        verbose: bool = False) -> None:
    from sklearn.metrics import precision_recall_fscore_support

    session = EvalSession(params_file)
    cfg = session.cfg
    prog = session.consistency_program(num_resamples)

    true_labels = defaultdict(list)
    latent_predictions = defaultdict(
        lambda: [[] for _ in range(num_resamples)])
    latent_predictions_hat = defaultdict(
        lambda: [[] for _ in range(num_resamples)])
    bleus = [[] for _ in range(num_resamples)]

    for bi, batch in enumerate(session.batches(dataset)):
        keep = batch.example_mask.astype(bool)
        for name in cfg.dsc_names:
            true_labels[name].extend(batch.labels[name][keep].tolist())
        # all resamples in one device call; leaves come back [R, B(, T)]
        preds_x, preds_hat, xhat = jax.device_get(prog(
            session.state.params, jnp.asarray(batch.X),
            jnp.asarray(batch.lengths), jnp.asarray(bi * 10007)))
        for r in range(num_resamples):
            for name in cfg.dsc_names:
                latent_predictions[name][r].extend(
                    np.asarray(preds_x[name][r])[keep].tolist())
                latent_predictions_hat[name][r].extend(
                    np.asarray(preds_hat[name][r])[keep].tolist())
            bleus[r].append(compute_bleu(batch.X[keep],
                                         np.asarray(xhat[r])[keep],
                                         session.exp.idx2word,
                                         cfg.eos_idx))
        if verbose:
            print(f"{bi + 1}/{session.n_batches(dataset)}", flush=True)

    results = []
    for name in cfg.dsc_names:
        trues = np.array(true_labels[name])
        preds = np.array(latent_predictions[name])
        preds_hat = np.array(latent_predictions_hat[name])
        for r in range(num_resamples):
            for true_tag, pred_tag, a, b in [
                    ("y", "y_hat", trues, preds[r]),
                    ("y", "y_hat_prime", trues, preds_hat[r]),
                    ("y_hat", "y_hat_prime", preds[r], preds_hat[r])]:
                p, rc, f, _ = precision_recall_fscore_support(
                    a, b, average="macro", zero_division=0)
                results.append([r, name, true_tag, pred_tag, p, rc, f])

    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir,
                           f"decoder_predictions_{dataset}.csv"), "w") as f:
        w = csv.writer(f, delimiter=",")
        w.writerow(["batch", "sample_num", "label", "true", "pred",
                    "precision", "recall", "F1"])
        for i, row in enumerate(results):
            w.writerow([i] + row)
    with open(os.path.join(outdir, f"self_bleus_{dataset}.csv"), "w") as f:
        w = csv.writer(f, delimiter=",")
        w.writerow(["batch", "sample_num", "BLEU"])
        for r, sample_bleus in enumerate(bleus):
            for b, val in enumerate(sample_bleus):
                w.writerow([b, r, val])


def summarize_consistency(outdir: str, dataset: str):
    import pandas as pd
    df = pd.read_csv(os.path.join(outdir,
                                  f"decoder_predictions_{dataset}.csv"))
    summ = df.groupby(["label", "true", "pred"])[
        ["precision", "recall", "F1"]].agg(["mean", "std"])
    print(summ.to_string())
    bleu_path = os.path.join(outdir, f"self_bleus_{dataset}.csv")
    if os.path.exists(bleu_path):
        bdf = pd.read_csv(bleu_path)
        print(f"\nself-BLEU: {bdf.BLEU.mean():.4f} +/- {bdf.BLEU.std():.4f}")
    return summ


# =====================================================================
#  Controlled generation (reference controlled_generation.py)
# =====================================================================

def get_mean_z_per_label(session: EvalSession, epoch: int
                         ) -> Dict[str, Dict[int, np.ndarray]]:
    """Mean z per (latent, encoded label value) from train metadata logs
    (reference controlled_generation.py:262-282)."""
    metadata_dir = os.path.join(session.exp.logdir, "metadata")
    ids = read_ordered_ids(metadata_dir, "train", epoch)
    id2lab = dict(zip(session.exp.splits["train"]["ids"],
                      session.exp.splits["train"]["labels"]))
    ordered_labs = [id2lab[u] for u in ids]
    mean_zs: Dict[str, Dict[int, np.ndarray]] = defaultdict(dict)
    for latent_name in session.cfg.dsc_names:
        zfile = os.path.join(metadata_dir, "z",
                             f"train_{latent_name}_{epoch}.log")
        zs = np.loadtxt(zfile, delimiter=",")
        if zs.ndim == 1:
            zs = zs[:, None]
        codec = session.exp.codecs[latent_name]
        for val in codec.classes:
            mask = np.array([lab[latent_name] == val
                             for lab in ordered_labs])
            enc = int(codec.transform([val])[0])
            mean_zs[latent_name][enc] = zs[mask].mean(axis=0)
    return dict(mean_zs)


def compute_controlled_generation(params_file: str, outfile: str,
                                  dataset: str,
                                  verbose: bool = False) -> None:
    session = EvalSession(params_file)
    cfg = session.cfg
    mean_zs = get_mean_z_per_label(session, session.last_epoch)
    codecs = session.exp.codecs
    results = []
    for bi, batch in enumerate(session.batches(dataset)):
        keep = batch.example_mask.astype(bool)
        X = jnp.asarray(batch.X)
        lengths = jnp.asarray(batch.lengths)
        trg_texts = session.text(batch.X)
        for latent_name in cfg.dsc_names:
            # target class: binary flip as in the reference (cg.py:79);
            # multi-class labels (the reference never had any, but CE
            # heads support them) cycle to (y+1) % n_classes so every
            # row still targets a class different from its own
            ys = batch.labels[latent_name]
            n_cls = codecs[latent_name].num_classes
            opposite = (np.abs(ys - 1) if n_cls == 2
                        else (ys + 1) % n_cls).astype(int)
            opp_z = np.stack([mean_zs[latent_name][int(y)]
                              for y in opposite]).astype(np.float32)
            prog = session.transfer_program(latent_name, from_source=False)
            xhat, preds = prog(session.state.params, X, lengths,
                               jnp.asarray(opp_z), jnp.asarray(bi))
            trns_texts = session.text(np.asarray(xhat))
            preds = {n: np.asarray(v) for n, v in preds.items()}
            for j in np.where(keep)[0]:
                pred_data = {}
                for name in cfg.dsc_names:
                    true = (int(opposite[j]) if name == latent_name
                            else int(batch.labels[name][j]))
                    pred_data[name] = {
                        "target": codecs[name].inverse_transform(
                            [true])[0],
                        "output": codecs[name].inverse_transform(
                            [int(preds[name][j])])[0]}
                results.append({"transferred_latent": latent_name,
                                "input": trg_texts[j],
                                "output": trns_texts[j],
                                "predictions": pred_data})
        if verbose:
            print(f"{bi + 1}/{session.n_batches(dataset)}", flush=True)
    with open(outfile, "w") as f:
        for row in results:
            json.dump(row, f, default=str)
            f.write("\n")


def summarize_controlled_generation(outfile: str) -> None:
    import warnings

    from sklearn.metrics import (accuracy_score,
                                 precision_recall_fscore_support)
    results = [json.loads(line) for line in open(outfile)]
    predictions = defaultdict(lambda: defaultdict(list))
    for result in results:
        latent = result["transferred_latent"]
        for label_type, pr in result["predictions"].items():
            predictions[latent][label_type].append(
                (pr["target"], pr["output"]))
    for trns_latent, by_label in predictions.items():
        print(f"   Transfering {trns_latent}")
        print("~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~")
        print("|    Prediction      |   P   |   R   |   F   |  Acc  |")
        print("|----------------------------------------------------|")
        for label_type, pairs in by_label.items():
            y = np.array([p[0] for p in pairs])
            y_hat = np.array([p[1] for p in pairs])
            # reference prints two rows (its labels were all binary);
            # multi-class labels get one row per class
            classes = sorted(set(y) | set(y_hat))
            accs = []
            for cl in classes:
                idxs = np.where(y == cl)
                accs.append(accuracy_score(y[idxs], y_hat[idxs])
                            if len(idxs[0]) else float("nan"))
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                ps, rs, fs, _ = precision_recall_fscore_support(
                    y, y_hat, average=None, labels=classes)
            for p, r, f, a, cl in zip(ps, rs, fs, accs, classes):
                lab = (f"{label_type}->{cl}" if label_type == trns_latent
                       else f"{label_type}_{cl}")
                print(f"|{str(lab):^20}|{p:^7.3f}|{r:^7.3f}"
                      f"|{f:^7.3f}|{a:^7.3f}|")
        print("------------------------------------------------------\n")


# =====================================================================
#  Attribute transfer (reference attribute_transfer.py)
# =====================================================================

def compute_attribute_transfer(params_file: str, outfile: str, dataset: str,
                               seed: int = 0,
                               verbose: bool = False) -> None:
    session = EvalSession(params_file)
    cfg = session.cfg
    ds = session.exp.datasets[dataset]
    rng = np.random.default_rng(seed)
    # label values per example for source sampling
    enc_labels = {n: ds.Y[n] for n in cfg.dsc_names}

    results = []
    for bi, batch in enumerate(session.batches(dataset)):
        keep = batch.example_mask.astype(bool)
        X = jnp.asarray(batch.X)
        lengths = jnp.asarray(batch.lengths)
        trg_texts = session.text(batch.X)
        B = X.shape[0]
        for latent_name in cfg.dsc_names:
            # sample, per row, a source example with a DIFFERENT label value
            ys = batch.labels[latent_name]
            src_rows = np.empty(B, np.int64)
            for j in range(B):
                pool = np.where(enc_labels[latent_name] != ys[j])[0]
                src_rows[j] = rng.choice(pool)
            src_batch = collate(ds, src_rows, B)
            prog = session.transfer_program(latent_name, from_source=True)
            xhat, preds = prog(session.state.params, X, lengths,
                               jnp.asarray(src_batch.X),
                               jnp.asarray(src_batch.lengths),
                               jnp.asarray(bi * 31 + 1))
            src_texts = session.text(src_batch.X)
            trns_texts = session.text(np.asarray(xhat))
            preds = {n: np.asarray(v) for n, v in preds.items()}
            for j in np.where(keep)[0]:
                pred_data = {}
                for name in cfg.dsc_names:
                    true = (int(src_batch.labels[name][j])
                            if name == latent_name
                            else int(batch.labels[name][j]))
                    pred_data[name] = {"true": true,
                                       "pred": int(preds[name][j])}
                results.append({"latent": latent_name,
                                "target": trg_texts[j],
                                "source": src_texts[j],
                                "transferred": trns_texts[j],
                                "predictions": pred_data})
        if verbose:
            print(f"{bi + 1}/{session.n_batches(dataset)}", flush=True)
    with open(outfile, "w") as f:
        for row in results:
            json.dump(row, f)
            f.write("\n")


def summarize_attribute_transfer(outfile: str) -> None:
    results = [json.loads(line) for line in open(outfile)]
    predictions = defaultdict(lambda: defaultdict(list))
    for result in results:
        latent = result["latent"]
        for label_type, pr in result["predictions"].items():
            true, pred = pr["true"], pr["pred"]
            if label_type == latent:
                label_type = f"{label_type}: {true}->{abs(1 - true)}"
            else:
                label_type = f"{label_type}: {true}"
            predictions[latent][label_type].append(true == pred)
    for trns_latent, by_label in predictions.items():
        print(f"   Transfering {trns_latent}")
        print(" ~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~")
        print("|    Prediction      |  Accuracy  |")
        print("|---------------------------------|")
        for label_type, oks in by_label.items():
            acc = sum(oks) / len(oks)
            print(f"|{label_type:^20}|{acc:^12.4f}|")
        print(" --------------------------------- \n")


# =====================================================================
#  Reconstruction + GPT-2 perplexity (reference compute_ppl.py)
# =====================================================================

def reconstruct_all_splits(params_file: str, N: int = -1,
                           verbose: bool = False
                           ) -> Dict[str, Dict[str, str]]:
    """Reconstruct every split; returns {split: {example_id: recon_text}}.

    Keyed by id because the Experiment's datasets are seed-shuffled while
    compute_ppl reads the corpus in file order -- pairing positionally
    would mismatch sentences and reconstructions (a quirk the reference's
    compute_ppl shares; fixed here)."""
    session = EvalSession(params_file)
    prog = session.reconstruct_program()
    out: Dict[str, Dict[str, str]] = {}
    for dataset in session.exp.datasets:
        by_id: Dict[str, str] = {}
        for bi, batch in enumerate(session.batches(dataset)):
            keep = batch.example_mask.astype(bool)
            preds = np.asarray(prog(session.state.params,
                                    jnp.asarray(batch.X),
                                    jnp.asarray(batch.lengths),
                                    jnp.asarray(bi)))
            texts = np.array(session.text(
                preds, strip_markers=True))[keep].tolist()
            for uid, text in zip(batch.ids, texts):
                by_id[uid] = text
        out[dataset] = by_id
    return out


def gpt2_ppl(sentences: List[str], stride: int = 512,
             verbose: bool = False) -> float:
    """GPT-2 sliding-window perplexity (reference compute_ppl.py:70-95).
    Requires the HF gpt2 weights to be available locally (no egress)."""
    from dvae_tpu.evaluation.ppl import gpt2_ppl as _gpt2_ppl
    return _gpt2_ppl(sentences, stride=stride)


def compute_ppl(params_file: str, data_dir: str, logfile: str, N: int = -1,
                verbose: bool = False, ngram_order: int = 2,
                fallback: str = "kn3") -> None:
    """Originals-vs-reconstructions perplexity (reference
    compute_ppl.py:109-204). GPT-2 availability is probed UP FRONT (no
    network); when the weights are absent a fallback LM trained on the
    train-split originals scores both sides instead, so the run always
    produces a PPL(orig) vs PPL(recon) table:
      - fallback="kn3" (default): interpolated Kneser-Ney trigram --
        meaningful held-out probabilities (evaluation/ppl.KneserNeyLM);
      - fallback="floor": the reference's own floor-bigram helper model
        (ngram_ppl.py semantics; held-out numbers are floor-dominated,
        kept for parity).
    Reconstructions are saved to `logfile` and the numeric results to
    `logfile`.ppl.json either way."""
    from dvae_tpu.evaluation.ppl import gpt2_available

    use_gpt2 = gpt2_available()
    if not use_gpt2:
        desc = ("Kneser-Ney trigram" if fallback == "kn3"
                else f"floor {ngram_order}-gram")
        print(f"WARNING: local GPT-2 weights not found; falling back to "
              f"the {desc} LM perplexity (trained on train-split "
              "originals).")

    # (id, sentence) in file order; reconstructions paired by id
    data: Dict[str, List] = {}
    for name in ("train", "dev", "test"):
        path = os.path.join(data_dir, f"{name}.jsonl")
        if os.path.exists(path):
            rows = [json.loads(line) for line in open(path)]
            data[name] = [(r["id"], r["sentence"]) for r in rows]
    recon_by_id = reconstruct_all_splits(params_file, verbose=verbose)
    pairs: Dict[str, List] = {}
    for name, rows in data.items():
        limit = N if N > 0 else len(rows)
        pairs[name] = [(sent, recon_by_id[name][uid])
                       for uid, sent in rows[:limit]
                       if uid in recon_by_id[name]]

    results: Dict[str, Dict] = {"estimator": "gpt2" if use_gpt2
                                else ("kn3" if fallback == "kn3"
                                      else f"{ngram_order}-gram")}
    if use_gpt2:
        for name, ps in pairs.items():
            ppl = gpt2_ppl([p[0] for p in ps])
            rppl = gpt2_ppl([p[1] for p in ps])
            print(f"{name}: {ppl:.4f}")
            print(f"    recon: {rppl:.4f}")
            results[name] = {"original_ppl": ppl,
                             "reconstruction_ppl": rppl}
    else:
        train_sents = [sent for _, sent in data.get("train", [])]
        _fallback_report(train_sents, pairs, ngram_order, fallback,
                         results)

    with open(logfile, "w") as f:
        for name, ps in pairs.items():
            for sent, rec in ps:
                json.dump({"dataset": name, "sentence": sent,
                           "reconstruction": rec}, f)
                f.write("\n")
    with open(logfile + ".ppl.json", "w") as f:
        json.dump(results, f, indent=2)


def _fallback_report(train_sents, pairs, ngram_order, fallback, results):
    """Fit the n-gram fallback LM, print the per-split orig/recon PPL
    table, and merge rows into `results` -- the block compute_ppl and
    rescore_ppl share (one definition so the printed/written contract
    cannot diverge)."""
    from dvae_tpu.evaluation.ppl import kn_ppl_report, ngram_ppl_report
    report = (kn_ppl_report(train_sents, pairs) if fallback == "kn3"
              else ngram_ppl_report(train_sents, pairs, n=ngram_order))
    for name, row in report.items():
        print(f"{name}: {row['original_ppl']:.4f} "
              f"(UNK={row['original_unk']})")
        print(f"    recon: {row['reconstruction_ppl']:.4f} "
              f"(UNK={row['reconstruction_unk']})")
        results[name] = row
    return results


def rescore_ppl(data_dir: str, logfile: str, ngram_order: int = 2,
                fallback: str = "kn3") -> Dict[str, Dict]:
    """Re-score a SAVED originals-vs-reconstructions log (the jsonl that
    compute_ppl writes) under a different fallback estimator, without
    loading the model or touching the accelerator. Train-split originals
    for LM fitting come from `data_dir`/train.jsonl. Writes
    `logfile`.ppl.json (same contract as compute_ppl) and returns the
    results dict."""
    pairs: Dict[str, List] = {}
    for line in open(logfile):
        row = json.loads(line)
        pairs.setdefault(row["dataset"], []).append(
            (row["sentence"], row["reconstruction"]))
    train_path = os.path.join(data_dir, "train.jsonl")
    train_sents = [json.loads(line)["sentence"] for line in open(train_path)]
    results: Dict[str, Dict] = {
        "estimator": "kn3" if fallback == "kn3" else f"{ngram_order}-gram"}
    _fallback_report(train_sents, pairs, ngram_order, fallback, results)
    with open(logfile + ".ppl.json", "w") as f:
        json.dump(results, f, indent=2)
    return results
