"""Experiment driver: config -> data -> fused steps -> artifacts.

Behavioral match for the reference runner (run.py:426-655): same CLI
semantics (`python run.py config.json [--verbose]`), same artifact contract
(SURVEY.md section 1), same epoch choreography (train -> train recon log ->
dev eval -> dev recon log -> checkpoint; KeyboardInterrupt keeps the latest
checkpoint; final validate/test passes).

TPU-first differences in the hot path:
  - one jitted train step per batch (all losses + all three optimizer
    groups fused; see training/step.py), batch-sharded over the 'data'
    mesh axis;
  - per-step host work is deferred: metrics/latents/predictions are
    collected as device arrays and transferred once per epoch, so the
    device never stalls on logging (the reference synced per batch --
    run.py:279-300);
  - the per-step cyclic KL weight is computed host-side into a tiny vector
    argument, so schedule changes never trigger recompilation.
"""

from __future__ import annotations

import datetime
import json
import logging
import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dvae_tpu.config import (build_model_config, flat_optimizer_enabled,
                             load_config)
from dvae_tpu.data import (BatchPipeline, DenoisingTextDataset,
                           RatioBatchSampler, ShuffleBatchSampler,
                           build_vocab, encode_labels, fit_label_codecs,
                           get_sentences_labels, load_vocab,
                           preprocess_sentences, reverse_sentences,
                           save_vocab)
from dvae_tpu.data.glove import get_embedding_matrix, load_glove
from dvae_tpu.data.pipeline import collate
from dvae_tpu.data.vocab import make_word2idx
from dvae_tpu.data.text import SOS, EOS, PAD, UNK
from dvae_tpu.models import forward, init_vae_params
from dvae_tpu.parallel import (make_mesh_plan, place_state, replicate,
                               shard_batch)
from dvae_tpu.training.checkpoint import (load_latest_checkpoint,
                                          save_checkpoint, wait_for_saves)
from dvae_tpu.training.logging import (LossLogger, ScalarWriter,
                                       append_reconstructions,
                                       log_latents_async, log_params,
                                       log_params_async,
                                       wait_for_metadata_writes)
from dvae_tpu.training.step import (create_train_state, kl_weight_vector,
                                    make_eval_epoch, make_eval_step,
                                    make_train_epoch, make_train_step)
from dvae_tpu.ops.device_bleu import bleu_from_counts
from dvae_tpu.utils import (enable_compilation_cache, set_seed,
                            tensor2text)
from dvae_tpu.losses import get_cyclic_kl_weight

# Single worker so prefetched epochs keep their order (the sampler RNG
# advances once per pipeline.epoch() call).
_prefetch_pool = ThreadPoolExecutor(max_workers=1,
                                    thread_name_prefix="epoch-prefetch")


class Experiment:
    """Everything a training/eval/inference session needs, built once from a
    config file. Reused by the driver, the REPL (inspect_model) and the
    model-reloading evaluation scripts."""

    def __init__(self, params: Dict, require_vocab_file: bool = False):
        self.params = params
        # before any jit: every session built from a config (driver, REPL,
        # eval scripts) shares the persistent XLA compilation cache
        enable_compilation_cache(
            params.get("compilation_cache_dir", "auto"))
        # before any key creation: "rbg" uses the TPU hardware RNG
        # (distribution-equal, bit-different draws; measured -22% device
        # step time at flagship scale -- the decode sampler's per-logit
        # threefry bits were the single largest op, RESULTS.md round 3)
        if params.get("prng_impl", "threefry") == "rbg":
            jax.config.update("jax_default_prng_impl", "rbg")
        set_seed(params["random_seed"])
        import random as _random
        self._shuffle_rng = _random.Random(params["random_seed"])

        self.logdir = os.path.join("logs", params["name"])
        os.makedirs(self.logdir, exist_ok=True)
        self.ckpt_dir = os.path.join(params["checkpoint_dir"],
                                     params["name"])
        os.makedirs(self.ckpt_dir, exist_ok=True)

        label_keys = [k for k in params["latent_dims"] if k != "total"]
        if params.get("combined_dataset"):
            label_keys = label_keys + ["source_dataset"]
        self.label_keys = label_keys

        # --- read the three splits (reference run.py:461-489) ---
        dd = params["data_dir"]
        self.splits: Dict[str, Dict] = {}
        train = self._read_split(os.path.join(dd, "train.jsonl"),
                                 N=params["num_train_examples"])
        self.splits["train"] = train
        for name in ("dev", "test"):
            p = os.path.join(dd, f"{name}.jsonl")
            if os.path.exists(p):
                self.splits[name] = self._read_split(p)

        # --- label codecs: fit on train, reused (fixes quirk #3) ---
        self.codecs = fit_label_codecs(train["labels"])

        # --- vocabulary (reference run.py:492-504) ---
        vocab_path = os.path.join(self.logdir, "vocab.txt")
        if params["train"] and not require_vocab_file:
            self.vocab = build_vocab(train["docs"])
            save_vocab(self.vocab, vocab_path)
        else:
            self.vocab = load_vocab(vocab_path)
        self.word2idx = make_word2idx(self.vocab)

        # --- input noising (reference run.py:506-513) ---
        for split in self.splits.values():
            split["noisy_docs"] = (reverse_sentences(split["docs"])
                                   if params["reverse_input"]
                                   else split["docs"])

        # --- GloVe (reference run.py:515-523) ---
        self.emb_matrix = None
        frozen = False
        if params["glove_path"]:
            glove, _ = load_glove(params["glove_path"])
            self.emb_matrix, self.word2idx = get_embedding_matrix(
                self.vocab, glove)
            frozen = True
        self.idx2word = {i: w for w, i in self.word2idx.items()}

        # --- datasets, padded to ONE global max length so the train step
        #     compiles exactly once (vs the reference's per-batch padding)
        max_len = params.get("max_sequence_length", -1)
        if max_len <= 0:
            max_len = max(len(d) for s in self.splits.values()
                          for d in s["docs"])
        self.max_length = max_len
        self.datasets: Dict[str, DenoisingTextDataset] = {}
        from dvae_tpu.data import native as _native
        use_native = _native.available()
        nv = _native.NativeVocab(self.vocab) if use_native else None
        for name, split in self.splits.items():
            if use_native:
                # fused C++ tokenize+encode: one pass, no Python tokens
                X, lengths = nv.encode(
                    split["sentences"], params["lowercase"],
                    self.word2idx[SOS], self.word2idx[EOS],
                    self.word2idx[UNK], self.word2idx[PAD], max_len)
                if params["reverse_input"]:
                    # reversal of the SOS/EOS-wrapped doc == flip each
                    # row's valid prefix (vae/data_utils.py:282-283)
                    noisy = np.zeros_like(X)
                    for i, L in enumerate(lengths):
                        noisy[i, :L] = X[i, :L][::-1]
                else:
                    noisy = X
                self.datasets[name] = DenoisingTextDataset.from_arrays(
                    noisy, X, lengths, split["labels"], split["ids"],
                    self.word2idx, self.codecs, max_len)
            else:
                self.datasets[name] = DenoisingTextDataset(
                    split["noisy_docs"], split["docs"], split["labels"],
                    split["ids"], self.word2idx, self.codecs,
                    max_length=max_len)

        # --- model ---
        self.cfg = build_model_config(
            params, len(self.vocab), self.datasets["train"].y_dims,
            sos_idx=self.word2idx[SOS], eos_idx=self.word2idx[EOS],
            max_length=max_len, frozen_embeddings=frozen)
        key = jax.random.PRNGKey(params["random_seed"])
        self.init_params, self.constants = init_vae_params(
            key, self.cfg, emb_matrix=self.emb_matrix)

        # --- mesh / sharding ---
        n_data = params.get("num_data_shards", 1)
        n_model = params.get("num_model_shards", 1)
        avail = len(jax.devices())
        if n_model < 1 or n_model > avail:
            raise ValueError(
                f"num_model_shards {n_model} needs at least that many "
                f"devices (have {avail})")
        if n_data <= 0 or n_data * n_model > avail:
            n_data = avail // n_model
        if params["batch_size"] % n_data != 0:
            raise ValueError(
                f"batch_size {params['batch_size']} not divisible by "
                f"data shards {n_data}")
        self.plan = make_mesh_plan(n_data=n_data, n_model=n_model)
        self.constants = replicate(self.plan, self.constants)

    def _read_split(self, path: str, N: int = -1) -> Dict:
        sents, labels, ids, counts = get_sentences_labels(
            path, label_keys=self.label_keys, N=N, shuffle=True,
            rng=self._shuffle_rng)
        lowercase = self.params["lowercase"]
        # Native (C++) tokenizer fast path; bit-identical to the Python
        # pipeline (tests/test_native.py), falls back if unbuilt.
        from dvae_tpu.data import native
        if native.available():
            docs = [[SOS] + toks + [EOS] for toks in
                    native.tokenize_corpus(sents, lowercase=lowercase)]
        else:
            docs = preprocess_sentences(sents, SOS, EOS,
                                        lowercase=lowercase)
        return {"sentences": sents, "labels": list(labels),
                "ids": list(ids), "counts": counts, "docs": docs}

    # ---- samplers / pipelines ----
    def train_pipeline(self) -> BatchPipeline:
        p = self.params
        ds = self.datasets["train"]
        if p["combined_dataset"]:
            sampler = RatioBatchSampler(
                self.splits["train"]["labels"], split_key="source_dataset",
                ratios=p["dataset_minibatch_ratios"] or None,
                batch_size=p["batch_size"], seed=p["random_seed"])
        else:
            sampler = ShuffleBatchSampler(len(ds), p["batch_size"],
                                          seed=p["random_seed"])
        return BatchPipeline(ds, sampler, p["batch_size"])

    def eval_pipeline(self, name: str) -> BatchPipeline:
        # One sampler instance per split, so its RNG advances and batch
        # composition reshuffles across epochs like the reference's
        # shuffle=True eval DataLoaders (run.py:536).
        if not hasattr(self, "_eval_samplers"):
            self._eval_samplers = {}
        if name not in self._eval_samplers:
            ds = self.datasets[name]
            self._eval_samplers[name] = ShuffleBatchSampler(
                len(ds), self.params["batch_size"],
                seed=self.params["random_seed"] + 1)
        return BatchPipeline(self.datasets[name], self._eval_samplers[name],
                             self.params["batch_size"])

    def device_batch(self, batch) -> Dict:
        arrays = {"noisy_X": batch.noisy_X, "X": batch.X,
                  "lengths": batch.lengths, "labels": batch.labels,
                  "example_mask": batch.example_mask}
        return shard_batch(self.plan, arrays)


def _epoch_host_logging(loss_logger: LossLogger, collected: List[Dict],
                        step0: int):
    """Replay per-step metrics into the logger after the one-shot device ->
    host transfer."""
    for i, metrics in enumerate(collected):
        loss_logger.update(metrics)
        loss_logger.log_step(step0 + i)


def _gather_latents(latents_steps: List[Dict], masks: List[np.ndarray]
                    ) -> Dict[str, Dict[str, np.ndarray]]:
    keep = np.concatenate([m.astype(bool) for m in masks])
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for lname in latents_steps[0]:
        slot = out.setdefault(lname, {})
        for pname in latents_steps[0][lname]:
            stacked = np.concatenate(
                [np.asarray(s[lname][pname]) for s in latents_steps])
            slot[pname] = stacked[keep]
    return out


def _summary_line(tag: str, epoch: int, logger: LossLogger,
                  adversarial: bool, mi: bool, extra: str = "") -> str:
    tl = logger.summarize("total_loss")
    rc = logger.summarize("reconstruction_loss")
    kl = logger.summarize("total_kl")
    ds = logger.summarize("total_dsc_loss")
    s = (f"{tag} ({epoch}) TOTAL: {tl[0]:.4f} +/- {tl[1]:.4f}"
         f" | RECON: {rc[0]:.4f} +/- {rc[1]:.4f}"
         f" | KL: {kl[0]:.4f} +/- {kl[1]:.4f}"
         f" | DISCRIM: {ds[0]:.4f} +/- {ds[1]:.4f}")
    if adversarial:
        av = logger.summarize("total_adv_loss")
        s += f" | ADVERSE: {av[0]:.4f} +/- {av[1]:.4f}"
    if mi:
        mi_ = logger.summarize("total_mi")
        s += f" | MI: {mi_[0]:.4f} +/- {mi_[1]:.4f}"
    return s + extra


def run(params_file: str, verbose: bool = False) -> None:
    """Train/validate/test per the config (reference run.py:426-655)."""
    params = load_config(params_file)
    if params.get("debug_nans"):
        # Correctness sanitizer, the jit-world analogue of the reference's
        # global torch.autograd.set_detect_anomaly(True) (run.py:22): every
        # jitted computation re-checks outputs for NaNs and fails loudly.
        jax.config.update("jax_debug_nans", True)
    exp = Experiment(params)
    cfg = exp.cfg
    keep_latents = max(0, params.get("keep_latent_epochs", 0))

    logfile = os.path.join(exp.logdir, "run.log")
    print(f"Logging to {logfile}")
    logging.basicConfig(filename=logfile, level=logging.INFO, force=True)
    now = datetime.datetime.now().strftime("%Y-%m-%d_%H:%M:%S")
    logging.info(f"START: {now}")
    logging.info("PARAMETERS:")
    for k, v in params.items():
        logging.info(f"  {k}: {v}")
    logging.info(f"Devices: {jax.devices()} | data shards: "
                 f"{exp.plan.n_data}")
    if params["train"]:
        logging.info("Train label counts:")
        for labname, values in exp.splits["train"]["counts"].items():
            logging.info(f"  {labname}: {dict(values)}")

    # jitted programs
    flat_opt = flat_optimizer_enabled(params)
    train_step = jax.jit(make_train_step(cfg, exp.constants,
                                         params["learn_rate"],
                                         flat=flat_opt),
                         donate_argnums=(0,))
    eval_step = jax.jit(make_eval_step(cfg, exp.constants))

    # Epoch programs come in a lean (metrics-only) and a full
    # (metrics+latents) variant: epochs whose latent metadata
    # `keep_latent_epochs` would immediately prune run the lean program
    # and skip the [S, B, dim] latent stacking + DMA entirely. Each
    # variant is jitted lazily so a run that never needs one never
    # compiles it.
    epoch_unroll = max(1, params.get("epoch_scan_unroll", 1))
    _train_epochs: Dict[bool, Any] = {}
    _eval_epochs: Dict[bool, Any] = {}

    def train_epoch_fn(collect_latents: bool):
        if collect_latents not in _train_epochs:
            _train_epochs[collect_latents] = jax.jit(
                make_train_epoch(cfg, exp.constants, params["learn_rate"],
                                 flat=flat_opt,
                                 collect_latents=collect_latents,
                                 unroll=epoch_unroll),
                donate_argnums=(0,))
        return _train_epochs[collect_latents]

    def eval_epoch_fn(collect_latents: bool):
        if collect_latents not in _eval_epochs:
            _eval_epochs[collect_latents] = jax.jit(
                make_eval_epoch(cfg, exp.constants,
                                collect_latents=collect_latents))
        return _eval_epochs[collect_latents]

    def _latents_kept(epoch: int, last_epoch: int) -> bool:
        """Will this epoch's latent-metadata files survive pruning? With
        keep_latent_epochs=K the final write prunes epochs <= last - K, so
        only the last K epochs are worth materializing. An unknown
        last_epoch (-1) conservatively collects."""
        return (keep_latents == 0 or last_epoch < 0
                or epoch > last_epoch - keep_latents)

    recon_fns = {}

    def recon_fn(train_mode: bool):
        if train_mode not in recon_fns:
            def f(state_params, noisy_X, lengths, seed):
                p = {"main": state_params["main"],
                     "adv": state_params["adv"],
                     "mi": state_params["mi"]}
                key = jax.random.fold_in(jax.random.PRNGKey(1234), seed)
                out = forward(p, exp.constants, cfg, noisy_X, lengths, key,
                              jnp.asarray(0.0), train=train_mode)
                return out["token_predictions"]
            recon_fns[train_mode] = jax.jit(f)
        return recon_fns[train_mode]

    def log_reconstructions(state, ds_name: str, epoch: int, n: int,
                            train_mode: bool):
        """Reference vae/utils.py:236-263: n random examples, tf_prob=0
        forward, append 'x' ==> 'recon' pairs. Dropout state follows the
        reference's (train mode right after a train epoch, eval otherwise).
        """
        ds = exp.datasets[ds_name]
        B = exp.params["batch_size"]
        idxs = np.random.choice(len(ds), size=min(n, len(ds)),
                                replace=False)
        pairs = []
        for c, lo in enumerate(range(0, len(idxs), B)):
            chunk = idxs[lo:lo + B]
            batch = collate(ds, chunk, B)
            db = exp.device_batch(batch)
            preds = np.asarray(recon_fn(train_mode)(
                state.params, db["noisy_X"], db["lengths"],
                jnp.asarray(epoch * 131 + c)))
            for row in range(len(chunk)):
                x_text = " ".join(tensor2text(batch.X[row], exp.idx2word,
                                              cfg.eos_idx))
                r_text = " ".join(tensor2text(preds[row], exp.idx2word,
                                              cfg.eos_idx))
                pairs.append((x_text, r_text))
        append_reconstructions(pairs, exp.logdir, ds_name, epoch)

    # training state (+ resume -- reference run.py:578-591)
    mi_lr = 3e-5 if cfg.mi_estimator == "club_sample" else 5e-4
    state = create_train_state(exp.init_params, params["learn_rate"],
                               params["random_seed"], mi_lr=mi_lr,
                               flat=flat_opt)
    state = place_state(exp.plan, state)
    state, start_epoch, ckpt_name = load_latest_checkpoint(
        state, exp.ckpt_dir)
    if ckpt_name is None:
        logging.warning("No checkpoint found!")
    else:
        logging.info(f"Loaded checkpoint '{ckpt_name}'")

    # config replay file (reference run.py:594-596)
    with open(os.path.join(exp.logdir,
                           f"config_epoch{start_epoch}.json"), "w") as f:
        json.dump(params, f, indent=2)

    writers = {}

    def writer(split: str) -> ScalarWriter:
        if split not in writers:
            writers[split] = ScalarWriter(
                os.path.join("runs", params["name"], split),
                use_tensorboard=params.get("log_tensorboard", True))
        return writers[split]

    # ---------------- epoch functions ----------------
    epoch_chunk = max(0, params.get("epoch_chunk_steps", 0))

    def _stack_train_epoch(pipeline, epoch: int, steps_per_epoch: int,
                           total_steps: int):
        """Collate, stack, and upload one training epoch's batches. Runs
        either inline (first epoch) or on the prefetch thread, overlapped
        with the previous epoch's device compute.

        Returns (host_batches, chunks, klw_seq) where chunks is a list of
        ("scan", sharded [C, B, ...] batches, [C, n] klw) /
        ("step", sharded [B, ...] batch, [n] klw) work items. Without
        epoch_chunk_steps there is exactly one scan item spanning the
        whole epoch (the monolithic program); with it, the scan items all
        share ONE compiled C-step program across corpora and the
        remainder reuses the per-step program."""
        from dvae_tpu.parallel import shard_stacked_batch, stack_batches
        host_batches = list(pipeline.epoch())
        S = len(host_batches)
        step0 = epoch * steps_per_epoch
        klw_seq = np.stack([
            kl_weight_vector(cfg, params["lambdas"],
                             float(get_cyclic_kl_weight(step0 + i,
                                                        total_steps)))
            for i in range(S)])
        C = epoch_chunk if 0 < epoch_chunk < S else S
        chunks = []
        for lo in range(0, S - S % C, C):
            dev = shard_stacked_batch(
                exp.plan, stack_batches(host_batches[lo:lo + C]))
            chunks.append(("scan", dev, klw_seq[lo:lo + C]))
        for i in range(S - S % C, S):
            chunks.append(("step", exp.device_batch(host_batches[i]),
                           klw_seq[i]))
        return host_batches, chunks, klw_seq

    prefetched: Dict[int, Any] = {}

    def _get_train_epoch_data(pipeline, epoch: int, steps_per_epoch: int,
                              total_steps: int, last_epoch: int):
        fut = prefetched.pop(epoch, None)
        data = fut.result() if fut is not None else _stack_train_epoch(
            pipeline, epoch, steps_per_epoch, total_steps)
        if epoch + 1 <= last_epoch and (epoch + 1) not in prefetched:
            prefetched[epoch + 1] = _prefetch_pool.submit(
                _stack_train_epoch, pipeline, epoch + 1, steps_per_epoch,
                total_steps)
        return data

    def trainstep_epoch_fused(state, epoch: int, pipeline,
                              steps_per_epoch: int, total_steps: int,
                              last_epoch: int = -1):
        """Whole-epoch lax.scan path (config `fused_epoch`, default): the
        host stacks the epoch's collated batches, uploads once, and gets
        every step's metrics/latents/predictions back in one call. Host
        work off the critical path: the next epoch's collate/stack/upload
        is prefetched on a worker thread, the latents transfer + metadata
        CSVs run in a background thread (log_latents_async), and scalar
        records drain through the ScalarWriter's worker."""
        t0 = time.time()
        phases = [("start", t0)]
        loss_logger = LossLogger(writer("train"), epoch)
        step0 = epoch * steps_per_epoch

        host_batches, chunks, klw_seq = _get_train_epoch_data(
            pipeline, epoch, steps_per_epoch, total_steps, last_epoch)
        S = len(host_batches)
        phases.append(("collate+upload", time.time()))
        # epochs whose metadata would be pruned run the lean program:
        # no latent scan outputs, no DMA (predictions are never an epoch
        # output at all -- BLEU comes from the 10-int per-step sufficient
        # statistics in metrics, ops/device_bleu.py)
        want_latents = _latents_kept(epoch, last_epoch)
        tf = jnp.asarray(params["teacher_forcing_prob"])
        miw = jnp.asarray(params["mi_loss_weight_train"])
        metric_parts, latent_parts = [], []
        for kind, dev, klw in chunks:
            if kind == "scan":
                state, m_seq, lat = train_epoch_fn(want_latents)(
                    state, dev, jnp.asarray(klw), tf, miw)
            else:
                state, m_seq, lat, _ = train_step(state, dev,
                                                  jnp.asarray(klw), tf, miw)
                if not want_latents:
                    lat = None
            metric_parts.append(m_seq)
            if want_latents:
                latent_parts.append(lat)
        jax.block_until_ready(metric_parts[-1]["total_loss"])
        phases.append(("compute", time.time()))
        # metrics first: they are tiny and on the critical path, and the
        # device link here serializes transfers -- kicking the ~150 MB
        # latents DMA first would queue the metrics behind it
        metric_parts = jax.device_get(metric_parts)
        phases.append(("metrics_fetch", time.time()))
        # now start the latents DMA; the background metadata thread
        # materializes it off the critical path
        if want_latents:
            jax.tree.map(lambda a: a.copy_to_host_async(), latent_parts)

        masks = [b.example_mask for b in host_batches]
        ids_all = [i for b in host_batches for i in b.ids]
        collected = []
        bleu_every = max(1, params.get("bleu_every_n_steps", 1))
        ae_every = max(1, params.get("ae_drift_every_n", 1))
        i = 0
        for (kind, _, _), m_part in zip(chunks, metric_parts):
            if kind == "scan":
                per_step = [jax.tree.map(lambda a, j=j: a[j], m_part)
                            for j in range(len(m_part["total_loss"]))]
            else:
                per_step = [dict(m_part)]
            for m in per_step:
                counts = m.pop("bleu_counts")
                m["kl_weights"] = {n: klw_seq[i][k] for k, n in
                                   enumerate(cfg.latent_names)}
                m["mi_loss_weight"] = params["mi_loss_weight_train"]
                if i % bleu_every == 0:
                    m["bleu"] = bleu_from_counts(counts)
                if (step0 + i) % ae_every != 0:
                    # the device lax.cond skipped the re-encode this step
                    # (config ae_drift_every_n); drop the 0.0 placeholder
                    # so step_*/avg_* only ever see computed values
                    m.pop("idv_ae", None)
                collected.append(m)
                i += 1
        phases.append(("bleu+scalars", time.time()))
        _epoch_host_logging(loss_logger, collected, step0)
        loss_logger.log_epoch()
        phases.append(("scalar_log", time.time()))
        if want_latents:
            log_latents_async(latent_parts, masks, ids_all, exp.logdir,
                              "train", epoch, keep_epochs=keep_latents)
        phases.append(("metadata_dispatch", time.time()))
        if params.get("log_epoch_phases"):
            spans = ", ".join(
                f"{name}={phases[i + 1][1] - phases[i][1]:.3f}s"
                for i, (name, _) in enumerate(phases[1:], 0))
            logging.info(f"Epoch phases: {spans}")
        dt = str(datetime.timedelta(seconds=time.time() - t0))
        logging.info(_summary_line(
            "TRAIN", epoch, loss_logger, cfg.adversarial_loss, cfg.mi_loss,
            extra=f" | Epoch time: {dt}"))
        return state

    def trainstep_epoch(state, epoch: int, pipeline, steps_per_epoch: int,
                        total_steps: int, last_epoch: int = -1):
        t0 = time.time()
        loss_logger = LossLogger(writer("train"), epoch)
        step0 = epoch * steps_per_epoch
        collected, latents_steps = [], []
        ids_all: List[str] = []
        masks = []
        profile_dir = params.get("profile_dir", "")
        step = step0
        for batch in pipeline.epoch():
            if profile_dir and step == step0 + 1 and epoch == 0:
                jax.profiler.start_trace(profile_dir)
            cyc = float(get_cyclic_kl_weight(step, total_steps))
            klw = kl_weight_vector(cfg, params["lambdas"], cyc)
            db = exp.device_batch(batch)
            state, metrics, latents, preds = train_step(
                state, db, jnp.asarray(klw),
                jnp.asarray(params["teacher_forcing_prob"]),
                jnp.asarray(params["mi_loss_weight_train"]))
            metrics["kl_weights"] = {
                n: klw[i] for i, n in enumerate(cfg.latent_names)}
            metrics["mi_loss_weight"] = params["mi_loss_weight_train"]
            collected.append(metrics)
            latents_steps.append(latents)
            ids_all.extend(batch.ids)
            masks.append(batch.example_mask)
            step += 1
            if verbose and (step - step0) % 10 == 0:
                print(f"EPOCH {epoch}: {step - step0}/{steps_per_epoch}",
                      flush=True)
            if profile_dir and epoch == 0 and \
                    step == step0 + 1 + params.get("profile_steps", 5):
                jax.block_until_ready(metrics["total_loss"])
                jax.profiler.stop_trace()
                logging.info(f"Profiler trace written to {profile_dir}")
            if step - step0 == 20 and not verbose:
                elapsed = time.time() - t0
                est = elapsed * steps_per_epoch / 20
                logging.info("Estimated epoch duration: "
                             f"{datetime.timedelta(seconds=est)}")

        # one-shot device -> host transfer, then replay logging
        # (predictions never leave the device; BLEU comes from the per-step
        # sufficient statistics)
        collected = jax.device_get(collected)
        latents_steps = jax.device_get(latents_steps)
        bleu_every = max(1, params.get("bleu_every_n_steps", 1))
        ae_every = max(1, params.get("ae_drift_every_n", 1))
        for i, m in enumerate(collected):
            counts = m.pop("bleu_counts")
            if i % bleu_every == 0:
                m["bleu"] = bleu_from_counts(counts)
            if (step0 + i) % ae_every != 0:
                m.pop("idv_ae", None)  # device cond skipped the re-encode
        _epoch_host_logging(loss_logger, collected, step0)
        loss_logger.log_epoch()
        log_params_async(_gather_latents(latents_steps, masks), ids_all,
                   exp.logdir, "train", epoch, keep_epochs=keep_latents)
        dt = str(datetime.timedelta(seconds=time.time() - t0))
        logging.info(_summary_line(
            "TRAIN", epoch, loss_logger, cfg.adversarial_loss, cfg.mi_loss,
            extra=f" | Epoch time: {dt}"))
        return state

    def evalstep_epoch(state, epoch: int, name: str = "dev",
                       want_latents: bool = True):
        from dvae_tpu.parallel import shard_stacked_batch, stack_batches
        loss_logger = LossLogger(writer(name), epoch)
        pipeline = exp.eval_pipeline(name)
        host_batches = list(pipeline.epoch())
        S = len(host_batches)
        klw = kl_weight_vector(cfg, params["lambdas"], 1.0)  # run.py:373-376
        stacked = stack_batches(host_batches)
        dev = shard_stacked_batch(exp.plan, stacked)
        metrics_seq, latents_seq = eval_epoch_fn(want_latents)(
            state, dev, jnp.asarray(klw),
            jnp.asarray(params["mi_loss_weight_eval"]),
            jnp.arange(S))
        metrics_seq = jax.device_get(metrics_seq)
        if want_latents:
            jax.tree.map(lambda a: a.copy_to_host_async(), latents_seq)
        masks = [b.example_mask for b in host_batches]
        ids_all = [i for b in host_batches for i in b.ids]
        for i in range(S):
            m = jax.tree.map(lambda a: a[i], metrics_seq)
            m["bleu"] = bleu_from_counts(m.pop("bleu_counts"))
            loss_logger.update(m)
        loss_logger.log_epoch()
        if want_latents:
            log_latents_async(latents_seq, masks, ids_all, exp.logdir, name,
                              epoch, keep_epochs=keep_latents)
        logging.info(_summary_line(
            name.upper(), epoch, loss_logger, cfg.adversarial_loss,
            cfg.mi_loss))

    def log_latents_snapshot(state, epoch: int, name: str):
        """Latents-only pass over a split (no loss logging): used after an
        interrupt when the lean fused epochs skipped this run's train
        latent metadata, so the offline eval suite (model_evals.py,
        plot_zs) still finds a final-epoch snapshot. Latents come from an
        eval-mode forward of the restored model rather than the
        during-training per-step params the uninterrupted path logs."""
        from dvae_tpu.parallel import shard_stacked_batch, stack_batches
        pipeline = exp.eval_pipeline(name)
        host_batches = list(pipeline.epoch())
        S = len(host_batches)
        klw = kl_weight_vector(cfg, params["lambdas"], 1.0)
        dev = shard_stacked_batch(exp.plan, stack_batches(host_batches))
        _, latents_seq = eval_epoch_fn(True)(
            state, dev, jnp.asarray(klw),
            jnp.asarray(params["mi_loss_weight_eval"]), jnp.arange(S))
        jax.tree.map(lambda a: a.copy_to_host_async(), latents_seq)
        masks = [b.example_mask for b in host_batches]
        ids_all = [i for b in host_batches for i in b.ids]
        log_latents_async(latents_seq, masks, ids_all, exp.logdir, name,
                          epoch, keep_epochs=keep_latents)

    # ---------------- main loop (reference run.py:598-651) ----------------
    if params["train"]:
        logging.info("TRAINING")
        logging.info("Ctrl-C to interrupt and keep most recent model.")
        pipeline = exp.train_pipeline()
        steps_per_epoch = len(pipeline)
        total_steps = params["epochs"] * steps_per_epoch
        logging.info(f"Training examples: {len(exp.datasets['train'])}")
        epoch_fn = (trainstep_epoch_fused
                    if params.get("fused_epoch", True) and not verbose
                    else trainstep_epoch)
        ckpt_every = max(1, params.get("checkpoint_every_n_epochs", 1))
        first_epoch = start_epoch
        last_epoch = start_epoch + params["epochs"] - 1
        for epoch in range(start_epoch, start_epoch + params["epochs"]):
            try:
                state = epoch_fn(state, epoch, pipeline,
                                 steps_per_epoch, total_steps, last_epoch)
                log_reconstructions(state, "train", epoch, n=20,
                                    train_mode=True)
                if params["validate"] and "dev" in exp.datasets:
                    evalstep_epoch(state, epoch, "dev",
                                   want_latents=_latents_kept(epoch,
                                                              last_epoch))
                    log_reconstructions(state, "dev", epoch, n=20,
                                        train_mode=False)
                if (epoch - first_epoch) % ckpt_every == 0 \
                        or epoch == last_epoch:
                    logging.info(
                        f"Saving model checkpoint to {exp.ckpt_dir}")
                    save_checkpoint(state, exp.ckpt_dir, epoch,
                                    keep=params.get("keep_checkpoints", 0))
                start_epoch = epoch
            except KeyboardInterrupt:
                logging.warning(f"Training interrupted at epoch {epoch}!")
                # The jitted epoch donates the input state; an interrupt
                # landing mid-call leaves `state` pointing at deleted
                # buffers. Restore the latest checkpoint so the "Ctrl-C
                # keeps the most recent model" contract (reference
                # run.py:634-651) holds for the final evals below.
                if any(leaf.is_deleted() for leaf in jax.tree.leaves(state)
                       if hasattr(leaf, "is_deleted")):
                    wait_for_saves()
                    fresh = place_state(exp.plan, create_train_state(
                        exp.init_params, params["learn_rate"],
                        params["random_seed"], mi_lr=mi_lr,
                        flat=flat_opt))
                    state, start_epoch, name = load_latest_checkpoint(
                        fresh, exp.ckpt_dir)
                    logging.warning(
                        "Interrupt landed inside the jitted epoch; "
                        f"restored checkpoint {name!r} for final evals.")
                if keep_latents > 0 and not _latents_kept(start_epoch,
                                                          last_epoch):
                    # the lean epochs skipped this run's train latents;
                    # leave a final-model snapshot for the offline suite
                    logging.info("Logging post-interrupt train-latent "
                                 f"snapshot at epoch {start_epoch}")
                    log_latents_snapshot(state, start_epoch, "train")
                break

    if params["validate"] and "dev" in exp.datasets:
        evalstep_epoch(state, start_epoch, "dev")
        log_reconstructions(state, "dev", start_epoch, n=30,
                            train_mode=False)
    if params["test"] and "test" in exp.datasets:
        evalstep_epoch(state, start_epoch, "test")
        log_reconstructions(state, "test", start_epoch, n=30,
                            train_mode=False)

    wait_for_saves()
    wait_for_metadata_writes()
    for w in writers.values():
        w.close()
    now = datetime.datetime.now().strftime("%Y-%m-%d_%H:%M:%S")
    logging.info(f"END: {now}")
