"""Experiment configuration: schema, validation, loading.

Public contract matches the reference's flat-JSON config exactly
(reference: vae/utils.py:48-88, README.md:115-127) so that
reproduction_configs/*.json run unchanged. Unknown keys warn, missing or
mistyped keys raise ValueError.

Extensions (all optional, warn-free, default to reference behavior):
  - "compute_dtype": "float32" | "bfloat16" | "auto" -- matmul compute
    dtype on TPU. "auto" picks by measurement (benchmarks/dtype_evidence.py
    + RESULTS.md): float32 when the recurrence runs in the Pallas kernel
    (internally f32, so bf16 only adds boundary casts), bfloat16 for the
    lax.scan backend (where pre-cast bf16 weights win at flagship scale).
  - "num_data_shards": int                   -- size of the `data` mesh axis.
  - "num_model_shards": int                  -- size of the `model` mesh axis
    (tensor parallelism of the vocab-sized decoder projection; see
    OPTIONAL_SCHEMA below and parallel/mesh.py).
  - "vocab_pad_multiple": int                -- pad the projection's vocab
    dim (e.g. 128 for MXU lanes); padding rows are inert.
  - "deterministic_eval_z": bool             -- if true, fixes reference quirk
    #1 (eval z was always stochastic, model.py:391-395). Default false
    (preserve reference behavior; MIG protocol depends on stochastic z).
  - "mi_loss_weight_train" / "mi_loss_weight_eval": float -- reference
    hardcodes 0.01 / 1.0 (run.py:238-239, 378). Same defaults here.
"""

from __future__ import annotations

import json
import math
import warnings
from dataclasses import dataclass, field
from typing import Any, Dict, Tuple


# Typed schema of required keys. Mirrors reference vae/utils.py:49-77.
REQUIRED_SCHEMA: Dict[str, type] = {
    "name": str,
    "random_seed": int,
    "data_dir": str,
    "combined_dataset": bool,
    "dataset_minibatch_ratios": dict,
    "checkpoint_dir": str,
    "glove_path": str,
    "num_train_examples": int,
    "lowercase": bool,
    "reverse_input": bool,
    "embedding_dim": int,
    "hidden_dim": int,
    "num_rnn_layers": int,
    "bidirectional_encoder": bool,
    "bow_encoder": bool,
    "latent_dims": dict,
    "epochs": int,
    "batch_size": int,
    "learn_rate": float,
    "encoder_dropout": float,
    "decoder_dropout": float,
    "teacher_forcing_prob": float,
    "lambdas": dict,
    "adversarial_loss": bool,
    "mi_loss": bool,
    "train": bool,
    "validate": bool,
    "test": bool,
}

# Optional extension keys (TPU build). Values are (type, default).
OPTIONAL_SCHEMA: Dict[str, Tuple[type, Any]] = {
    "compute_dtype": (str, "float32"),
    "num_data_shards": (int, 1),
    # Size of the `model` mesh axis: tensor parallelism for the vocab-sized
    # decoder output projection (w sharded P('model', None), b P('model');
    # XLA GSPMD inserts the logsumexp/sampling collectives). The projection
    # is padded to a vocab multiple of lcm(num_model_shards,
    # vocab_pad_multiple) with -1e9 bias rows: exactly zero probability,
    # exactly zero gradient, so results match the unpadded model.
    "num_model_shards": (int, 1),
    # Pad the output-projection vocab dimension to a multiple of this.
    # Padding rows are inert (see above). Measured neutral-to-slightly-
    # negative for pure MXU alignment at V=20k (XLA already tiles
    # internally); its real use is making uneven vocabs shard evenly
    # under num_model_shards.
    "vocab_pad_multiple": (int, 1),
    # Per-label positive-class weight for the BCE discriminator/adversary
    # heads (torch BCEWithLogitsLoss(pos_weight) semantics), e.g.
    # {"uncertainty": 8.0} to counter a ~11%-positive label. Only valid for
    # binary (1-dim) heads. Default: no reweighting (reference behavior,
    # losses.py:180-196).
    "dsc_pos_weights": (dict, {}),
    # Scale on the discriminator supervision term in the main objective.
    # 0.0 reproduces the reference's vae_elbo protocol, which requires
    # MANUALLY editing run.py to set L['total_dsc_loss'] = 0
    # (reproduction_configs/sfu_amazon_100k/vae_elbo.json note in the
    # reference repo); here it is a config key so the ELBO baseline runs
    # unmodified. Default 1.0 (reference behavior for every other config).
    "dsc_loss_weight": (float, 1.0),
    # Log a per-phase wall-clock breakdown of each fused train epoch
    # (collate / upload / compute+fetch / bleu / scalar log / metadata CSV).
    "log_epoch_phases": (bool, False),
    # Run each optimizer group's Adam on ONE raveled parameter vector
    # (optax.flatten): bit-identical updates, hundreds fewer device ops
    # per step. MEASURED NEUTRAL at flagship scale (7.0 vs 6.8 ms/step,
    # within host noise -- XLA already fuses the per-leaf updates), so
    # default OFF; kept as a knob for op-count-sensitive shapes.
    # Auto-disabled under tensor parallelism (the raveled moments cannot
    # carry the dec/out sharding). Checkpoints written either way restore
    # transparently (training/checkpoint.py converts).
    "flat_optimizer": (bool, False),
    "deterministic_eval_z": (bool, False),
    "mi_loss_weight_train": (float, 0.01),
    "mi_loss_weight_eval": (float, 1.0),
    "max_sequence_length": (int, -1),  # -1: derive from data
    "log_tensorboard": (bool, True),
    "note": (str, ""),  # reproduction configs carry a free-text note field
    # Adversary gradient mode. "reference": adversary weights are updated by
    # CE + the negated-entropy gradient, reproducing the reference's
    # unzeroed grad accumulation (total_loss.backward() at run.py:254
    # deposits dH into adversary weights; AdversarialDiscriminator.
    # optimizer_step at model.py:239-245 backwards CE on top WITHOUT
    # zeroing, so Adam steps on dCE + dH). "clean": CE only.
    "adv_grad_mode": (str, "reference"),
    "lstm_backend": (str, "auto"),
    # TPU-native equivalents of the reference's always-on autograd anomaly
    # detection + AutogradDebugger (run.py:22, utils.py:22-45): NaN checks
    # are opt-in here because they disable fusion/donation.
    # MI estimator family: "club" (full marginalization, Adam 5e-4 --
    # reference losses.py:10-74) or "club_sample" (sampled negatives,
    # Adam 3e-5 -- the reference's unused alternative, losses.py:77-125).
    "mi_estimator": (str, "club"),
    "fused_decoder_ce": (bool, True),
    "fused_ce_backend": (str, "xla"),
    # Backward strategy for the pallas fused CE: "per_step" (each decode
    # timestep's custom VJP emits its own [H, V] dW, which the scan
    # accumulates -- reference-shaped AD) or "batched" (the decode scan
    # runs the CE kernel forward-only and gradients attach post-scan
    # through ONE cross-time kernel sweep: the [H, V] weight cotangent
    # is computed once instead of T-1 times, deleting the scan's per-
    # step gradient-accumulator traffic). Same softmax-CE math; the
    # batched dW accumulates in f32 per vocab tile (numerically stronger
    # than the per-step bf16 accumulation). Ignored on the XLA CE leg.
    "fused_ce_bwd": (str, "per_step"),
    # Sampling algorithm inside the fused decoder CE op: "gumbel"
    # (jax.random.categorical -- bit-identical draws to the reference
    # path, one random number per logit) or "cdf" (inverse-CDF -- same
    # categorical distribution, one random number per row). MEASURED
    # SLOWER on TPU at flagship scale (10.7 vs 6.5 ms/step: the [B, V]
    # cumsum costs more than the threefry draws it saves), so gumbel
    # stays the default; the knob documents the negative result and keeps
    # the option for backends/shapes where the trade reverses.
    "decoder_sampler": (str, "gumbel"),
    # lax.cond-skip the sampler on teacher-forced decode steps (the draw
    # is dead there); bit-identical outputs, fewer [B, V] random bits.
    # Default ON since the round-3 A/B: clear win under threefry (the
    # default prng), tie under rbg, identical losses either way.
    "cond_sampler": (bool, True),
    # Unroll factor for the decode scan (identical math; measured neutral
    # at flagship scale -- 6.43 ms/step at unroll=2 vs 6.45 at 1, worse at
    # 4 -- the loop body's op overhead dominates, not iteration overhead).
    "decode_unroll": (int, 1),
    "debug_nans": (bool, False),
    # Checkpoint every Nth epoch (the reference checkpoints every epoch;
    # the final trained epoch is always checkpointed). The device->host
    # state copy (~4x model size) can dominate wall-clock on hosts with
    # slow device links.
    "checkpoint_every_n_epochs": (int, 1),
    # Keep only the newest N checkpoints (0 = keep all, the reference's
    # behavior -- vae/utils.py never deletes). A 20-epoch flagship run
    # otherwise retains ~4.7 GB of model_\d dirs of which the evaluation
    # suite only ever reads the latest.
    "keep_checkpoints": (int, 0),
    # Keep only the newest N epochs of latent-metadata CSVs per dataset
    # (0 = keep all). The evaluation suite reads the latest epoch only
    # (evaluation/metadata.py get_last_epoch); a 20-epoch flagship run
    # otherwise retains ~5.8 GB of per-epoch mu/logvar/z logs.
    "keep_latent_epochs": (int, 0),
    # Fuse each training epoch into ONE device program (lax.scan over the
    # epoch's stacked batches). Per-step host dispatch dominates epoch
    # wall-clock otherwise (~100x the compute at this model scale).
    "fused_epoch": (bool, True),
    # lax.scan unroll factor for the fused-epoch step loop (identical
    # math): >1 replicates the fused step body to amortize per-iteration
    # scan overhead, trading compile time. Measured round 4 on the
    # fused-epoch census before changing the default.
    "epoch_scan_unroll": (int, 1),
    # Chunked fused epoch (identical math): run each training epoch as
    # floor(S / C) calls of ONE fixed C-step scan program plus per-step
    # calls for the S mod C remainder, instead of one S-step program.
    # The monolithic program's shape bakes in S = ceil(N / B), so EVERY
    # new corpus pays a full cold compile (~17-20 min at flagship scale,
    # ROUND3.md); with a chunk size the compiled pieces are corpus-size-
    # independent and the persistent cache makes the second corpus free.
    # Cost: ~40 ms of per-call dispatch per chunk boundary (amortized
    # 1/C -- benchmarks/epoch_census.py). 0 = monolithic (default).
    "epoch_chunk_steps": (int, 0),
    # Compute the (host-side) self-BLEU metric every Nth train step.
    # 1 = reference behavior (every step). On slow hosts BLEU is a
    # meaningful share of epoch wall-clock; eval epochs always compute it.
    "bleu_every_n_steps": (int, 1),
    # Compute the autoencoding-drift metric (re-encode the step's token
    # predictions with the updated params -- reference run.py:285-295)
    # every Nth train step. 1 = reference behavior (every step). The
    # re-encode is ~8% of the train step's FLOPs (BENCH_r04
    # flops_breakdown.reencode) spent on a TensorBoard scalar; N>1
    # lax.cond-skips it, leaving computed-step values bit-identical.
    "ae_drift_every_n": (int, 1),
    # jax.profiler trace of the first few training steps; "" disables.
    "profile_dir": (str, ""),
    "profile_steps": (int, 5),
    # Persistent XLA compilation cache directory. "auto" ->
    # ~/.cache/dvae_tpu/xla_cache, "" disables. Converts the minutes-long
    # per-process XLA compiles (9+ min flagship first epoch, ~10 min
    # streaming Pallas CE) into a one-time cost; warm starts deserialize
    # in seconds (utils/compile_cache.py, benchmarks/RESULTS.md round 3).
    "compilation_cache_dir": (str, "auto"),
    # JAX PRNG implementation: "threefry" (default -- deterministic
    # across platforms, the impl every committed study ran under) or
    # "rbg" (TPU hardware-friendly generator: distribution-equal but
    # bit-different draws; measured -22% device step time at flagship
    # scale because the decode sampler's per-logit threefry bits dominate
    # the gumbel argmax -- RESULTS.md round-3 census). Checkpoints are
    # NOT portable across impls (key shapes differ): finish a run with
    # the impl it started with.
    "prng_impl": (str, "threefry"),
}


def validate_params(params: Dict[str, Any]) -> None:
    """Validate a config dict against the required schema.

    Same semantics as reference vae/utils.py:48-88: raise ValueError on
    missing/mistyped required keys, warn on unknown keys. (The reference's
    unreachable second ValueError -- utils.py:83-84, quirk #12 -- is folded
    into one message here.)
    """
    for key, typ in REQUIRED_SCHEMA.items():
        if key not in params:
            raise ValueError(f"parameter file missing '{key}'")
        val = params[key]
        # bool is a subclass of int; reject bools where ints are expected.
        if typ is int and isinstance(val, bool):
            raise ValueError(
                f"Parameter '{key}' of incorrect type! "
                f"Expected '{typ}' but got '{type(val)}'.")
        if typ is float and isinstance(val, int) and not isinstance(val, bool):
            continue  # JSON integers are acceptable floats
        if not isinstance(val, typ):
            raise ValueError(
                f"Parameter '{key}' of incorrect type! "
                f"Expected '{typ}' but got '{type(val)}'.")

    for key in params:
        if key not in REQUIRED_SCHEMA and key not in OPTIONAL_SCHEMA:
            warnings.warn(
                f"Ignoring unused parameter '{key}' in parameter file.")

    impl = params.get("prng_impl", "threefry")
    if impl not in ("threefry", "rbg"):
        raise ValueError(
            f"prng_impl must be 'threefry' or 'rbg', got '{impl}'")

    lat = params["latent_dims"]
    if "total" not in lat:
        raise ValueError("latent_dims must contain a 'total' key")
    named = sum(v for k, v in lat.items() if k != "total")
    if named > lat["total"]:
        raise ValueError(
            f"named latent dims ({named}) exceed latent_dims['total'] "
            f"({lat['total']})")
    if "default" not in params["lambdas"]:
        # Reference falls back to lambdas["default"] (losses.py:170-174);
        # require it up front so a KeyError cannot surface mid-training.
        needed = [k for k in lat if k != "total"]
        if named < lat["total"]:
            needed.append("content")
        for k in needed:
            if k not in params["lambdas"]:
                raise ValueError(
                    "lambdas must contain 'default' or a weight per latent "
                    f"(missing '{k}')")


def load_config(path: str) -> Dict[str, Any]:
    """Load + validate a config file; fill optional extension defaults."""
    with open(path, "r") as f:
        params = json.load(f)
    validate_params(params)
    for key, (_typ, default) in OPTIONAL_SCHEMA.items():
        params.setdefault(key, default)
    return params


@dataclass(frozen=True)
class ModelConfig:
    """Static (hashable) model hyperparameters, closed over by jitted fns.

    Derived from the JSON config + dataset statistics. Latent ordering is
    deterministic-by-design: named (discriminator) latents in config order,
    'content' last (fixes reference quirk #8 -- model.py:438-441 relied on
    dict insertion order).
    """
    vocab_size: int
    emb_dim: int
    hidden_dim: int
    enc_layers: int
    dec_layers: int
    bidirectional: bool
    bow_encoder: bool
    latent_names: Tuple[str, ...]       # order used for z concat
    latent_dims: Tuple[int, ...]        # aligned with latent_names
    dsc_names: Tuple[str, ...]          # discriminator heads (subset of latent_names)
    dsc_output_dims: Tuple[int, ...]    # aligned with dsc_names (binary -> 1)
    adv_pairs: Tuple[Tuple[str, str], ...]  # (latent_name, label_name)
    mi_pairs: Tuple[Tuple[str, str], ...]   # unordered latent pairs
    sos_idx: int
    eos_idx: int
    pad_idx: int
    encoder_dropout: float
    decoder_dropout: float
    adversarial_loss: bool
    mi_loss: bool
    frozen_embeddings: bool
    compute_dtype: str = "float32"
    max_length: int = 32
    adv_grad_mode: str = "reference"  # see OPTIONAL_SCHEMA["adv_grad_mode"]
    # LSTM recurrence backend: "scan" (lax.scan), "pallas" (fused kernel,
    # DEPRECATED), or "auto" (resolves to scan under bf16 -- the fastest
    # measured combination; pallas only for f32-on-TPU when it fits VMEM).
    # Round-3 verdict on the pallas kernel: after bf16-izing its resident
    # recurrent weight (ops/pallas_lstm.py), every pallas combination
    # still loses the honest flagship A/B to scan+bf16 (8.9 vs 6.5-7.2
    # ms/step, benchmarks/RESULTS.md round 3), so the backend is kept only
    # for f32 parity runs and as kernel infrastructure.
    lstm_backend: str = "auto"
    mi_estimator: str = "club"  # "club" | "club_sample"
    # ((label_name, pos_weight), ...) for BCE heads; see OPTIONAL_SCHEMA
    # ["dsc_pos_weights"]. Tuple-of-pairs keeps the dataclass hashable.
    pos_weights: Tuple[Tuple[str, float], ...] = ()
    # see OPTIONAL_SCHEMA["dsc_loss_weight"]; 0.0 = the vae_elbo baseline
    dsc_loss_weight: float = 1.0
    # Fuse the decoder's vocab projection + CE + sampling into a custom-VJP
    # op that never materializes/saves [B, T, V] logits (ops/fused_ce.py).
    # Identical math and (same key) identical samples to the logits path.
    fused_decoder_ce: bool = True
    # Backend for the fused CE: "xla" (transient logits, rematerialized
    # backward), "pallas" (streaming vocab tiles, ops/pallas_ce.py -- no
    # [B, V] tensor anywhere; samples use the in-kernel PRNG so draws are
    # distribution-equal but not bit-equal to the XLA path), or "auto".
    fused_ce_backend: str = "xla"
    # see OPTIONAL_SCHEMA["fused_ce_bwd"]; "per_step" = reference-shaped AD
    fused_ce_bwd: str = "per_step"
    # see OPTIONAL_SCHEMA["decoder_sampler"]
    decoder_sampler: str = "gumbel"
    # see OPTIONAL_SCHEMA["ae_drift_every_n"]; 1 = reference parity
    ae_drift_every_n: int = 1
    # Skip the decode sampler's [B, V] random-bit generation + argmax on
    # teacher-forced steps via lax.cond: the sampled token is dead there
    # (jnp.where(coin, teacher, sampled) with a batch-shared coin), and
    # JAX PRNG keys are functional, so skipping the draw changes no other
    # stream -- outputs are bit-identical either way. ~half the decode
    # steps skip the largest op in the step program at tf_ratio 0.5.
    # On by default (round-3 A/B: faster under threefry, tie under rbg,
    # device losses bit-identical); set false to trace the reference-
    # shaped unconditional program.
    cond_sampler: bool = True
    # lax.scan unroll factor for the autoregressive decode loops: >1 trades
    # compile time/code size for fewer loop iterations (identical math)
    decode_unroll: int = 1
    # If true, eval-mode latents use z = mu (fixes reference quirk #1, the
    # dead eval branch at model.py:391-395). Default false: preserve the
    # reference's always-stochastic z, which the MIG protocol expects.
    deterministic_eval_z: bool = False
    # Output-projection vocab dim after padding (>= vocab_size; -1 means no
    # padding). Padding rows carry zero weights and -1e9 bias: softmax
    # probability exactly 0, gradients exactly 0, never sampled -- inert
    # except for enabling even P('model', ...) sharding / MXU alignment.
    padded_vocab_size: int = -1

    @property
    def out_vocab_size(self) -> int:
        return self.padded_vocab_size if self.padded_vocab_size > 0 \
            else self.vocab_size

    @property
    def total_latent_dim(self) -> int:
        return sum(self.latent_dims)

    @property
    def context_dim(self) -> int:
        ndir = 2 if self.bidirectional else 1
        if self.bow_encoder:
            # BOW context = emb_dim (reference model.py:29, 43-49)
            return self.emb_dim
        return self.hidden_dim * self.enc_layers * ndir

    def latent_dim_of(self, name: str) -> int:
        return self.latent_dims[self.latent_names.index(name)]

    def dsc_output_dim_of(self, name: str) -> int:
        return self.dsc_output_dims[self.dsc_names.index(name)]

    def mi_hidden_of(self, pair: Tuple[str, str]) -> int:
        # reference model.py:349: hidden = max(dim_i, dim_j, 5)
        return max(self.latent_dim_of(pair[0]), self.latent_dim_of(pair[1]), 5)


def flat_optimizer_enabled(params: Dict[str, Any]) -> bool:
    """Resolve the `flat_optimizer` setting: off by default (measured
    neutral), forced off under tensor parallelism (see OPTIONAL_SCHEMA)."""
    return bool(params.get("flat_optimizer", False)) and \
        params.get("num_model_shards", 1) == 1


def _resolve_compute_dtype(compute_dtype: str, lstm_backend: str) -> str:
    """Resolve "auto" to a concrete dtype by the measured rule
    (benchmarks/dtype_evidence.py + the honest-timing A/B, RESULTS.md
    round 2): the Pallas LSTM kernel computes in f32 internally, so bf16
    only adds boundary casts there; the lax.scan backend wins in bf16 once
    the weight casts are hoisted out of the loop
    (layers.cast_matmul_weights), and scan+bf16 is the fastest measured
    combination overall -- so auto+auto resolves to bf16 (with
    _select_lstm_backend then picking scan for bf16)."""
    if compute_dtype != "auto":
        if compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"compute_dtype must be 'float32', 'bfloat16' "
                             f"or 'auto', got {compute_dtype!r}")
        return compute_dtype
    return "bfloat16" if lstm_backend in ("scan", "auto") else "float32"


def build_model_config(params: Dict[str, Any], vocab_size: int,
                       label_dims: Dict[str, int], sos_idx: int, eos_idx: int,
                       max_length: int,
                       frozen_embeddings: bool = False) -> ModelConfig:
    """Assemble the static ModelConfig from config + dataset facts.

    Mirrors reference build_vae wiring (model.py:515-559):
      - one Discriminator per label in label_dims that also appears in
        latent_dims (model.py:544-551)
      - leftover latent dims become 'content' (model.py:296-302)
      - adversaries for every (latent, other-label) pair (model.py:323-335)
      - CLUB estimators for every unordered latent pair (model.py:337-355)
      - decoder num_layers coerced 1->2 (model.py:123-124, quirk #9 preserved:
        it is part of every trained reference checkpoint's shape)
    """
    lat = params["latent_dims"]
    dsc_names = [n for n in lat if n != "total" and n in label_dims]
    dsc_output_dims = [label_dims[n] for n in dsc_names]
    latent_names = list(dsc_names)
    latent_dims = [lat[n] for n in dsc_names]
    named_total = sum(latent_dims)
    assert named_total <= lat["total"], "named latents exceed total"
    if named_total < lat["total"]:
        latent_names.append("content")
        latent_dims.append(lat["total"] - named_total)

    adv_pairs = []
    if params["adversarial_loss"]:
        for ln in latent_names:
            for lab in dsc_names:
                if ln == lab:
                    continue
                adv_pairs.append((ln, lab))

    mi_pairs = []
    if params["mi_loss"]:
        seen = set()
        for i in latent_names:
            for j in latent_names:
                if i == j or (j, i) in seen:
                    continue
                seen.add((i, j))
                mi_pairs.append((i, j))

    dec_layers = params["num_rnn_layers"]
    if dec_layers == 1:
        dec_layers = 2

    n_model = params.get("num_model_shards", 1)
    pad_mult = params.get("vocab_pad_multiple", 1)
    if n_model < 1 or pad_mult < 1:
        raise ValueError("num_model_shards and vocab_pad_multiple must "
                         "be >= 1")
    mult = math.lcm(n_model, pad_mult)
    padded_vocab = -1 if mult == 1 else -(-vocab_size // mult) * mult

    # cond_sampler applies to both fused-CE backends (round 5): the XLA
    # path lax.cond-skips its sampler body on teacher-forced steps and
    # the pallas kernel predicates its Gumbel block off via the same
    # coin -- bit-identical outputs either way, so the knob needs no
    # backend-dependent resolution here.
    cond_sampler = params.get("cond_sampler", True)

    fused_ce_bwd = params.get("fused_ce_bwd", "per_step")
    if fused_ce_bwd not in ("per_step", "batched"):
        raise ValueError(
            f"fused_ce_bwd must be 'per_step' or 'batched', got "
            f"{fused_ce_bwd!r}")

    pw = params.get("dsc_pos_weights", {}) or {}
    for k in pw:
        if k not in dsc_names:
            raise ValueError(
                f"dsc_pos_weights key {k!r} is not a discriminator label "
                f"(have {dsc_names})")
        if label_dims[k] != 1:
            raise ValueError(
                f"dsc_pos_weights[{k!r}]: pos_weight only applies to "
                "binary (1-dim BCE) heads")

    return ModelConfig(
        vocab_size=vocab_size,
        emb_dim=params["embedding_dim"],
        hidden_dim=params["hidden_dim"],
        enc_layers=params["num_rnn_layers"],
        dec_layers=dec_layers,
        bidirectional=params["bidirectional_encoder"],
        bow_encoder=params["bow_encoder"],
        latent_names=tuple(latent_names),
        latent_dims=tuple(latent_dims),
        dsc_names=tuple(dsc_names),
        dsc_output_dims=tuple(dsc_output_dims),
        adv_pairs=tuple(adv_pairs),
        mi_pairs=tuple(mi_pairs),
        sos_idx=sos_idx,
        eos_idx=eos_idx,
        pad_idx=0,
        encoder_dropout=params["encoder_dropout"],
        decoder_dropout=params["decoder_dropout"],
        adversarial_loss=params["adversarial_loss"],
        mi_loss=params["mi_loss"],
        frozen_embeddings=frozen_embeddings,
        compute_dtype=_resolve_compute_dtype(
            params.get("compute_dtype", "float32"),
            params.get("lstm_backend", "auto")),
        max_length=max_length,
        adv_grad_mode=params.get("adv_grad_mode", "reference"),
        lstm_backend=params.get("lstm_backend", "auto"),
        mi_estimator=params.get("mi_estimator", "club"),
        fused_decoder_ce=params.get("fused_decoder_ce", True),
        fused_ce_backend=params.get("fused_ce_backend", "xla"),
        fused_ce_bwd=fused_ce_bwd,
        decoder_sampler=params.get("decoder_sampler", "gumbel"),
        ae_drift_every_n=max(1, params.get("ae_drift_every_n", 1)),
        cond_sampler=cond_sampler,
        decode_unroll=params.get("decode_unroll", 1),
        deterministic_eval_z=params.get("deterministic_eval_z", False),
        pos_weights=tuple(sorted((k, float(v)) for k, v in pw.items())),
        dsc_loss_weight=float(params.get("dsc_loss_weight", 1.0)),
        padded_vocab_size=padded_vocab,
    )
