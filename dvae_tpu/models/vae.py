"""The disentangling sequence VAE as pure functions over param pytrees.

Capability match for reference vae/model.py (VariationalSeq2Seq + heads),
redesigned TPU-first:

  - encoder/decoder recurrence: `lax.scan` with batched input projections
    (see models/lstm.py) instead of per-token cuDNN calls;
  - the autoregressive teacher-forced decode loop (reference
    model.py:457-472, the hottest Python loop) is a single fused scan
    carrying (h, c, prev_token) with per-step PRNG folding: the
    teacher-forcing coin is one Bernoulli draw per timestep shared across
    the batch (preserving model.py:463 semantics) and non-teacher-forced
    feedback is `jax.random.categorical` (== torch.multinomial(softmax));
  - latent reparameterization preserves the reference's exact (nonstandard)
    convention: logvar = tanh(raw), z = mu + eps * exp(logvar) -- std is
    exp(logvar), NOT exp(logvar/2) (model.py:390-395, quirks #1/#2). This is
    load-bearing for MIG evaluation parity.
  - z concat order is deterministic: named latents in config order, content
    last (fixes quirk #8, model.py:438-441).

Parameter pytree layout (see init_vae_params):
  {"main": {enc, dec, c2p, z2h, dsc}, "adv": {...}, "mi": {...}}
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dvae_tpu.config import ModelConfig
from dvae_tpu.models.club import init_club_params
from dvae_tpu.models.layers import (cast_matmul_weights, dot, dropout,
                                    embedding_init, linear, linear_init)
from dvae_tpu.models.lstm import (flip_within_length, lstm_cell,
                                  lstm_layer_init, lstm_scan)


class LatentParams(NamedTuple):
    z: jnp.ndarray
    mu: jnp.ndarray
    logvar: jnp.ndarray


def init_vae_params(key, cfg: ModelConfig,
                    emb_matrix: Optional[jnp.ndarray] = None
                    ) -> Tuple[Dict, Dict]:
    """Build the full parameter pytree and the constants pytree.

    If cfg.frozen_embeddings, `emb_matrix` lives in constants (GloVe path,
    reference model.py:19-22/66-69/128-132 freezes pretrained embeddings);
    otherwise encoder and decoder each own a trainable embedding table.
    """
    keys = iter(jax.random.split(key, 64))
    main: Dict = {}
    constants: Dict = {}

    if cfg.frozen_embeddings:
        assert emb_matrix is not None
        constants["embedding"] = jnp.asarray(emb_matrix, jnp.float32)

    # --- Encoder ---
    enc: Dict = {}
    if not cfg.frozen_embeddings:
        enc["embedding"] = embedding_init(next(keys), cfg.vocab_size,
                                          cfg.emb_dim)
    if not cfg.bow_encoder:
        layers: Dict = {}
        in_dim = cfg.emb_dim
        ndir = 2 if cfg.bidirectional else 1
        for l in range(cfg.enc_layers):
            layer = {"fwd": lstm_layer_init(next(keys), in_dim,
                                            cfg.hidden_dim)}
            if cfg.bidirectional:
                layer["bwd"] = lstm_layer_init(next(keys), in_dim,
                                               cfg.hidden_dim)
            layers[f"layer_{l}"] = layer
            in_dim = cfg.hidden_dim * ndir
        enc["layers"] = layers
    main["enc"] = enc

    # --- Decoder ---
    dec: Dict = {}
    if not cfg.frozen_embeddings:
        dec["embedding"] = embedding_init(next(keys), cfg.vocab_size,
                                          cfg.emb_dim)
    dlayers: Dict = {}
    in_dim = cfg.emb_dim
    for l in range(cfg.dec_layers):
        dlayers[f"layer_{l}"] = lstm_layer_init(next(keys), in_dim,
                                                cfg.hidden_dim)
        in_dim = cfg.hidden_dim
    dec["layers"] = dlayers
    dec["out"] = linear_init(next(keys), cfg.out_vocab_size, cfg.hidden_dim)
    if cfg.out_vocab_size > cfg.vocab_size:
        # Vocab padding rows (TP shard evenness / MXU alignment) are inert:
        # zero weights + -1e9 bias give softmax probability exactly 0 and
        # gradient exactly 0, so they never train and are never sampled.
        dec["out"]["w"] = dec["out"]["w"].at[cfg.vocab_size:].set(0.0)
        dec["out"]["b"] = dec["out"]["b"].at[cfg.vocab_size:].set(-1e9)
    main["dec"] = dec

    # --- Latent heads: context -> (mu, logvar) per latent space ---
    main["c2p"] = {
        name: linear_init(next(keys), 2 * dim, cfg.context_dim)
        for name, dim in zip(cfg.latent_names, cfg.latent_dims)}

    # --- z -> decoder initial (h, c) ---
    main["z2h"] = linear_init(
        next(keys), 2 * cfg.hidden_dim * cfg.dec_layers,
        cfg.total_latent_dim)

    # --- Discriminator heads ---
    main["dsc"] = {
        name: linear_init(next(keys), cfg.dsc_output_dim_of(name),
                          cfg.latent_dim_of(name))
        for name in cfg.dsc_names}

    params: Dict = {"main": main}

    # --- Adversarial heads (latent -> other label) ---
    params["adv"] = {
        f"{ln}-{lab}": linear_init(next(keys), cfg.dsc_output_dim_of(lab),
                                   cfg.latent_dim_of(ln))
        for ln, lab in cfg.adv_pairs}

    # --- CLUB MI estimators per unordered latent pair ---
    params["mi"] = {
        f"{a}-{b}": init_club_params(next(keys), cfg.latent_dim_of(a),
                                     cfg.latent_dim_of(b),
                                     cfg.mi_hidden_of((a, b)))
        for a, b in cfg.mi_pairs}

    return params, constants


def _embedding(main: Dict, constants: Dict, which: str) -> jnp.ndarray:
    if "embedding" in constants:
        return constants["embedding"]
    return main[which]["embedding"]


def _select_lstm_backend(cfg: ModelConfig, token_shape):
    """Pick the recurrence implementation for encoder layers (see
    config.ModelConfig.lstm_backend)."""
    if cfg.lstm_backend == "scan":
        return lstm_scan
    from dvae_tpu.ops.pallas_lstm import (lstm_scan_pallas,
                                          pallas_lstm_supported)
    B, T = token_shape
    ok = pallas_lstm_supported(B, T, cfg.hidden_dim)
    if cfg.lstm_backend == "pallas":
        if not ok:
            raise ValueError(
                f"pallas LSTM unsupported for B={B} T={T} "
                f"H={cfg.hidden_dim}")
        return lstm_scan_pallas
    # auto: under bf16 the scan backend with pre-cast weights measures
    # fastest (honest-timing A/B, benchmarks/RESULTS.md round 2); the
    # f32-internal Pallas kernel wins only for f32, on TPU, when it fits
    if cfg.compute_dtype == "bfloat16":
        return lstm_scan
    if ok and jax.default_backend() == "tpu":
        return lstm_scan_pallas
    return lstm_scan


def encode(main: Dict, constants: Dict, cfg: ModelConfig,
           tokens: jnp.ndarray, lengths: jnp.ndarray, key,
           train: bool) -> jnp.ndarray:
    """tokens [B, T] -> context [B, context_dim].

    LSTM path: context is the concat of final hidden states over
    (layer, direction) in torch's [num_layers*num_directions] order
    (reference model.py:373-382). BOW path: masked max-pool over valid
    positions of the embedded tokens (model.py:43-49; deviation: the
    reference maxes over pad positions of the batch too -- we pool only
    valid tokens so the pad embedding cannot leak into the context).
    """
    k_emb, key = jax.random.split(key)
    emb = _embedding(main, constants, "enc")[tokens]        # [B, T, E]
    emb = dropout(emb, cfg.encoder_dropout, k_emb, train)

    if cfg.bow_encoder:
        valid = (jnp.arange(tokens.shape[1])[None, :]
                 < lengths[:, None])[..., None]
        masked = jnp.where(valid, emb, -jnp.inf)
        return jnp.max(masked, axis=1)

    run_lstm = _select_lstm_backend(cfg, tokens.shape)
    x = emb
    finals = []
    for l in range(cfg.enc_layers):
        lp = main["enc"]["layers"][f"layer_{l}"]
        if cfg.bidirectional:
            outs_f, (h_f, _) = run_lstm(lp["fwd"], x, lengths,
                                        cfg.compute_dtype)
            x_rev = flip_within_length(x, lengths)
            outs_b, (h_b, _) = run_lstm(lp["bwd"], x_rev, lengths,
                                        cfg.compute_dtype)
            outs_b = flip_within_length(outs_b, lengths)
            outs = jnp.concatenate([outs_f, outs_b], axis=-1)
            finals.extend([h_f, h_b])
        else:
            outs, (h_f, _) = run_lstm(lp["fwd"], x, lengths,
                                      cfg.compute_dtype)
            finals.append(h_f)
        if l < cfg.enc_layers - 1:
            k_d, key = jax.random.split(key)
            outs = dropout(outs, cfg.encoder_dropout, k_d, train)
        x = outs
    # context: [B, num_layers * num_directions * H], layer-major
    return jnp.concatenate(finals, axis=-1)


def compute_latent_params(main: Dict, cfg: ModelConfig, context: jnp.ndarray,
                          key, sample_z: bool = True
                          ) -> Dict[str, LatentParams]:
    """Per-latent reparameterization (reference model.py:384-398).

    Preserves the exact reference convention: logvar = tanh(raw);
    z = mu + eps * exp(logvar). `sample_z=False` gives z = mu (the
    reference's dead eval branch, available behind config
    `deterministic_eval_z`; default behavior keeps z stochastic always).
    """
    # ONE stacked [B, ctx] x [ctx, sum 2*dim] matmul for all latent heads
    # (round 3 small-op attack, VERDICT r2 weak #3): the per-head weights
    # are concatenated along the output dim, so each head's rows are
    # contracted exactly as in the per-head matmul -- identical values,
    # one MXU dispatch instead of len(latent_names).
    w_all = jnp.concatenate(
        [main["c2p"][n]["w"] for n in cfg.latent_names], axis=0)
    b_all = jnp.concatenate(
        [main["c2p"][n]["b"] for n in cfg.latent_names], axis=0)
    h_all = dot(context, w_all, cfg.compute_dtype) + b_all
    out = {}
    off = 0
    for i, name in enumerate(cfg.latent_names):
        k = jax.random.fold_in(key, i)  # stable across processes
        d = cfg.latent_dims[i]
        h = jax.lax.slice_in_dim(h_all, off, off + 2 * d, axis=-1)
        off += 2 * d
        mu, logvar = jnp.split(h, 2, axis=-1)
        logvar = jnp.tanh(logvar)
        if sample_z:
            eps = jax.random.normal(k, mu.shape, mu.dtype)
            z = mu + eps * jnp.exp(logvar)
        else:
            z = mu
        out[name] = LatentParams(z=z, mu=mu, logvar=logvar)
    return out


def concat_z(latent_params: Dict[str, LatentParams],
             cfg: ModelConfig) -> jnp.ndarray:
    """Deterministic z concatenation: named latents in config order, content
    last (fixes reference quirk #8)."""
    return jnp.concatenate(
        [latent_params[name].z for name in cfg.latent_names], axis=-1)


def compute_hidden(main: Dict, cfg: ModelConfig, z: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """z -> decoder initial (h, c), each [L, B, H]
    (reference model.py:400-411: z2hidden -> tanh -> chunk)."""
    hidden = jnp.tanh(linear(z, main["z2h"], cfg.compute_dtype))
    state, cell = jnp.split(hidden, 2, axis=-1)
    B = z.shape[0]
    L, H = cfg.dec_layers, cfg.hidden_dim
    h = state.reshape(B, L, H).transpose(1, 0, 2)
    c = cell.reshape(B, L, H).transpose(1, 0, 2)
    return h, c


def decoder_hidden_step(main: Dict, constants: Dict, cfg: ModelConfig,
                        token: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray,
                        key, train: bool
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decoder step up to (but excluding) the vocab projection:
    embed -> dropout -> L-layer LSTM. Returns (top hidden [B, H], h', c').
    Fresh dropout masks per step, matching the reference's per-token
    decoder calls (model.py:152-165)."""
    k_emb, key = jax.random.split(key)
    x = _embedding(main, constants, "dec")[token]          # [B, E]
    x = dropout(x, cfg.decoder_dropout, k_emb, train)
    new_h, new_c = [], []
    for l in range(cfg.dec_layers):
        p = main["dec"]["layers"][f"layer_{l}"]
        x_proj = dot(x, p["w_ih"], cfg.compute_dtype) + (
            p["b_ih"] + p["b_hh"])
        h_l, c_l = lstm_cell(p, x_proj, h[l], c[l], cfg.compute_dtype)
        new_h.append(h_l)
        new_c.append(c_l)
        x = h_l
        if l < cfg.dec_layers - 1:
            k_d, key = jax.random.split(key)
            x = dropout(x, cfg.decoder_dropout, k_d, train)
    return x, jnp.stack(new_h), jnp.stack(new_c)


def decoder_step(main: Dict, constants: Dict, cfg: ModelConfig,
                 token: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray,
                 key, train: bool
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """decoder_hidden_step + vocab projection: (logits [B, V], h', c')."""
    x, new_h, new_c = decoder_hidden_step(main, constants, cfg, token, h, c,
                                          key, train)
    logits = linear(x, main["dec"]["out"], cfg.compute_dtype)
    return logits, new_h, new_c


def _sos_first_step(cfg: ModelConfig, B: int, T: int):
    """Position 0 is hardcoded SOS: logits one-hot value 1.0 at sos_idx,
    prediction = sos (reference model.py:452-456)."""
    logits0 = jnp.zeros((B, cfg.vocab_size)).at[:, cfg.sos_idx].set(1.0)
    if cfg.out_vocab_size > cfg.vocab_size:
        # keep the padded columns at -1e9 so position 0's CE stays the
        # unpadded constant log(e + V - 1) - 1
        logits0 = jnp.pad(logits0,
                          ((0, 0), (0, cfg.out_vocab_size - cfg.vocab_size)),
                          constant_values=-1e9)
    preds0 = jnp.full((B,), cfg.sos_idx, dtype=jnp.int32)
    return logits0, preds0


def decode_teacher_forced(main: Dict, constants: Dict, cfg: ModelConfig,
                          z: jnp.ndarray, inputs: jnp.ndarray, key,
                          tf_prob, train: bool
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused autoregressive decode with per-step teacher forcing.

    `inputs` are the same (possibly noisy) tokens fed to the encoder -- the
    reference teacher-forces on them, not on the clean targets
    (model.py:463-466 with run.py:227 passing in_Xbatch). Returns
    (logits [B, T, V], predictions [B, T]); predictions at step t record the
    token *fed to* step t+1, teacher token included (model.py:472).
    """
    B, T = inputs.shape
    h, c = compute_hidden(main, cfg, z)
    prev0 = jnp.full((B,), cfg.sos_idx, dtype=inputs.dtype)

    def step(carry, t):
        h, c, prev = carry
        kt = jax.random.fold_in(key, t)
        k_step, k_tf, k_samp = jax.random.split(kt, 3)
        logits_t, h, c = decoder_step(main, constants, cfg, prev, h, c,
                                      k_step, train)
        coin = jax.random.bernoulli(k_tf, tf_prob)  # one coin per timestep
        teacher = jax.lax.dynamic_index_in_dim(
            inputs, t, axis=1, keepdims=False)
        sampled = jax.random.categorical(k_samp, logits_t).astype(
            inputs.dtype)
        nxt = jnp.where(coin, teacher, sampled)
        return (h, c, nxt), (logits_t, nxt)

    (_, _, _), (logits_seq, preds_seq) = jax.lax.scan(
        step, (h, c, prev0), jnp.arange(1, T), unroll=cfg.decode_unroll)
    logits0, preds0 = _sos_first_step(cfg, B, T)
    logits = jnp.concatenate(
        [logits0[:, None, :], jnp.swapaxes(logits_seq, 0, 1)], axis=1)
    preds = jnp.concatenate(
        [preds0[:, None].astype(inputs.dtype),
         jnp.swapaxes(preds_seq, 0, 1)], axis=1)
    return logits, preds


def decode_teacher_forced_ce(main: Dict, constants: Dict, cfg: ModelConfig,
                             z: jnp.ndarray, inputs: jnp.ndarray,
                             targets: jnp.ndarray, lengths: jnp.ndarray,
                             key, tf_prob, train: bool
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused decode + reconstruction CE: like decode_teacher_forced but the
    [B, V] logits per step are consumed on the spot by a custom-VJP
    projection+CE+sampling op (ops/fused_ce.py) and never stacked into
    [B, T, V] or saved for backward. Teacher forcing feeds `inputs` (the
    possibly-noisy stream, reference semantics); the CE targets are the
    clean `targets`, time-masked by `lengths` (texar reduction semantics).

    Returns (per-example CE sum over valid timesteps [B], predictions
    [B, T]). Given the same key, predictions are bit-identical to
    decode_teacher_forced's.
    """
    from dvae_tpu.ops.fused_ce import out_proj_ce_sample, sos_position_ce

    B, T = inputs.shape
    h, c = compute_hidden(main, cfg, z)
    prev0 = jnp.full((B,), cfg.sos_idx, dtype=inputs.dtype)
    out_w = main["dec"]["out"]["w"]
    out_b = main["dec"]["out"]["b"]

    if cfg.fused_ce_backend not in ("xla", "pallas", "auto"):
        raise ValueError(
            f"unknown fused_ce_backend {cfg.fused_ce_backend!r} "
            "(expected 'xla', 'pallas', or 'auto')")
    use_pallas_ce = False
    if cfg.fused_ce_backend in ("pallas", "auto"):
        from dvae_tpu.ops.pallas_ce import pallas_ce_supported
        ok = pallas_ce_supported(B, cfg.hidden_dim, cfg.out_vocab_size)
        if cfg.fused_ce_backend == "pallas" and not ok:
            raise ValueError("pallas CE unsupported for these shapes")
        use_pallas_ce = ok and (cfg.fused_ce_backend == "pallas"
                                or jax.default_backend() == "tpu")
    # cond_sampler applies to BOTH CE backends (round 5): the XLA path
    # lax.cond-skips its sampler body on teacher-forced steps, and the
    # pallas kernel predicates its Gumbel block off via the same coin.
    # Outputs are bit-identical either way -- the skipped sample is dead
    # (jnp.where(coin, teacher, sampled) below never reads it).
    #
    # fused_ce_bwd="batched" (pallas leg only): the scan runs the CE
    # kernel FORWARD-ONLY and gradients attach post-scan through one
    # cross-time kernel sweep -- the [H, V] weight cotangent is computed
    # once instead of T-1 times and the scan carries no [H, V] gradient
    # accumulator (ops/pallas_ce.py pallas_ce_attach_grads). CE values
    # and predictions are identical; gradients are the same softmax-CE
    # math with the dW sum re-associated (f32 per vocab tile).
    use_batched_bwd = use_pallas_ce and cfg.fused_ce_bwd == "batched"
    interpret = jax.default_backend() != "tpu"

    def step(carry, t):
        h, c, prev, ce_acc = carry
        kt = jax.random.fold_in(key, t)
        k_step, k_tf, k_samp = jax.random.split(kt, 3)
        x, h, c = decoder_hidden_step(main, constants, cfg, prev, h, c,
                                      k_step, train)
        target_t = jax.lax.dynamic_index_in_dim(targets, t, axis=1,
                                                keepdims=False)
        # the coin is drawn BEFORE the CE op so cond_sampler can skip the
        # sampler body on teacher-forced steps (the draw is dead there;
        # keys are functional, so drawing the coin first changes nothing)
        coin = jax.random.bernoulli(k_tf, tf_prob)
        lse_t = jnp.zeros((B,), jnp.float32)
        if use_pallas_ce:
            from dvae_tpu.ops.pallas_ce import (pallas_ce_sample,
                                                pallas_ce_sample_fwd)
            seed = jax.random.randint(k_samp, (), 0, 2 ** 31 - 1,
                                      dtype=jnp.int32)
            coin_arg = coin if cfg.cond_sampler else None
            if use_batched_bwd:
                ce_t, sampled, lse_t = pallas_ce_sample_fwd(
                    x, out_w, out_b, target_t, seed, interpret,
                    coin=coin_arg)
            else:
                ce_t, sampled = pallas_ce_sample(
                    x, out_w, out_b, target_t, seed, interpret,
                    coin=coin_arg)
        else:
            ce_t, sampled = out_proj_ce_sample(
                x, out_w, out_b, target_t, k_samp, cfg.compute_dtype,
                cfg.decoder_sampler,
                coin if cfg.cond_sampler else None)
        ce_acc = ce_acc + ce_t * (t < lengths)
        teacher = jax.lax.dynamic_index_in_dim(inputs, t, axis=1,
                                               keepdims=False)
        nxt = jnp.where(coin, teacher, sampled.astype(inputs.dtype))
        ys = (nxt, x, lse_t) if use_batched_bwd else (nxt,)
        return (h, c, nxt, ce_acc), ys

    (_, _, _, ce_acc), ys = jax.lax.scan(
        step, (h, c, prev0, jnp.zeros((B,), jnp.float32)),
        jnp.arange(1, T), unroll=cfg.decode_unroll)
    preds_seq = ys[0]
    if use_batched_bwd:
        _, h_seq, lse_seq = ys
        from dvae_tpu.ops.pallas_ce import pallas_ce_attach_grads
        mask = (jnp.arange(1, T)[:, None] < lengths[None, :]).astype(
            jnp.float32)                                 # [T-1, B]
        targets_t = jnp.swapaxes(targets[:, 1:], 0, 1)   # [T-1, B]
        ce_acc = pallas_ce_attach_grads(
            ce_acc, h_seq, out_w, out_b, targets_t, lse_seq, mask,
            interpret)
    # position 0: constant CE of the hardcoded SOS one-hot row
    ce = ce_acc + sos_position_ce(cfg.vocab_size)
    preds0 = jnp.full((B, 1), cfg.sos_idx, dtype=inputs.dtype)
    preds = jnp.concatenate([preds0, jnp.swapaxes(preds_seq, 0, 1)], axis=1)
    return ce, preds


def sample(main: Dict, constants: Dict, cfg: ModelConfig, z: jnp.ndarray,
           key, max_length: int = 30, train: bool = False
           ) -> Dict[str, jnp.ndarray]:
    """Free-running sampling from z (reference model.py:484-512): always
    multinomial, fixed max_length (default 30)."""
    B = z.shape[0]
    main = cast_matmul_weights(main, cfg.compute_dtype)
    h, c = compute_hidden(main, cfg, z)
    prev0 = jnp.full((B,), cfg.sos_idx, dtype=jnp.int32)

    def step(carry, t):
        h, c, prev = carry
        kt = jax.random.fold_in(key, t)
        k_step, k_samp = jax.random.split(kt)
        logits_t, h, c = decoder_step(main, constants, cfg, prev, h, c,
                                      k_step, train)
        nxt = jax.random.categorical(k_samp, logits_t).astype(jnp.int32)
        return (h, c, nxt), (logits_t, nxt)

    _, (logits_seq, preds_seq) = jax.lax.scan(
        step, (h, c, prev0), jnp.arange(1, max_length))
    logits0, preds0 = _sos_first_step(cfg, B, max_length)
    logits = jnp.concatenate(
        [logits0[:, None, :], jnp.swapaxes(logits_seq, 0, 1)], axis=1)
    preds = jnp.concatenate(
        [preds0[:, None], jnp.swapaxes(preds_seq, 0, 1)], axis=1)
    return {"decoder_logits": logits, "token_predictions": preds}


def _stacked_head_logits(heads: Dict[str, Dict], cfg: ModelConfig,
                         zs: Dict[str, jnp.ndarray],
                         wiring) -> Dict[str, jnp.ndarray]:
    """Run a family of tiny per-latent linear heads as ONE block matmul
    (round 3 small-op attack): the per-head [out_i, d_i] weights are
    scattered into a block matrix over the concatenated z, with zeros
    where a head does not read a latent -- so logits and gradients are
    identical to the per-head linears (the zero blocks' gradients land
    outside every head's slice and are discarded by construction).

    wiring: [(head_name, input_latent_name, out_dim), ...].
    """
    if not wiring:
        # e.g. no named latent matches any label (dsc_names empty), or
        # every adversarial pair was filtered out -- the per-head-loop
        # predecessor returned {} here and training proceeded headless
        return {}
    if len(wiring) == 1:
        name, ln, _ = wiring[0]
        return {name: linear(zs[ln], heads[name], cfg.compute_dtype)}
    col_off = {}
    off = 0
    for n, d in zip(cfg.latent_names, cfg.latent_dims):
        col_off[n] = off
        off += d
    total_out = sum(od for _, _, od in wiring)
    w0 = heads[wiring[0][0]]["w"]
    W = jnp.zeros((total_out, off), w0.dtype)
    bs = []
    r = 0
    for name, ln, od in wiring:
        d = cfg.latent_dim_of(ln)
        c = col_off[ln]
        W = jax.lax.dynamic_update_slice(
            W, heads[name]["w"].astype(w0.dtype), (r, c))
        bs.append(heads[name]["b"])
        r += od
    z_cat = jnp.concatenate([zs[n] for n in cfg.latent_names], axis=-1)
    logits_all = dot(z_cat, W, cfg.compute_dtype) + jnp.concatenate(bs)
    out = {}
    r = 0
    for name, ln, od in wiring:
        out[name] = jax.lax.slice_in_dim(logits_all, r, r + od, axis=-1)
        r += od
    return out


def discriminator_logits(main: Dict, cfg: ModelConfig,
                         latent_params: Dict[str, LatentParams]
                         ) -> Dict[str, jnp.ndarray]:
    zs = {n: latent_params[n].z for n in cfg.latent_names}
    wiring = [(n, n, cfg.dsc_output_dim_of(n)) for n in cfg.dsc_names]
    return _stacked_head_logits(main["dsc"], cfg, zs, wiring)


def adversary_logits(adv: Dict, cfg: ModelConfig,
                     zs: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Adversary heads applied to (possibly stop-gradiented) z values.
    zs: {latent_name: z}."""
    wiring = [(f"{ln}-{lab}", ln, cfg.dsc_output_dim_of(lab))
              for ln, lab in cfg.adv_pairs]
    return _stacked_head_logits(adv, cfg, zs, wiring)


def predict_from_logits(logits: jnp.ndarray) -> jnp.ndarray:
    """Hard predictions (reference Discriminator.predict, model.py:204-210):
    sigmoid > 0.5 for 1-dim heads, argmax otherwise."""
    if logits.shape[-1] == 1:
        return (jax.nn.sigmoid(logits[..., 0]) > 0.5).astype(jnp.int32)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def forward(params: Dict, constants: Dict, cfg: ModelConfig,
            inputs: jnp.ndarray, lengths: jnp.ndarray, key,
            tf_prob, train: bool, sample_z: bool = True) -> Dict:
    """Full model forward (reference VariationalSeq2Seq.forward,
    model.py:413-482). Adversary parameters are consumed as given -- wrap
    them in stop_gradient at the call site to control the gradient topology.
    """
    k_enc, k_lat, k_dec = jax.random.split(key, 3)
    main = cast_matmul_weights(params["main"], cfg.compute_dtype)
    context = encode(main, constants, cfg, inputs, lengths,
                     k_enc, train)
    latent_params = compute_latent_params(main, cfg, context,
                                          k_lat, sample_z=sample_z)
    dsc_logits = discriminator_logits(main, cfg, latent_params)
    zs = {name: latent_params[name].z for name in cfg.latent_names}
    adv_logits = adversary_logits(
        cast_matmul_weights(params["adv"], cfg.compute_dtype), cfg, zs) \
        if cfg.adversarial_loss else {}
    z = concat_z(latent_params, cfg)
    logits, preds = decode_teacher_forced(
        main, constants, cfg, z, inputs, k_dec, tf_prob, train)
    return {"decoder_logits": logits,
            "latent_params": latent_params,
            "dsc_logits": dsc_logits,
            "adv_logits": adv_logits,
            "token_predictions": preds,
            "context": context}


def forward_with_ce(params: Dict, constants: Dict, cfg: ModelConfig,
                    inputs: jnp.ndarray, targets: jnp.ndarray,
                    lengths: jnp.ndarray, key, tf_prob, train: bool,
                    sample_z: bool = True) -> Dict:
    """forward() with the decode half fused into the reconstruction CE
    (decode_teacher_forced_ce): identical latent/head/prediction values for
    the same key, but no [B, T, V] logits are ever materialized. Returns
    "recon_ce" [B] (per-example sum over valid timesteps) in place of
    "decoder_logits"."""
    k_enc, k_lat, k_dec = jax.random.split(key, 3)
    main = cast_matmul_weights(params["main"], cfg.compute_dtype)
    context = encode(main, constants, cfg, inputs, lengths,
                     k_enc, train)
    latent_params = compute_latent_params(main, cfg, context,
                                          k_lat, sample_z=sample_z)
    dsc_logits = discriminator_logits(main, cfg, latent_params)
    zs = {name: latent_params[name].z for name in cfg.latent_names}
    adv_logits = adversary_logits(
        cast_matmul_weights(params["adv"], cfg.compute_dtype), cfg, zs) \
        if cfg.adversarial_loss else {}
    z = concat_z(latent_params, cfg)
    recon_ce, preds = decode_teacher_forced_ce(
        main, constants, cfg, z, inputs, targets, lengths, k_dec,
        tf_prob, train)
    return {"recon_ce": recon_ce,
            "latent_params": latent_params,
            "dsc_logits": dsc_logits,
            "adv_logits": adv_logits,
            "token_predictions": preds,
            "context": context}
