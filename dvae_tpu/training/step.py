"""The fused training/eval steps: one XLA program per step.

The reference performs, per batch, a Python-orchestrated sequence of a
forward, a main backward (retain_graph), one backward per adversary, a main
optimizer step, one backward+step per CLUB estimator, and a SECOND full
forward for the autoencoding drift metric (run.py:197-344). Here that whole
structure compiles into a single jitted step:

  - three gradient computations with the detachment topology encoded via
    stop_gradient (SURVEY.md section 7 "gradient-flow semantics"):
      main:  recon + weighted_kl + dsc + adv_entropy(stop_grad(adv_params))
             + beta * MI(stop_grad(mi_params))        -> encoder/decoder/
             heads/z2hidden/c2p (adversaries excluded, model.py:368-371)
      adv:   CE(adv(stop_grad(z)), y)                 -> adversary weights
             only (model.py:229-245)
      mi:    -loglikeli(stop_grad(z1), stop_grad(z2)) -> CLUB weights only
             (run.py:264-276)
  - three optimizer groups (optax): main Adam(learn_rate) with global clip
    5.0 (run.py:255, 575); adversary Adam(3e-4) (model.py:226); CLUB
    Adam(5e-4) with per-estimator clip 1.0 (losses.py:42-48)
  - the autoencoding drift metric re-encodes the step's token predictions
    with the UPDATED main params (reference order: optimizer.step() precedes
    the second forward, run.py:261 vs 285-289). Only the encoder+latent
    part is computed -- the decode half of the reference's second forward
    never influences the metric.

Everything is batch-sharded over the 'data' mesh axis; XLA inserts the
gradient all-reduce (params replicated).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dvae_tpu.config import ModelConfig
from dvae_tpu import losses as L
from dvae_tpu.models.layers import cast_matmul_weights
from dvae_tpu.models.vae import (adversary_logits, compute_latent_params,
                                 concat_z, encode, forward)
from dvae_tpu.ops.device_bleu import bleu_counts


class TrainState(NamedTuple):
    params: Dict[str, Any]          # {"main", "adv", "mi"}
    opt_main: Any
    opt_adv: Any
    opt_mi: Any
    step: jnp.ndarray               # int32 scalar
    rng: jnp.ndarray                # base PRNG key; per-step keys fold in step


def make_optimizers(learn_rate: float, mi_lr: float = 5e-4,
                    flat: bool = False):
    """The three reference optimizer groups. mi_lr: 5e-4 for CLUB
    (losses.py:42), 3e-5 for CLUBSample (losses.py:95).

    flat wraps each group in optax.flatten: Adam runs on ONE raveled
    vector per group instead of one fused op per parameter leaf. The
    update values are bit-identical (Adam is elementwise; the global-norm
    clip is the same on a raveled vector), but the per-step op count drops
    by hundreds -- measurable on TPU, where each small op costs ~1 us of
    fixed launch overhead. Off under tensor parallelism: a raveled moment
    vector cannot carry the P('model', ...) sharding of dec/out."""
    opt_main = optax.chain(optax.clip_by_global_norm(5.0),
                           optax.adam(learn_rate))
    opt_adv = optax.adam(3e-4)
    opt_mi = optax.adam(mi_lr)  # clip(1.0) applied per estimator below
    if flat:
        opt_main, opt_adv, opt_mi = (optax.flatten(o) for o in
                                     (opt_main, opt_adv, opt_mi))
    return opt_main, opt_adv, opt_mi


def create_train_state(params: Dict, learn_rate: float, seed: int,
                       mi_lr: float = 5e-4, flat: bool = False
                       ) -> TrainState:
    opt_main, opt_adv, opt_mi = make_optimizers(learn_rate, mi_lr, flat)
    return TrainState(
        params=params,
        opt_main=opt_main.init(params["main"]),
        opt_adv=opt_adv.init(params["adv"]),
        opt_mi=opt_mi.init(params["mi"]),
        step=jnp.asarray(0, jnp.int32),
        rng=jax.random.PRNGKey(seed),
    )


def kl_weight_vector(cfg: ModelConfig, lambdas: Dict[str, Any],
                     cyclic_value: float) -> np.ndarray:
    """Resolve the per-latent KL weight vector (aligned with
    cfg.latent_names) from the config's `lambdas` dict, substituting
    `cyclic_value` for the "cyclic" sentinel (reference run.py:230-236,
    losses.py:170-174)."""
    out = []
    for name in cfg.latent_names:
        w = lambdas.get(name, lambdas.get("default"))
        if w == "cyclic":
            w = cyclic_value
        out.append(float(w))
    return np.asarray(out, np.float32)


def _per_estimator_clip(grads: Dict, max_norm: float = 1.0) -> Dict:
    """clip_grad_norm_(1.0) per CLUB estimator (reference losses.py:44-48)."""
    def clip_tree(tree):
        leaves = jax.tree.leaves(tree)
        norm = jnp.sqrt(sum(jnp.sum(x ** 2) for x in leaves))
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
        return jax.tree.map(lambda x: x * scale, tree)
    return {name: clip_tree(sub) for name, sub in grads.items()}


def _all_losses(cfg: ModelConfig, params: Dict, constants: Dict, batch: Dict,
                key, tf_prob, kl_weights_vec, mi_weight, train: bool):
    """Forward + the five loss families (reference compute_all_losses,
    run.py:128-163). Detachment topology for the *main* objective is baked
    in: adversary and CLUB parameters are consumed behind stop_gradient."""
    mask = batch["example_mask"]
    shielded = {"main": params["main"],
                "adv": jax.lax.stop_gradient(params["adv"]),
                "mi": jax.lax.stop_gradient(params["mi"])}
    # quirk #1 control: eval z is stochastic like the reference unless
    # config deterministic_eval_z asks for z = mu at eval time
    sample_z = train or not cfg.deterministic_eval_z
    if cfg.fused_decoder_ce:
        from dvae_tpu.models.vae import forward_with_ce
        out = forward_with_ce(shielded, constants, cfg, batch["noisy_X"],
                              batch["X"], batch["lengths"], key, tf_prob,
                              train=train, sample_z=sample_z)
        recon = (out["recon_ce"] * mask).sum() / jnp.maximum(mask.sum(),
                                                             1.0)
    else:
        out = forward(shielded, constants, cfg, batch["noisy_X"],
                      batch["lengths"], key, tf_prob, train=train,
                      sample_z=sample_z)
        recon = L.reconstruction_loss(batch["X"], out["decoder_logits"],
                                      batch["lengths"], mask)
    lp = out["latent_params"]

    kl_weights = {name: kl_weights_vec[i]
                  for i, name in enumerate(cfg.latent_names)}
    metrics: Dict[str, Any] = {}
    metrics["reconstruction_loss"] = recon

    kl = L.compute_kl_divergence_losses(cfg, lp, kl_weights, mask)
    metrics.update({"total_weighted_kl": kl["total_weighted_kl"],
                    "total_kl": kl["total_kl"], "idv_kls": kl["idv_kls"]})

    dsc = L.compute_discriminator_losses(cfg, out["dsc_logits"],
                                         batch["labels"], mask)
    # dsc_loss_weight=0.0 reproduces the reference's vae_elbo manual edit
    # (L['total_dsc_loss'] = 0 in compute_all_losses): the logged total AND
    # the objective contribution are zeroed, per-head metrics still logged
    total_dsc = cfg.dsc_loss_weight * dsc["total_dsc_loss"]
    metrics.update({"total_dsc_loss": total_dsc,
                    "idv_dsc_losses": dsc["idv_dsc_losses"],
                    "idv_dsc_accs": dsc["idv_dsc_accs"]})

    total = recon + kl["total_weighted_kl"] + total_dsc

    if cfg.adversarial_loss:
        zs_det = {n: jax.lax.stop_gradient(lp[n].z)
                  for n in cfg.latent_names}
        adv_logits_det = adversary_logits(
            jax.lax.stop_gradient(params["adv"]), cfg, zs_det)
        adv = L.compute_adversarial_losses(
            cfg, out["adv_logits"], adv_logits_det, batch["labels"], mask)
        metrics.update({k: adv[k] for k in
                        ("total_adv_loss", "idv_adv_losses",
                         "idv_adv_dsc_losses", "idv_adv_dsc_accs")})
        total = total + adv["total_adv_loss"]
    else:
        metrics["total_adv_loss"] = jnp.asarray(0.0)

    if cfg.mi_loss:
        mi = L.compute_mi_losses(cfg, jax.lax.stop_gradient(params["mi"]),
                                 lp, mask, mi_weight,
                                 key=jax.random.fold_in(key, 7919))
        metrics.update({"total_mi": mi["total_mi"],
                        "idv_mi_estimates": mi["idv_mi_estimates"]})
        total = total + mi["total_mi"]
    else:
        metrics["total_mi"] = jnp.asarray(0.0)

    metrics["total_loss"] = total
    return total, (metrics, out)


def _latents_out(cfg: ModelConfig, lp) -> Dict[str, Dict[str, jnp.ndarray]]:
    return {name: {"z": lp[name].z, "mu": lp[name].mu,
                   "logvar": lp[name].logvar}
            for name in cfg.latent_names}


def make_train_step(cfg: ModelConfig, constants: Dict, learn_rate: float,
                    flat: bool = False):
    """Build the fused, jittable train step.

    Signature: step(state, batch, kl_weights_vec, tf_prob, mi_weight)
      -> (new_state, metrics, latents, token_predictions)
    `flat` must match the TrainState's (see make_optimizers).
    """
    mi_lr = 3e-5 if cfg.mi_estimator == "club_sample" else 5e-4
    opt_main, opt_adv, opt_mi = make_optimizers(learn_rate, mi_lr, flat)

    def train_step(state: TrainState, batch: Dict, kl_weights_vec,
                   tf_prob, mi_weight):
        key = jax.random.fold_in(state.rng, state.step)
        k_fwd, k_ae = jax.random.split(key)
        mask = batch["example_mask"]

        # ---- main gradients (adv/mi params shielded inside) ----
        def main_loss(main_params):
            p = {"main": main_params, "adv": state.params["adv"],
                 "mi": state.params["mi"]}
            return _all_losses(cfg, p, constants, batch, k_fwd, tf_prob,
                               kl_weights_vec, mi_weight, train=True)

        (_, (metrics, out)), g_main = jax.value_and_grad(
            main_loss, has_aux=True)(state.params["main"])
        upd_main, opt_main_state = opt_main.update(
            g_main, state.opt_main, state.params["main"])
        new_main = optax.apply_updates(state.params["main"], upd_main)

        lp = out["latent_params"]
        zs_det = {n: jax.lax.stop_gradient(lp[n].z) for n in cfg.latent_names}

        # ---- adversary gradients: CE over detached z, plus (in
        # "reference" mode) the negated-entropy gradient the reference
        # leaks into adversary weights via unzeroed grad accumulation
        # (run.py:254 + model.py:239-245; see config.adv_grad_mode) ----
        if cfg.adversarial_loss:
            def adv_loss(adv_params):
                logits = adversary_logits(adv_params, cfg, zs_det)
                tot = 0.0
                for ln, lab in cfg.adv_pairs:
                    name = f"{ln}-{lab}"
                    tot = tot + L._head_loss(logits[name],
                                             batch["labels"][lab], mask)
                    if cfg.adv_grad_mode == "reference":
                        tot = tot + L.adversarial_entropy_loss(logits[name],
                                                               mask)
                return tot
            g_adv = jax.grad(adv_loss)(state.params["adv"])
            upd_adv, opt_adv_state = opt_adv.update(
                g_adv, state.opt_adv, state.params["adv"])
            new_adv = optax.apply_updates(state.params["adv"], upd_adv)
        else:
            new_adv, opt_adv_state = state.params["adv"], state.opt_adv

        # ---- CLUB gradients: -loglikeli over detached z ----
        if cfg.mi_loss:
            def mi_loss(mi_params):
                per = L.compute_mi_learning_losses(cfg, mi_params, zs_det,
                                                   mask)
                return sum(per.values()), per
            (_, mi_per), g_mi = jax.value_and_grad(
                mi_loss, has_aux=True)(state.params["mi"])
            g_mi = _per_estimator_clip(g_mi, 1.0)
            upd_mi, opt_mi_state = opt_mi.update(
                g_mi, state.opt_mi, state.params["mi"])
            new_mi = optax.apply_updates(state.params["mi"], upd_mi)
            metrics["mi_estimator_loss"] = mi_per
        else:
            new_mi, opt_mi_state = state.params["mi"], state.opt_mi

        # ---- autoencoding drift: re-encode predictions w/ updated params
        #      (reference run.py:285-295; encode-only is sufficient) ----
        x_prime = out["token_predictions"]

        def ae_drift(_):
            new_main_c = cast_matmul_weights(new_main, cfg.compute_dtype)
            ctx2 = encode(new_main_c, constants, cfg, x_prime,
                          batch["lengths"], jax.random.fold_in(k_ae, 1),
                          train=True)
            lp2 = compute_latent_params(new_main_c, cfg, ctx2,
                                        jax.random.fold_in(k_ae, 2))
            denom = jnp.maximum(mask.sum(), 1.0)
            return {n: (jnp.linalg.norm(lp2[n].z - lp[n].z, axis=1)
                        * mask).sum() / denom
                    for n in cfg.latent_names}

        ae_every = max(1, cfg.ae_drift_every_n)
        if ae_every == 1:
            # reference parity: every step, and the exact round-4 program
            metrics["idv_ae"] = ae_drift(None)
        else:
            # config ae_drift_every_n: lax.cond skips the re-encode (~8%
            # of step FLOPs) off-stride. Skipped steps emit 0.0 -- the
            # driver drops those entries before logging, and 0.0 (not NaN)
            # keeps `debug_nans` runs clean.
            metrics["idv_ae"] = jax.lax.cond(
                state.step % ae_every == 0, ae_drift,
                lambda _: {n: jnp.zeros((), jnp.float32)
                           for n in cfg.latent_names},
                operand=None)

        # corpus-BLEU sufficient statistics on device (ops/device_bleu.py):
        # the host assembles the score from these 10 ints, so predictions
        # never need the device->host transfer the reference paid per step
        metrics["bleu_counts"] = bleu_counts(x_prime, batch["X"], mask,
                                             cfg.eos_idx)

        new_state = TrainState(
            params={"main": new_main, "adv": new_adv, "mi": new_mi},
            opt_main=opt_main_state, opt_adv=opt_adv_state,
            opt_mi=opt_mi_state,
            step=state.step + 1, rng=state.rng)
        return new_state, metrics, _latents_out(cfg, lp), x_prime

    return train_step


def make_train_epoch(cfg: ModelConfig, constants: Dict, learn_rate: float,
                     flat: bool = False, collect_latents: bool = True,
                     unroll: int = 1):
    """Whole-epoch fusion: ONE device program per epoch.

    The per-step fused train step is ~1 ms of compute, so a Python loop
    over steps is dominated by host dispatch (measured ~100x the compute
    on this host). This wraps the identical train step in a `lax.scan`
    over the epoch's stacked batches: the host uploads the epoch's data
    once ([S, B, ...] arrays, a few MB) and receives per-step metrics
    stacked on a leading step axis.

    Token predictions are NEVER a scan output: nothing downstream reads
    them (BLEU comes from the 10-int on-device sufficient statistics in
    metrics, ops/device_bleu.py), so stacking an [S, B, T] tensor in HBM
    would be pure waste. Per-step latents (z/mu/logvar per latent name,
    [S, B, dim]) feed the metadata logs the reference writes per epoch
    (run.py:166-194) -- but when `keep_latent_epochs` will prune this
    epoch's metadata anyway, the driver builds the program with
    `collect_latents=False` and the scan carries no latent outputs at all.

    `unroll` is passed through to `lax.scan` (config `epoch_scan_unroll`):
    >1 replicates the step body to amortize loop overhead, at the cost of
    compile time; S must stay divisible by it (lax.scan requirement is
    actually none -- XLA peels the remainder -- but the driver keeps S
    uniform anyway).

    Signature: epoch_fn(state, batches, klw_seq, tf_prob, mi_weight)
      batches: pytree with leading step axis S (stacked collated batches)
      klw_seq: [S, n_latents] per-step KL weight vectors
      -> (state, metrics_seq, latents_seq) stacked on S;
         latents_seq is None when collect_latents=False.
    """
    train_step = make_train_step(cfg, constants, learn_rate, flat)

    def epoch_fn(state: TrainState, batches: Dict, klw_seq, tf_prob,
                 mi_weight):
        def body(state, xs):
            batch, klw = xs
            state, metrics, latents, _preds = train_step(
                state, batch, klw, tf_prob, mi_weight)
            return state, (metrics, latents if collect_latents else None)

        state, (metrics_seq, latents_seq) = jax.lax.scan(
            body, state, (batches, klw_seq), unroll=unroll)
        return state, metrics_seq, latents_seq

    return epoch_fn


def make_eval_step(cfg: ModelConfig, constants: Dict):
    """Fused eval step (reference evalstep, run.py:347-423): tf_prob=0,
    dropout off, losses still include adversary/MI terms, z still sampled
    (quirk #1 preserved unless sample_z is disabled upstream)."""

    def eval_step(state: TrainState, batch: Dict, kl_weights_vec, mi_weight,
                  eval_seed):
        key = jax.random.fold_in(jax.random.PRNGKey(0), eval_seed)
        key = jax.random.fold_in(key, state.step)
        total, (metrics, out) = _all_losses(
            cfg, state.params, constants, batch, key,
            jnp.asarray(0.0), kl_weights_vec, mi_weight, train=False)
        metrics["bleu_counts"] = bleu_counts(
            out["token_predictions"], batch["X"], batch["example_mask"],
            cfg.eos_idx)
        return metrics, _latents_out(cfg, out["latent_params"]), \
            out["token_predictions"]

    return eval_step


def make_eval_epoch(cfg: ModelConfig, constants: Dict,
                    collect_latents: bool = True):
    """Whole-eval-epoch fusion: one device program scanning eval_step over
    the split's stacked batches (same rationale as make_train_epoch --
    including dropping predictions, and latents when the epoch's metadata
    will be pruned)."""
    eval_step = make_eval_step(cfg, constants)

    def epoch_fn(state: TrainState, batches: Dict, kl_weights_vec,
                 mi_weight, seeds):
        def body(_, xs):
            batch, seed = xs
            metrics, latents, _preds = eval_step(state, batch,
                                                 kl_weights_vec, mi_weight,
                                                 seed)
            return None, (metrics, latents if collect_latents else None)

        _, (metrics_seq, latents_seq) = jax.lax.scan(
            body, None, (batches, seeds))
        return metrics_seq, latents_seq

    return epoch_fn
