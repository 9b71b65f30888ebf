"""Interactive / programmatic inference: encode, reconstruct, sample,
difference, transfer (capability match for reference inspect_model.py).

All model math runs through jitted fns with fixed shapes (pad-to-max
single-sentence batches), so a REPL session compiles each program once.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dvae_tpu.config import load_config
from dvae_tpu.data.text import preprocess_sentences
from dvae_tpu.models import (compute_latent_params, concat_z, encode,
                             predict_from_logits, sample)
from dvae_tpu.models.layers import linear
from dvae_tpu.training.checkpoint import load_latest_checkpoint
from dvae_tpu.training.driver import Experiment
from dvae_tpu.training.step import create_train_state
from dvae_tpu.utils import tensor2text


class InferenceSession:
    """Loads config + vocab + latest checkpoint and exposes the inspection
    commands (reference inspect_model.py:29-67, 133-247)."""

    def __init__(self, params_file: str, max_sample_length: int = 30):
        params = load_config(params_file)
        self.params = params
        self.exp = Experiment(params, require_vocab_file=True)
        self.cfg = self.exp.cfg
        self.max_sample_length = max_sample_length

        from dvae_tpu.config import flat_optimizer_enabled
        state = create_train_state(self.exp.init_params,
                                   params["learn_rate"],
                                   params["random_seed"],
                                   flat=flat_optimizer_enabled(params))
        state, _, ckpt_name = load_latest_checkpoint(state,
                                                     self.exp.ckpt_dir)
        if ckpt_name is None:
            raise OSError(
                f"No checkpoint found at '{self.exp.ckpt_dir}'!")
        self.ckpt_name = ckpt_name
        self.state = state
        self._key = jax.random.PRNGKey(params["random_seed"] + 99)

        cfg, constants = self.cfg, self.exp.constants

        def _encode(main, tokens, lengths, seed):
            key = jax.random.fold_in(jax.random.PRNGKey(7), seed)
            return encode(main, constants, cfg, tokens, lengths, key,
                          train=False)

        def _latent(main, context, seed):
            key = jax.random.fold_in(jax.random.PRNGKey(11), seed)
            lp = compute_latent_params(main, cfg, context, key)
            return {n: {"z": lp[n].z, "mu": lp[n].mu,
                        "logvar": lp[n].logvar} for n in cfg.latent_names}

        def _sample(main, z, seed):
            key = jax.random.fold_in(jax.random.PRNGKey(13), seed)
            return sample(main, constants, cfg, z, key,
                          max_length=max_sample_length,
                          train=False)["token_predictions"]

        def _dsc(main, name, z):
            return linear(z, main["dsc"][name], cfg.compute_dtype)

        self._encode_fn = jax.jit(_encode)
        self._latent_fn = jax.jit(_latent)
        self._sample_fn = jax.jit(_sample)
        self._dsc_fn = {n: jax.jit(lambda m, z, n=n: _dsc(m, n, z))
                        for n in cfg.dsc_names}

    # ---- primitives ----
    def _next_seed(self) -> int:
        self._key, k = jax.random.split(self._key)
        return int(jax.random.randint(k, (), 0, 2 ** 30))

    def encode_context(self, sentence: str) -> jnp.ndarray:
        doc = preprocess_sentences([sentence], "<SOS>", "<EOS>",
                                   lowercase=self.params["lowercase"])[0]
        ids = self.exp.datasets["train"].doc2array(doc)
        T = max(self.cfg.max_length, len(ids))
        tokens = np.zeros((1, T), np.int32)
        tokens[0, :len(ids)] = ids
        lengths = np.asarray([len(ids)], np.int32)
        return self._encode_fn(self.state.params["main"],
                               jnp.asarray(tokens), jnp.asarray(lengths),
                               jnp.asarray(self._next_seed()))

    def latents(self, context) -> Dict[str, Dict[str, np.ndarray]]:
        out = self._latent_fn(self.state.params["main"], context,
                              jnp.asarray(self._next_seed()))
        return jax.device_get(out)

    def decode_z(self, z) -> List[str]:
        preds = np.asarray(self._sample_fn(
            self.state.params["main"], jnp.asarray(z),
            jnp.asarray(self._next_seed())))
        return tensor2text(preds[0], self.exp.idx2word, self.cfg.eos_idx)

    def discriminator_prediction(self, name: str, z) -> Optional[int]:
        if name not in self.cfg.dsc_names:
            return None
        logits = self._dsc_fn[name](self.state.params["main"],
                                    jnp.asarray(z))
        return int(np.asarray(predict_from_logits(logits)).reshape(-1)[0])

    def _concat(self, zs: Dict[str, np.ndarray]) -> np.ndarray:
        return np.concatenate([np.asarray(zs[n])
                               for n in self.cfg.latent_names], axis=-1)

    # ---- commands (reference inspect_model.py:133-247) ----
    def reconstruct(self, sentence: str, n: int = 1,
                    latent_values: Optional[Dict[str, float]] = None):
        latent_values = latent_values or {}
        context = self.encode_context(sentence)
        all_tokens, all_zs = [], []
        for _ in range(n):
            lp = self.latents(context)
            zs = {name: lp[name]["z"] for name in self.cfg.latent_names}
            for name, val in latent_values.items():
                if name in zs:
                    zs[name] = np.full_like(zs[name], val)
            all_zs.append(zs)
            toks = self.decode_z(self._concat(zs))[1:-1]
            all_tokens.append(toks)
        return all_tokens, all_zs

    def sample_prior(self, n: int, pins: Optional[Dict[str, float]] = None):
        """Sample z ~ N(0, I) per latent, optionally pinning named scalar
        latents (reference --polz/--uncz, inspect_model.py:153-184)."""
        pins = pins or {}
        rng = np.random.default_rng(self._next_seed())
        all_tokens, all_zs = [], []
        for _ in range(n):
            zs = {}
            for name, dim in zip(self.cfg.latent_names,
                                 self.cfg.latent_dims):
                if name in pins and pins[name] is not None:
                    zs[name] = np.full((1, dim), pins[name], np.float32)
                else:
                    zs[name] = rng.standard_normal((1, dim)).astype(
                        np.float32)
            all_zs.append(zs)
            all_tokens.append(self.decode_z(self._concat(zs))[1:-1])
        return all_tokens, all_zs

    def difference(self, sentence1: str, sentence2: str, n: int = 1):
        c1 = self.encode_context(sentence1)
        c2 = self.encode_context(sentence2)
        diffs = []
        for _ in range(n):
            z1 = self._concat({k: v["z"]
                               for k, v in self.latents(c1).items()})
            z2 = self._concat({k: v["z"]
                               for k, v in self.latents(c2).items()})
            diffs.append(z1 - z2)
        return diffs

    def encode_many(self, sentence: str, n: int = 1):
        context = self.encode_context(sentence)
        return [self._concat({k: v["z"]
                              for k, v in self.latents(context).items()})
                for _ in range(n)]

    def transfer(self, source: str, target: str, latent_names: List[str],
                 n: int = 1):
        src_c = self.encode_context(source)
        trg_c = self.encode_context(target)
        all_tokens, all_zs = [], []
        for _ in range(n):
            src = {k: v["z"] for k, v in self.latents(src_c).items()}
            trg = {k: v["z"] for k, v in self.latents(trg_c).items()}
            for name in latent_names or []:
                if name in trg:
                    trg[name] = src[name]
            all_zs.append(trg)
            all_tokens.append(self.decode_z(self._concat(trg))[1:-1])
        return all_tokens, all_zs

    def interpolate(self, sentence1: str, sentence2: str, latent_name: str,
                    steps: int = 5):
        """Linear interpolation in one latent between two sentences,
        decoding each waypoint. (The reference declared this command but
        left it NotImplementedError -- inspect_model.py:246-247; here it
        works.)"""
        c1 = self.encode_context(sentence1)
        c2 = self.encode_context(sentence2)
        l1 = {k: v["z"] for k, v in self.latents(c1).items()}
        l2 = {k: v["z"] for k, v in self.latents(c2).items()}
        all_tokens, all_zs = [], []
        for i in range(steps + 1):
            t = i / steps
            zs = dict(l1)
            zs[latent_name] = (1 - t) * l1[latent_name] \
                + t * l2[latent_name]
            all_zs.append(zs)
            all_tokens.append(self.decode_z(self._concat(zs))[1:-1])
        return all_tokens, all_zs
