"""Device-side BLEU sufficient statistics must reproduce the host
implementation (utils/bleu.py, torchtext semantics) exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from dvae_tpu.ops.device_bleu import bleu_counts, bleu_from_counts
from dvae_tpu.utils import compute_bleu
from dvae_tpu.utils.bleu import bleu_score
from dvae_tpu.utils.misc import tensor2text

EOS = 3
SOS = 2
PAD = 0


def random_batch(rng, B, T, V, eos_prob=0.9, degenerate=False):
    X = rng.integers(4, V, size=(B, T)).astype(np.int32)
    P = rng.integers(4, V, size=(B, T)).astype(np.int32)
    X[:, 0] = SOS
    P[:, 0] = SOS
    for b in range(B):
        if rng.random() < eos_prob:
            e = int(rng.integers(1, T))
            X[b, e] = EOS
            X[b, e + 1:] = PAD
        if rng.random() < eos_prob:
            e = int(rng.integers(1, T))
            P[b, e] = EOS
            P[b, e + 1:] = PAD
    if degenerate:
        # identical rows, empty candidates, EOS at position 1
        P[0] = X[0]
        P[1, 1] = EOS
        X[2, 1] = EOS
    return X, P


def host_bleu(X, P, mask):
    idx2word = {i: f"w{i}" for i in range(50)}
    keep = mask.astype(bool)
    return compute_bleu(X[keep], P[keep], idx2word, EOS)


def test_device_counts_match_host_bleu():
    rng = np.random.default_rng(0)
    for trial in range(8):
        B, T = 16, 12
        X, P = random_batch(rng, B, T, V=10 if trial % 2 else 40,
                            degenerate=(trial % 3 == 0))
        mask = np.ones(B, np.float32)
        mask[-3:] = 0.0  # padded rows must not contribute
        counts = jax.jit(bleu_counts, static_argnums=(3,))(
            jnp.asarray(P), jnp.asarray(X), jnp.asarray(mask), EOS)
        got = bleu_from_counts(jax.device_get(counts))
        want = host_bleu(X, P, mask)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12), trial


def test_device_counts_raw_statistics():
    """Cross-check the raw clipped/total integers against a direct
    recount via the host n-gram path."""
    rng = np.random.default_rng(1)
    X, P = random_batch(rng, 8, 10, V=8)  # tiny vocab -> many repeats
    mask = np.ones(8, np.float32)
    counts = jax.device_get(bleu_counts(
        jnp.asarray(P), jnp.asarray(X), jnp.asarray(mask), EOS))
    idx2word = {i: f"w{i}" for i in range(50)}
    cands = [tensor2text(p, idx2word, EOS)[1:-1] for p in P]
    refs = [[tensor2text(x, idx2word, EOS)[1:-1]] for x in X]
    from collections import Counter
    for n in range(1, 5):
        clipped = 0
        total = 0
        for cand, (ref,) in zip(cands, refs):
            cc = Counter(tuple(cand[i:i + n])
                         for i in range(len(cand) - n + 1))
            rc = Counter(tuple(ref[i:i + n])
                         for i in range(len(ref) - n + 1))
            clipped += sum(min(c, rc[g]) for g, c in cc.items())
            total += max(len(cand) - n + 1, 0)
        assert counts["clipped"][n - 1] == clipped, n
        assert counts["total"][n - 1] == total, n
    assert counts["cand_len"] == sum(len(c) for c in cands)
    assert counts["refs_len"] == sum(len(r[0]) for r in refs)


def test_bleu_from_counts_zero_rule():
    c = {"clipped": [3, 0, 0, 0], "total": [5, 4, 3, 2],
         "cand_len": 5, "refs_len": 5}
    assert bleu_from_counts(c) == 0.0
    # identical corpora -> BLEU 1.0
    toks = [["a", "b", "c", "d", "e"]]
    assert abs(bleu_score(toks, [[toks[0]]]) - 1.0) < 1e-12
