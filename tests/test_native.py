"""Native tokenizer/encoder parity vs the Python pipeline."""

import numpy as np
import pytest

from dvae_tpu.data import native
from dvae_tpu.data.text import preprocess_sentences
from dvae_tpu.data.vocab import build_vocab, make_word2idx

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")

CORPUS = [
    "I don't know!",
    "It's 100% great?",
    "  Hello,   world.  ",
    "CAN'T won't SHAN'T",
    "ellipsis... and--dashes",
    "unicode café naïve — em-dash",
    "n't at the start",
    "",
    "a.b!c?d",
]


def test_tokenize_parity_lowercase():
    want = preprocess_sentences(CORPUS, None, None, lowercase=True)
    got = native.tokenize_corpus(CORPUS, lowercase=True)
    assert got == want


def test_tokenize_parity_no_lowercase():
    want = preprocess_sentences(CORPUS, None, None, lowercase=False)
    got = native.tokenize_corpus(CORPUS, lowercase=False)
    assert got == want


def test_encode_parity():
    docs = preprocess_sentences(CORPUS, "<SOS>", "<EOS>", lowercase=True)
    vocab = build_vocab(docs[:5])  # some docs contribute OOV tokens
    w2i = make_word2idx(vocab)
    nv = native.NativeVocab(vocab)
    max_len = max(len(d) for d in docs) + 2
    ids, lengths = nv.encode(CORPUS, True, w2i["<SOS>"], w2i["<EOS>"],
                             w2i["<UNK>"], w2i["<PAD>"], max_len)
    assert ids.shape == (len(CORPUS), max_len)
    for i, doc in enumerate(docs):
        assert lengths[i] == len(doc)
        want = [w2i.get(t, w2i["<UNK>"]) for t in doc]
        assert ids[i, :len(doc)].tolist() == want
        assert np.all(ids[i, len(doc):] == w2i["<PAD>"])


def test_encode_overflow_raises():
    nv = native.NativeVocab(["<PAD>", "<UNK>", "<SOS>", "<EOS>", "a"])
    with pytest.raises(ValueError, match="exceeds max_len"):
        nv.encode(["a a a a a a"], True, 2, 3, 1, 0, 4)


def test_large_corpus_roundtrip():
    rng = np.random.default_rng(0)
    words = ["alpha", "beta", "don't", "gamma!", "x.y", "café"]
    corpus = [" ".join(rng.choice(words, size=rng.integers(1, 10)))
              for _ in range(2000)]
    want = preprocess_sentences(corpus, None, None, lowercase=True)
    got = native.tokenize_corpus(corpus, lowercase=True)
    assert got == want
