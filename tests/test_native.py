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


def test_write_csv_f32_byte_identical_to_savetxt(tmp_path):
    """The native CSV formatter must be byte-for-byte what np.savetxt
    (fmt='%.4f', delimiter=',') produces -- the metadata artifact contract
    the evaluation suite parses (reference run.py:166-194)."""
    if not native.csv_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    scales = 10.0 ** rng.integers(-6, 6, (500, 1)).astype(np.float32)
    arr = np.concatenate([
        (rng.standard_normal((500, 5)).astype(np.float32) * scales),
        np.array([[0.0, -0.0, 1e-9, -1e-9, np.float32(0.00005)],
                  [123456.789, -3.14159, np.inf, -np.inf, 42.0]],
                 np.float32),
    ]).astype(np.float32)
    p_native = tmp_path / "native.csv"
    p_numpy = tmp_path / "numpy.csv"
    assert native.write_csv_f32(str(p_native), arr)
    np.savetxt(p_numpy, arr, fmt="%.4f", delimiter=",")
    assert p_native.read_bytes() == p_numpy.read_bytes()
