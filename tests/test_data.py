"""Data-layer tests: tokenizer, labels, vocab, samplers, pipeline.

Tokenizer cases are pinned to the reference regex behavior
(reference vae/data_utils.py:262-279)."""

import json
import os

import numpy as np
import pytest

from dvae_tpu.data import (DenoisingTextDataset, LabelCodec,
                           RatioBatchSampler, ShuffleBatchSampler,
                           build_vocab, fit_label_codecs, encode_labels,
                           get_sentences_labels, preprocess_sentences,
                           reverse_sentences)
from dvae_tpu.data.pipeline import BatchPipeline, collate
from dvae_tpu.data.vocab import make_word2idx


def test_tokenizer_reference_behavior():
    sents = ["I don't know!", "It's 100% great?", "  Hello,   world.  "]
    out = preprocess_sentences(sents, "<SOS>", "<EOS>", lowercase=True)
    # "don't" -> "do n't"; punctuation [.!?] split; digits/percent stripped
    assert out[0] == ["<SOS>", "i", "do", "n't", "know", "!", "<EOS>"]
    assert out[1] == ["<SOS>", "it's", "great", "?", "<EOS>"]
    assert out[2] == ["<SOS>", "hello", "world", ".", "<EOS>"]


def test_tokenizer_no_sos_eos_and_case():
    out = preprocess_sentences(["AbC dEf"], None, None, lowercase=False)
    assert out[0] == ["AbC", "dEf"]


def test_reverse_sentences():
    assert reverse_sentences([["a", "b", "c"]]) == [["c", "b", "a"]]


def test_label_codec_deterministic_and_reused():
    train = [{"polarity": "positive"}, {"polarity": "negative"},
             {"polarity": "positive"}]
    codecs = fit_label_codecs(train)
    assert codecs["polarity"].classes == ("negative", "positive")
    enc = encode_labels(train, codecs)
    assert enc["polarity"].tolist() == [1, 0, 1]
    # reuse on dev: same mapping even if only one class appears
    dev = [{"polarity": "positive"}]
    assert encode_labels(dev, codecs)["polarity"].tolist() == [1]
    with pytest.raises(ValueError):
        encode_labels([{"polarity": "unknown"}], codecs)


def test_binary_collapses_to_one_dim():
    codecs = fit_label_codecs([{"a": 0}, {"a": 1}, {"b": 1}, {"b": 2},
                               {"b": 3}])
    assert codecs["a"].output_dim == 1
    assert codecs["b"].output_dim == 3


def test_vocab_contract():
    docs = [["<SOS>", "b", "a", "<EOS>"], ["<SOS>", "c", "a", "<EOS>"]]
    vocab = build_vocab(docs)
    assert vocab[:2] == ["<PAD>", "<UNK>"]
    assert vocab[2:] == sorted({"<SOS>", "<EOS>", "a", "b", "c"})


def _make_jsonl(tmp_path, rows):
    p = os.path.join(tmp_path, "data.jsonl")
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return p


def test_get_sentences_labels(tmp_path):
    rows = [{"id": f"i{k}", "sentence": f"s {k}", "polarity": k % 2,
             "extra": "x"} for k in range(10)]
    p = _make_jsonl(tmp_path, rows)
    sents, labs, ids, counts = get_sentences_labels(
        p, label_keys=["polarity"], shuffle=False)
    assert len(sents) == 10 and labs[3] == {"polarity": 1}
    assert counts["polarity"][0] == 5
    sents, labs, ids, _ = get_sentences_labels(
        p, label_keys=["polarity"], N=4, shuffle=False)
    assert len(sents) == 4 and ids == ["i0", "i1", "i2", "i3"]


def _toy_dataset(n=10, max_length=None):
    docs = [["<SOS>"] + ["tok"] * (1 + i % 4) + ["<EOS>"] for i in range(n)]
    labels = [{"polarity": i % 2} for i in range(n)]
    ids = [f"id{i}" for i in range(n)]
    vocab = build_vocab(docs)
    codecs = fit_label_codecs(labels)
    return DenoisingTextDataset(docs, docs, labels, ids,
                                make_word2idx(vocab), codecs,
                                max_length=max_length)


def test_dataset_shapes_and_lookup():
    ds = _toy_dataset(10)
    assert ds.X.shape == (10, 6)  # longest doc: SOS + 4 toks + EOS = 6
    assert ds.max_length == 6
    assert ds.lengths.tolist()[:4] == [3, 4, 5, 6]
    noisy, x, y, uid = ds.get_by_id("id3")
    assert uid == "id3" and y["polarity"] == 1
    assert ds.y_dims == {"polarity": 1}


def test_collate_partial_batch():
    ds = _toy_dataset(5)
    b = collate(ds, np.array([0, 1, 2]), batch_size=4)
    assert b.X.shape == (4, ds.max_length)
    assert b.example_mask.tolist() == [1.0, 1.0, 1.0, 0.0]
    assert b.ids == ["id0", "id1", "id2"]
    # padded row is a copy of row 0
    assert b.X[3].tolist() == b.X[0].tolist()


def test_shuffle_sampler_covers_everything():
    s = ShuffleBatchSampler(n=10, batch_size=4, seed=0)
    assert len(s) == 3
    batches = s.epoch_batches()
    assert sorted(np.concatenate(batches).tolist()) == list(range(10))
    assert [len(b) for b in batches] == [4, 4, 2]


def test_ratio_sampler_quotas_and_oversampling():
    # 12 examples from source "big", 3 from "small"; 50/50 ratio, batch 8
    labels = ([{"src": "big"}] * 12) + ([{"src": "small"}] * 3)
    s = RatioBatchSampler(labels, split_key="src",
                          ratios={"big": 0.5, "small": 0.5},
                          batch_size=8, seed=0)
    # group size 4 each; big has 12 -> 3 chunks; small tiled to 12 -> 3 chunks
    assert len(s) == 3
    batches = s.epoch_batches()
    assert len(batches) == 3
    for b in batches:
        srcs = [labels[i]["src"] for i in b]
        assert srcs.count("big") == 4 and srcs.count("small") == 4
    # all big indices seen exactly once; small indices tiled (0,1,2 repeated)
    big_seen = sorted(i for b in batches for i in b if i < 12)
    assert big_seen == list(range(12))


def test_ratio_sampler_partial_last_chunk():
    # big has 10, group size 4 -> chunks [4,4,2]; epoch = 3 batches,
    # last batch is partial (reference zip_longest fill dropped).
    labels = ([{"src": "a"}] * 10) + ([{"src": "b"}] * 10)
    s = RatioBatchSampler(labels, split_key="a" and "src",
                          ratios={"a": 0.5, "b": 0.5}, batch_size=8, seed=1)
    batches = s.epoch_batches()
    assert len(batches) == 3
    assert [len(b) for b in batches] == [8, 8, 4]


def test_pipeline_epoch():
    ds = _toy_dataset(10)
    s = ShuffleBatchSampler(n=10, batch_size=4, seed=1)
    pipe = BatchPipeline(ds, s, batch_size=4)
    batches = list(pipe.epoch())
    assert len(batches) == 3
    seen = [i for b in batches for i in b.ids]
    assert sorted(seen) == sorted(ds.ids)
    assert all(b.X.shape == (4, ds.max_length) for b in batches)
