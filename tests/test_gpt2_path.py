"""Execute the GPT-2 perplexity path end-to-end with a tiny
randomly-initialized model (reference compute_ppl.py:70-95 semantics).

The real HF gpt2 weights cannot be downloaded on this zero-egress host,
so the path had only ever been probe-tested. A 2-layer random GPT-2 plus
a byte-level BPE tokenizer trained on the fly exercises the actual
scoring loop (tokenize, sliding window, nll accumulation, exp) and the
DVAE_GPT2_MODEL local-path override that air-gapped users need."""

import json

import numpy as np
import pytest

SENTS = ["i do not like this book",
         "the book was great",
         "it is not certain the movie will be good"]


@pytest.fixture(scope="module")
def tiny_gpt2_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tiny_gpt2"))
    from tokenizers.implementations import ByteLevelBPETokenizer
    from transformers import GPT2Config, GPT2LMHeadModel
    bpe = ByteLevelBPETokenizer()
    bpe.train_from_iterator(SENTS * 10, vocab_size=400, min_frequency=1)
    bpe.save_model(d)
    import torch
    torch.manual_seed(0)
    cfg = GPT2Config(vocab_size=400, n_positions=64, n_ctx=64,
                     n_embd=32, n_layer=2, n_head=2)
    GPT2LMHeadModel(cfg).save_pretrained(d)
    return d


def test_gpt2_ppl_executes(tiny_gpt2_dir, monkeypatch):
    monkeypatch.setenv("DVAE_GPT2_MODEL", tiny_gpt2_dir)
    from dvae_tpu.evaluation.ppl import gpt2_available, gpt2_ppl
    assert gpt2_available()
    ppl = gpt2_ppl(SENTS, stride=16)
    assert np.isfinite(ppl) and ppl > 1.0
    # deterministic for fixed weights/inputs
    assert gpt2_ppl(SENTS, stride=16) == ppl
    # stride shorter than the context window still covers every token
    ppl8 = gpt2_ppl(SENTS, stride=8)
    assert np.isfinite(ppl8) and ppl8 > 1.0


def test_gpt2_unavailable_without_override(monkeypatch):
    """On this host the hub cache has no real gpt2; the probe must say
    so (False) rather than raise, which is what routes compute_ppl to
    the KN fallback."""
    monkeypatch.delenv("DVAE_GPT2_MODEL", raising=False)
    from dvae_tpu.evaluation.ppl import gpt2_available
    assert gpt2_available() is False


def test_rescore_under_gpt2_style_contract(tiny_gpt2_dir, tmp_path,
                                           monkeypatch):
    """The .ppl.json contract holds across estimators: rescore a saved
    reconstruction log with the KN fallback and check the same key set
    the GPT-2 path writes (estimator + per-split rows)."""
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    with open(data_dir / "train.jsonl", "w") as f:
        for i, s in enumerate(SENTS * 5):
            f.write(json.dumps({"id": str(i), "sentence": s}) + "\n")
    log = tmp_path / "recons.jsonl"
    with open(log, "w") as f:
        for s in SENTS:
            f.write(json.dumps({"dataset": "dev", "sentence": s,
                                "reconstruction": s}) + "\n")
    from dvae_tpu.evaluation.model_evals import rescore_ppl
    res = rescore_ppl(str(data_dir), str(log))
    assert res["estimator"] == "kn3"
    assert np.isfinite(res["dev"]["original_ppl"])
    on_disk = json.load(open(str(log) + ".ppl.json"))
    assert on_disk["dev"]["original_ppl"] == res["dev"]["original_ppl"]
