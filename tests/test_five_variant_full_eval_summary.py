"""Fixture test for the five-variant FULL-eval summarizer (consistency /
controlled generation / attribute transfer / PPL cross-variant table,
scripts/experiments/summarize_five_variant_full_eval.py): accuracy math
from the raw artifacts, tolerance of missing variants, and the emitted
JSON/markdown shape."""

import importlib
import json
import os

import numpy as np


def _write_variant(vdir):
    os.makedirs(vdir, exist_ok=True)
    # consistency: 2 rows per (pair) -> known F1 means
    with open(os.path.join(vdir, "decoder_predictions_dev.csv"), "w") as f:
        f.write("batch,sample_num,label,true,pred,precision,recall,F1\n")
        for b, f1 in [(0, 0.4), (1, 0.6)]:
            f.write(f"{b},0,polarity,y,y_hat,0.5,0.5,{f1}\n")
        for b, f1 in [(0, 0.8), (1, 1.0)]:
            f.write(f"{b},0,polarity,y_hat,y_hat_prime,0.5,0.5,{f1}\n")
    with open(os.path.join(vdir, "self_bleus_dev.csv"), "w") as f:
        f.write("batch,sample_num,BLEU\n0,0,0.1\n1,0,0.3\n")
    # controlled generation: polarity transferred -- 1 of 2 hits target,
    # uncertainty retained on 2 of 2
    with open(os.path.join(vdir, "controlled_dev.csv"), "w") as f:
        for hit in [True, False]:
            f.write(json.dumps({
                "transferred_latent": "polarity",
                "input": "a", "output": "b",
                "predictions": {
                    "polarity": {"target": "neg",
                                 "output": "neg" if hit else "pos"},
                    "uncertainty": {"target": "cert", "output": "cert"},
                }}) + "\n")
    # attribute transfer: 2 of 2 hit, other label retained 1 of 2
    with open(os.path.join(vdir, "transfer_dev.csv"), "w") as f:
        for keep in [1, 0]:
            f.write(json.dumps({
                "latent": "polarity", "target": "a", "source": "b",
                "transferred": "c",
                "predictions": {
                    "polarity": {"true": 1, "pred": 1},
                    "uncertainty": {"true": 0, "pred": 1 - keep},
                }}) + "\n")
    with open(os.path.join(vdir, "predict_ntokens_dev.txt"), "w") as f:
        f.write("Predicting n_tokens from latents (dev, epoch 19); N=10\n"
                "  content                R^2 = 0.9100\n"
                "  polarity               R^2 = 0.0100\n"
                "  content+polarity       R^2 = 0.9200\n"
                "Per-dimension R^2 (content):\n"
                "  dim 0   R^2 = 0.5\n")
    with open(os.path.join(vdir, "ppl_reconstructions.jsonl.ppl.json"),
              "w") as f:
        json.dump({"estimator": "kn3",
                   "dev": {"original_ppl": 100.0,
                           "reconstruction_ppl": 200.0,
                           "original_unk": 0, "reconstruction_unk": 0}}, f)


def test_full_eval_summary(tmp_path, monkeypatch, capsys):
    mod = importlib.import_module(
        "scripts.experiments.summarize_five_variant_full_eval")
    out = tmp_path / "study"
    monkeypatch.setattr(mod, "OUTDIR", str(out))
    monkeypatch.setattr(mod, "VARIANTS", ["vae_x", "vae_missing"])
    _write_variant(str(out / "vae_x"))  # vae_missing: no artifacts at all

    mod.main()

    got = json.load(open(out / "full_eval_summary.json"))
    x = got["vae_x"]
    np.testing.assert_allclose(
        x["consistency"]["polarity"]["y~y_hat"]["mean"], 0.5)
    np.testing.assert_allclose(
        x["consistency"]["polarity"]["y_hat~y_hat_prime"]["mean"], 0.9)
    np.testing.assert_allclose(x["consistency"]["self_bleu"]["mean"], 0.2)
    cg = x["controlled_generation"]["polarity"]
    np.testing.assert_allclose(cg["transfer_acc"], 0.5)
    np.testing.assert_allclose(cg["retain_acc"], 1.0)
    at = x["attribute_transfer"]["polarity"]
    np.testing.assert_allclose(at["transfer_acc"], 1.0)
    np.testing.assert_allclose(at["retain_acc"], 0.5)
    assert x["perplexity"]["dev_original"] == 100.0
    lr = x["length_regression"]
    assert lr == {"content": 0.91, "polarity": 0.01,
                  "content+polarity": 0.92}  # per-dim section excluded

    m = got["vae_missing"]
    assert all(v is None for v in m.values())

    md = open(out / "full_eval_summary.md").read()
    assert "| vae_x | 0.500 | 0.900 |" in md
    assert "| vae_missing | -- | -- |" in md
    assert "| vae_x | 100.0 | 200.0 |" in md
    # R^2 columns are derived from the measured combinations (sorted):
    # content, content+polarity, polarity — no phantom uncertainty column.
    assert "| variant | content | content+polarity | polarity |" in md
    assert "| vae_x | 0.910 | 0.920 | 0.010 |" in md


def test_no_artifacts_yields_wellformed_markdown(tmp_path, monkeypatch,
                                                 capsys):
    """With zero artifacts (e.g. a sweep crashed before any stage), the
    markdown must not emit tables whose header/separator cell counts
    disagree (which renderers refuse to draw)."""
    mod = importlib.import_module(
        "scripts.experiments.summarize_five_variant_full_eval")
    out = tmp_path / "empty_study"
    monkeypatch.setattr(mod, "OUTDIR", str(out))
    monkeypatch.setattr(mod, "VARIANTS", ["vae_a"])
    os.makedirs(out, exist_ok=True)

    mod.main()

    md = open(out / "full_eval_summary.md").read()
    assert "(no consistency artifacts yet)" in md
    assert "(no controlled_generation artifacts yet)" in md
    for line in md.splitlines():
        if line.startswith("|---"):
            # the row above a separator is its header: cell counts match
            hdr = md.splitlines()[md.splitlines().index(line) - 1]
            assert hdr.count("|") == line.count("|")
