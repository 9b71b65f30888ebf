"""Fixture test for the five-variant sweep summarizer: multi-seed pooling
of MIG draws, aligned-top accounting, and the emitted JSON shape
(scripts/experiments/summarize_five_variants.py)."""

import importlib
import json
import os

import numpy as np


def _write_migs(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for i, (mig_pol, top_pol) in enumerate(rows):
            f.write(json.dumps({
                "sample_num": i,
                "polarity": {"MIG": mig_pol,
                             "sorted_latents": [top_pol, "content"],
                             "sorted_MIs": [0.5, 0.5 - mig_pol]},
            }) + "\n")


def test_multi_seed_pooling(tmp_path, monkeypatch):
    mod = importlib.import_module(
        "scripts.experiments.summarize_five_variants")
    base = tmp_path / "logs"
    out = tmp_path / "out"
    monkeypatch.setattr(mod, "BASE", str(base))
    monkeypatch.setattr(mod, "OUTDIR", str(out))
    monkeypatch.setattr(mod, "VARIANTS", ["vae_a", "vae_b"])
    monkeypatch.setattr(mod, "SEED_SUFFIXES", ["", "_s20"])

    # vae_a: base seed 2 draws (0.1 aligned, 0.3 not), s20 2 draws
    # (0.5 aligned, 0.7 aligned) -> pooled mean 0.4, aligned 3/4
    _write_migs(f"{base}/vae_a/evaluation/MIGS_dev.jsonl",
                [(0.1, "polarity"), (0.3, "content")])
    _write_migs(f"{base}/vae_a_s20/evaluation/MIGS_dev.jsonl",
                [(0.5, "polarity"), (0.7, "polarity")])
    # vae_b: only the base seed exists (sweep still running) -> n=2
    _write_migs(f"{base}/vae_b/evaluation/MIGS_dev.jsonl",
                [(0.2, "content"), (0.4, "content")])

    mod.main([])  # no CLI args: the monkeypatched globals are the defaults

    got = json.load(open(out / "five_variant_migs.json"))
    a = got["pooled"]["vae_a"]["polarity"]
    assert a["n"] == 4
    np.testing.assert_allclose(a["mig_mean"], 0.4)
    np.testing.assert_allclose(a["aligned_top_frac"], 0.75)
    b = got["pooled"]["vae_b"]["polarity"]
    assert b["n"] == 2 and b["aligned_top_frac"] == 0.0
    assert got["by_seed"]["vae_a"]["seeds"] == ["base", "_s20"]
    assert got["by_seed"]["vae_b"]["seeds"] == ["base"]
    # per-seed means recorded per label
    np.testing.assert_allclose(
        got["by_seed"]["vae_a"]["per_seed_mig_means"]["polarity"],
        [0.2, 0.6])
    assert (out / "five_variant_migs.png").exists()


def test_guard_checks_requested_seeds_only(tmp_path, monkeypatch):
    """Regression: a seed-only invocation (--seeds _s20) must not demand
    the unseeded base dirs, and a variant with NO file under any
    requested suffix must abort with the variant named."""
    import pytest

    mod = importlib.import_module(
        "scripts.experiments.summarize_five_variants")
    base = tmp_path / "logs"
    out = tmp_path / "out"
    monkeypatch.setattr(mod, "VARIANTS", ["vae_a", "vae_b"])

    # only seed dirs exist -- no base-seed files anywhere
    _write_migs(f"{base}/vae_a_s20/evaluation/MIGS_dev.jsonl",
                [(0.5, "polarity")])
    _write_migs(f"{base}/vae_b_s20/evaluation/MIGS_dev.jsonl",
                [(0.2, "content")])
    mod.main(["--base", str(base), "--outdir", str(out),
              "--seeds", "_s20"])
    got = json.load(open(out / "five_variant_migs.json"))
    assert got["pooled"]["vae_a"]["polarity"]["n"] == 1

    # vae_b has no file under the requested suffix -> named abort
    with pytest.raises(SystemExit, match="vae_b"):
        mod.main(["--base", str(base), "--outdir", str(out),
                  "--seeds", "_s30"])
