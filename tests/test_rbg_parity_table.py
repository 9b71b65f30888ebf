"""Fixture test for the rbg-certification table generator
(scripts/experiments/rbg_parity_table.py): MIG aggregation over the
MIGS jsonl, summary-table accuracy parsing (both the controlled P/R/F/
Acc and transfer Accuracy layouts), self-BLEU pooling, and the PPL
rows, end to end into the emitted markdown."""

import importlib
import json
import os
import sys


def _write_migs(path, draws):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for i, mig in enumerate(draws):
            f.write(json.dumps({
                "sample_num": i,
                "polarity": {"MIG": mig,
                             "sorted_latents": ["polarity", "content"],
                             "sorted_MIs": [0.5, 0.5 - mig]},
            }) + "\n")


def _write_eval_dir(d, bleus, ctrl_acc, tx_acc, ppl_dev):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "self_bleus_dev.csv"), "w") as f:
        f.write("sentence_num,BLEU\n")
        for i, b in enumerate(bleus):
            f.write(f"{i},{b}\n")
    with open(os.path.join(d, "controlled_summary_dev.txt"), "w") as f:
        f.write("| label | P | R | F | Acc |\n|---|---|---|---|---|\n")
        f.write(f"| polarity->positive | 0.9 | 0.8 | 0.85 | {ctrl_acc} |\n")
        f.write("| not a number row | a | b | c | n/a |\n")
    with open(os.path.join(d, "transfer_summary_dev.txt"), "w") as f:
        f.write("| label | Accuracy |\n|---|---|\n")
        f.write(f"| polarity: 0->1 | {tx_acc} |\n")
    with open(os.path.join(d, "ppl_reconstructions.jsonl.ppl.json"),
              "w") as f:
        json.dump({"estimator": "kn3",
                   "dev": {"original_ppl": ppl_dev,
                           "reconstruction_ppl": ppl_dev + 10.0}}, f)


def test_parity_table_end_to_end(tmp_path, monkeypatch, capsys):
    mod = importlib.import_module("scripts.experiments.rbg_parity_table")
    logs_a, logs_b = tmp_path / "logs_a", tmp_path / "logs_b"
    evals_a, evals_b = tmp_path / "ev_a", tmp_path / "ev_b"
    _write_migs(str(logs_a / "evaluation" / "MIGS_dev.jsonl"),
                [0.1, 0.2, 0.3])
    _write_migs(str(logs_b / "evaluation" / "MIGS_dev.jsonl"),
                [0.2, 0.2, 0.2])
    _write_eval_dir(str(evals_a), [0.0, 0.5], 0.75, 0.6, 100.0)
    _write_eval_dir(str(evals_b), [0.5, 0.5], 0.8, 0.65, 110.0)
    out = tmp_path / "table.md"
    monkeypatch.setattr(sys, "argv", [
        "rbg_parity_table.py",
        "--logs_a", str(logs_a), "--logs_b", str(logs_b),
        "--evals_a", str(evals_a), "--evals_b", str(evals_b),
        "--labels", "twin_a", "twin_b", "--out", str(out)])
    mod.main()
    capsys.readouterr()

    table = out.read_text().splitlines()
    assert table[0] == "| metric | twin_a | twin_b |"
    by_metric = {ln.split("|")[1].strip(): ln for ln in table[2:]}

    # MIG: mean±std over the jsonl draws
    mig = by_metric["MIG polarity (30 resamples)"]
    assert "0.2000±0.0816" in mig and "0.2000±0.0000" in mig
    assert ("polarity:polarity"
            in by_metric["top-MI latent per label"])
    # self-BLEU pooled over rows
    assert ("0.2500±0.2500" in by_metric["consistency self-BLEU"]
            and "0.5000±0.0000" in by_metric["consistency self-BLEU"])
    # last-numeric-column parsing for both summary layouts; the
    # non-numeric row is skipped
    assert ("| 0.750 | 0.800 |"
            in by_metric["controlled acc: polarity->positive"])
    assert "not a number row" not in out.read_text()
    assert ("| 0.600 | 0.650 |"
            in by_metric["transfer acc: polarity: 0->1"])
    # PPL row: orig / recon per twin, estimator named
    assert (by_metric["dev PPL orig / recon (kn3)"].split("|")[2].strip()
            == "100.00 / 110.00")
    assert "test PPL" not in out.read_text()  # no test split provided
