"""Data-preparation script tests (SFU XML labeling semantics, dataset
combination, n-gram PPL, Amazon/Yelp processors)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SFU_XML = """<?xml version="1.0" encoding="UTF-8"?>
<DOCUMENT><P><SENTENCE><W>This</W><W>movie</W><W>is</W><W>great</W><W>.</W>
</SENTENCE><SENTENCE><cue ID="0" type="negation"><W>not</W></cue><W>a</W>
<W>good</W><W>film</W><W>at</W><W>all</W></SENTENCE>
<SENTENCE><cue ID="1" type="speculation"><W>maybe</W></cue><W>it</W>
<W>works</W><W>fine</W></SENTENCE>
<SENTENCE><W>I</W><W>liked</W><W>it</W><W>,</W><C><W>and</W></C><W>you</W>
<W>did</W><W>n't</W><W>like</W><W>it</W></SENTENCE></P></DOCUMENT>
"""


def run_script(script, *args):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        capture_output=True, text=True, cwd=REPO)


def test_process_sfu_labels(tmp_path):
    corpus = tmp_path / "MOVIES"
    corpus.mkdir()
    (corpus / "r1.xml").write_text(SFU_XML)
    outdir = tmp_path / "out"
    r = run_script("scripts/data_prep/process_sfu.py", str(corpus),
                   "--outdir", str(outdir))
    assert r.returncode == 0, r.stderr
    rows = []
    for split in ("train", "dev", "test"):
        rows += [json.loads(l) for l in
                 open(outdir / f"{split}.jsonl")]
    by_sent = {r["sentence"]: r for r in rows}
    plain = next(v for k, v in by_sent.items() if "great" in k)
    assert plain["polarity"] == "positive"
    assert plain["uncertainty"] == "certain"
    neg = next(v for k, v in by_sent.items() if "not a good" in k)
    assert neg["polarity"] == "negative"
    spec = next(v for k, v in by_sent.items() if "maybe" in k)
    assert spec["uncertainty"] == "uncertain"
    # compound sentence split on <C>and</C>: two rows, second negative
    # (n't), both flagged was_split
    first = next(v for k, v in by_sent.items() if k.startswith("I liked"))
    second = next(v for k, v in by_sent.items() if "did n't" in k)
    assert first["was_split"] and second["was_split"]
    assert first["polarity"] == "positive"
    assert second["polarity"] == "negative"
    assert all(r["review_type"] == "MOVIES" for r in rows)


def _write_split_dir(path, name, n, key_extra=None):
    path.mkdir(parents=True, exist_ok=True)
    for split in ("train", "dev", "test"):
        with open(path / f"{split}.jsonl", "w") as f:
            for i in range(n):
                row = {"id": f"{name}-{split}-{i}",
                       "sentence": f"{name} sentence {i}", "polarity": i % 2}
                if key_extra:
                    row[key_extra] = 1
                f.write(json.dumps(row) + "\n")


def test_combine_datasets(tmp_path):
    _write_split_dir(tmp_path / "a", "a", 10, key_extra="only_in_a")
    _write_split_dir(tmp_path / "b", "b", 8)
    outdir = tmp_path / "combined"
    r = run_script("scripts/helpers/combine_datasets.py",
                   "--data_dirs", str(tmp_path / "a"), str(tmp_path / "b"),
                   "--dataset_names", "a", "b", "--Ns", "5", "-1",
                   "--outdir", str(outdir))
    assert r.returncode == 0, r.stderr
    train = [json.loads(l) for l in open(outdir / "train.jsonl")]
    # train truncation: 5 from a + all 8 from b
    assert len(train) == 13
    # dev is NOT truncated with the train Ns (quirk #6 fixed)
    dev = [json.loads(l) for l in open(outdir / "dev.jsonl")]
    assert len(dev) == 18
    assert {r["source_dataset"] for r in train} == {"a", "b"}
    # only the key intersection survives
    assert all("only_in_a" not in r for r in train)


def test_process_amazon(tmp_path):
    indir = tmp_path / "amz"
    indir.mkdir()
    (indir / "pos.txt").write_text("good product\n" + "really nice\n")
    (indir / "neg.txt").write_text("bad product\n" + "good product\n")
    outdir = tmp_path / "amz_out"
    r = run_script("scripts/data_prep/process_amazon.py", "--indir",
                   str(indir), "--outdir", str(outdir))
    assert r.returncode == 0, r.stderr
    rows = []
    for split in ("train", "dev", "test"):
        rows += [json.loads(l) for l in open(outdir / f"{split}.jsonl")]
    # duplicate "good product" in neg is dropped (md5 dedup)
    assert len(rows) == 3
    sentiments = {r["sentence"]: r["sentiment"] for r in rows}
    assert sentiments["good product"] == 1
    assert sentiments["bad product"] == 0


def test_ngram_ppl_runs(tmp_path):
    _write_split_dir(tmp_path / "c", "c", 20)
    r = run_script("scripts/helpers/ngram_ppl.py", str(tmp_path / "c"))
    assert r.returncode == 0, r.stderr
    assert "PPL=" in r.stdout


def test_validate_config_cli(tmp_path):
    import copy
    from tests.test_config import VALID
    p = tmp_path / "c.json"
    p.write_text(json.dumps(copy.deepcopy(VALID)))
    r = run_script("scripts/helpers/validate_config_file.py", str(p))
    assert r.returncode == 0 and "OK" in r.stdout
