"""Additional data-prep coverage: Yelp processor, dSentences processor,
ConceptNet pair flow."""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_script(script, *args):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        capture_output=True, text=True, cwd=REPO)


def test_yelp_processor(tmp_path):
    indir = tmp_path / "yelp"
    indir.mkdir()
    for split in ("train", "dev", "test"):
        (indir / f"sentiment.{split}.0").write_text("bad food\nawful\n")
        (indir / f"sentiment.{split}.1").write_text("good food\n")
    outdir = tmp_path / "out"
    r = run_script("scripts/data_prep/get_yelp_data.py",
                   "--indir", str(indir), "--outdir", str(outdir))
    assert r.returncode == 0, r.stderr
    rows = [json.loads(l) for l in open(outdir / "train.jsonl")]
    assert len(rows) == 3
    assert {r_["sentiment"] for r_ in rows} == {0, 1}
    assert all({"id", "sentence", "n_tokens"} <= set(r_) for r_ in rows)
    # refuses to clobber
    r2 = run_script("scripts/data_prep/get_yelp_data.py",
                    "--indir", str(indir), "--outdir", str(outdir))
    assert r2.returncode != 0


def test_dsentences_processor(tmp_path):
    sents = np.array([f"the obj{i % 3} is verb{i % 2}".encode()
                      for i in range(40)], dtype=object)
    factors = np.stack([np.arange(40) % 3, np.arange(40) % 2], axis=1)
    npz = tmp_path / "dSentences.npz"
    np.savez(npz, sentences_array=sents, latents_classes=factors,
             latents_names=np.array([b"obj_type", b"verb_type"],
                                    dtype=object))
    outdir = tmp_path / "ds_out"
    r = run_script("scripts/data_prep/get_dSentences_data.py", str(npz),
                   str(outdir), "--split_on", "random")
    assert r.returncode == 0, r.stderr
    train = [json.loads(l) for l in open(outdir / "train.jsonl")]
    dev = [json.loads(l) for l in open(outdir / "dev.jsonl")]
    test = [json.loads(l) for l in open(outdir / "test.jsonl")]
    assert len(train) + len(dev) + len(test) == 40
    assert len(train) == 28  # 70%
    assert {"obj_type", "verb_type"} <= set(train[0].keys())


def test_conceptnet_pair_flow(tmp_path):
    raw = tmp_path / "raw.jsonl"
    rows = []
    for i in range(30):
        rows.append({
            "uuid": f"u{i}",
            "masked_sentences": [f"thing {i} is [MASK]."],
            "negated": [f"thing {i} is not [MASK]."],
            "obj_label": f"word{i}",
            "pred": "IsA",
        })
    raw.write_text("\n".join(json.dumps(r) for r in rows))
    pairs_dir = tmp_path / "pairs"
    r = run_script("scripts/data_prep/split_polarity_data.py",
                   "--infile", str(raw), "--outdir", str(pairs_dir))
    assert r.returncode == 0, r.stderr
    out_dir = tmp_path / "polarity"
    r = run_script("scripts/data_prep/get_polarity_data.py",
                   "--indir", str(pairs_dir), "--outdir", str(out_dir))
    assert r.returncode == 0, r.stderr
    all_rows = []
    for split in ("train", "dev", "test"):
        all_rows += [json.loads(l) for l in open(out_dir / f"{split}.jsonl")]
    assert len(all_rows) == 60  # one positive + one negative per pair
    pos = [r_ for r_ in all_rows if r_["polarity"] == 1]
    neg = [r_ for r_ in all_rows if r_["polarity"] == 0]
    assert len(pos) == len(neg) == 30
    assert "[MASK]" not in pos[0]["sentence"]
    assert any("not" in r_["sentence"] for r_ in neg)


def test_dsentences_verb_object_annotations(tmp_path):
    """Verb/object re-annotation splits verb_obj_tuple (reference
    get_dSentences_data.py:110-144): verb = tuple // 10, object = lemma id
    of the final token with plural/singular forms merged."""
    sents = []
    tuples = []
    objs = ["apple", "apples", "knife", "knives", "box", "boxes"]
    for i in range(12):
        obj = objs[i % len(objs)]
        sents.append(f"she verbs the {obj}".encode())
        tuples.append(i * 10 + (i % 3))
    factors = np.stack([np.array(tuples), np.arange(12) % 2], axis=1)
    npz = tmp_path / "dSentences.npz"
    np.savez(npz, sentences_array=np.array(sents, dtype=object),
             latents_classes=factors,
             latents_names=np.array([b"verb_obj_tuple", b"verb_type"],
                                    dtype=object))
    toks = tmp_path / "objects.txt"
    toks.write_text("\n".join(objs) + "\n")
    outdir = tmp_path / "ds_vo"
    r = run_script("scripts/data_prep/get_dSentences_data.py", str(npz),
                   str(outdir), "--split_on", "random",
                   "--object_tokens_file", str(toks))
    assert r.returncode == 0, r.stderr
    rows = []
    for split_name in ("train", "dev", "test"):
        rows += [json.loads(l) for l in open(outdir / f"{split_name}.jsonl")]
    assert len(rows) == 12
    for row in rows:
        assert row["verb"] == row["verb_obj_tuple"] // 10
    # singular/plural pairs share a lemma id; distinct lemmas do not
    by_obj = {row["sentence"].split()[-1]: row["object"] for row in rows}
    assert by_obj["apple"] == by_obj["apples"]
    assert by_obj["knife"] == by_obj["knives"]
    assert by_obj["box"] == by_obj["boxes"]
    assert len({by_obj["apple"], by_obj["knife"], by_obj["box"]}) == 3


def test_rule_lemma():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ds_mod", "scripts/data_prep/get_dSentences_data.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    cases = {"apples": "apple", "berries": "berry", "boxes": "box",
             "dishes": "dish", "knives": "knife", "children": "child",
             "glass": "glass", "bus": "bus", "dog": "dog"}
    for word, want in cases.items():
        assert mod._rule_lemma(word) == want, word
