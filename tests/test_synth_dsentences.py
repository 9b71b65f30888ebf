"""Grammar-faithfulness tests for the synthetic dSentences generator
(scripts/experiments/make_synth_dsentences.py) and its integration with
the dSentences processor's verb/object re-annotation
(scripts/data_prep/get_dSentences_data.py, reference
data/dSentences/get_dSentences_data.py:110-144)."""

import importlib.util
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_gen():
    spec = importlib.util.spec_from_file_location(
        "make_synth_dsentences",
        os.path.join(REPO, "scripts/experiments/make_synth_dsentences.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


GEN = _load_gen()
SENTS, CLASSES = GEN.generate()


def test_full_cross_product():
    assert len(SENTS) == int(np.prod(GEN.FACTOR_SIZES)) == 51840
    assert CLASSES.shape == (51840, 9)
    # every factor column spans exactly its cardinality
    for j, size in enumerate(GEN.FACTOR_SIZES):
        assert sorted(set(CLASSES[:, j])) == list(range(size))
    # each tuple appears exactly once
    assert len({tuple(r) for r in CLASSES}) == 51840


def test_surface_realization_faithful():
    names = GEN.FACTOR_NAMES
    for sent, row in zip(SENTS[::97], CLASSES[::97]):  # stride sample
        f = dict(zip(names, row))
        toks = sent.split()
        # negation surfaces iff pos_neg_verb
        assert ("not" in toks) == bool(f["pos_neg_verb"])
        # object is the final token, with the labeled number
        assert toks[-1] == GEN.OBJECTS[f["verb_obj_tuple"] % 10][
            f["obj_sing_pl"]]
        # future tense surfaces as "will"
        assert ("will" in toks) == (f["verb_tense"] == 2)
        # progressive style surfaces as an -ing form
        ing = GEN.VERBS[f["verb_obj_tuple"] // 10][3]
        assert (ing in toks) == bool(f["verb_style"])
        # subject pronoun encodes person/number/gender
        subj = GEN.subject_pronoun(f["nr_person"], f["subj_sing_pl"],
                                   f["gender"])
        assert subj in toks
        # questions are aux-inverted: the subject is not sentence-initial
        if f["sent_type"] == 1:
            assert toks[0] != subj
        # all sentences fit the reference's 15-token cap with SOS/EOS room
        assert 3 <= len(toks) <= 8


def test_determinism():
    s2, c2 = GEN.generate()
    assert s2 == SENTS and np.array_equal(c2, CLASSES)


def test_processor_integration(tmp_path):
    """generator -> npz -> processor --object_tokens_file: verb/object
    re-annotation must recover verb = tuple // 10 and group
    singular/plural object surface forms (incl. irregulars) to one
    lemma id."""
    out = tmp_path / "ds.npz"
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts/experiments/make_synth_dsentences.py"),
         "--out", str(out)],
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0, r.stderr
    outdir = tmp_path / "processed"
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts/data_prep/get_dSentences_data.py"),
         str(out), str(outdir),
         "--object_tokens_file", str(tmp_path / "object_tokens.txt"),
         "--split_on", "random", "--seed", "0"],
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0, r.stderr

    rows = []
    for split in ("train", "dev", "test"):
        rows += [json.loads(l) for l in open(outdir / f"{split}.jsonl")]
    assert len(rows) == 51840
    obj_lemma_ids = {}
    for row in rows:
        assert row["verb"] == row["verb_obj_tuple"] // 10
        obj_lemma_ids.setdefault(row["verb_obj_tuple"] % 10,
                                 set()).add(row["object"])
    # each of the 10 object nouns (sing+pl surface forms) maps to ONE
    # lemma id -- i.e. the rule lemmatizer groups knives->knife,
    # children->child, berries->berry, boxes->box, ...
    assert all(len(ids) == 1 for ids in obj_lemma_ids.values())
    assert len({next(iter(v)) for v in obj_lemma_ids.values()}) == 10
