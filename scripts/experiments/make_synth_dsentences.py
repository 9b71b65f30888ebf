"""Generate a dSentences-shaped npz so the dSentences pipeline can run
end-to-end. The real dSentences.npz is an external download
(/root/reference/data/dSentences/README.md — github.com/mcharrak/
discreteVAE) unavailable in this zero-egress environment, so this
reproduces the dataset's *structure*: the npz schema consumed by the
processor (`sentences_array` of utf-8 bytes, `latents_classes`
[N, 9] int matrix, `latents_names`, `metadata.latent_sizes` — reference
data/dSentences/get_dSentences_data.py:28-44), the reference's factor
names in its hardcoded order, and the generative-grammar construction:
every sentence is the deterministic surface realization of a 9-factor
tuple, with the full factor cross-product enumerated exactly once.

Factors (name: cardinality):
  verb_obj_tuple: 90   (9 verbs x 10 objects; verb = tuple // 10 —
                        the convention the processor's re-annotation
                        relies on, reference get_dSentences_data.py:110)
  obj_sing_pl: 2       object singular/plural
  sent_type: 2         declarative / interrogative
  gender: 2            3rd-person pronoun gender (surface-visible only
                        for 3rd-person-singular subjects, as in any
                        English realization of these factors)
  subj_sing_pl: 2      subject singular/plural
  nr_person: 3         1st/2nd/3rd person
  pos_neg_verb: 2      verb polarity (negation)
  verb_tense: 3        past/present/future
  verb_style: 2        simple / progressive aspect

90 * 2*2*2*2*3*2*3*2 = 51,840 sentences. The object noun is always the
final token (so the processor's lemma-id object re-annotation applies),
sentences are lowercase and unpunctuated, and every surface form is a
deterministic function of its factor tuple. The exact word lists differ
from the original dataset (unfetchable); the factor structure, schema,
and grammar-realization properties are what downstream consumers use.

Usage: python scripts/experiments/make_synth_dsentences.py
           [--out data/raw/synth_dSentences.npz]
Writes the npz plus an `object_tokens.txt` (every surface object form)
next to it for the processor's --object_tokens_file.
"""

import argparse
import os

import numpy as np

# 9 verbs: (base, 3rd-person-singular, past, -ing participle)
VERBS = [
    ("eat", "eats", "ate", "eating"),
    ("like", "likes", "liked", "liking"),
    ("want", "wants", "wanted", "wanting"),
    ("see", "sees", "saw", "seeing"),
    ("buy", "buys", "bought", "buying"),
    ("find", "finds", "found", "finding"),
    ("hold", "holds", "held", "holding"),
    ("carry", "carries", "carried", "carrying"),
    ("wash", "washes", "washed", "washing"),
]

# 10 objects: (singular, plural) — includes irregular and -y/-x plurals
# so the processor's rule lemmatizer path is exercised non-trivially.
OBJECTS = [
    ("apple", "apples"),
    ("banana", "bananas"),
    ("car", "cars"),
    ("book", "books"),
    ("house", "houses"),
    ("dog", "dogs"),
    ("knife", "knives"),
    ("child", "children"),
    ("box", "boxes"),
    ("berry", "berries"),
]

FACTOR_NAMES = ["verb_obj_tuple", "obj_sing_pl", "sent_type", "gender",
                "subj_sing_pl", "nr_person", "pos_neg_verb",
                "verb_tense", "verb_style"]
FACTOR_SIZES = [90, 2, 2, 2, 2, 3, 2, 3, 2]

PAST, PRESENT, FUTURE = 0, 1, 2


def subject_pronoun(nr_person, subj_sing_pl, gender):
    """Pronoun from (person, number, gender); gender surfaces only at
    3rd-person singular, exactly as English forces."""
    if nr_person == 0:
        return "i" if subj_sing_pl == 0 else "we"
    if nr_person == 1:
        return "you"
    if subj_sing_pl == 0:
        return "he" if gender == 0 else "she"
    return "they"


def _be_form(tense, third_sg, first_sg):
    # plural/2nd person is the implicit else-branch of both tenses
    if tense == PRESENT:
        if first_sg:
            return "am"
        return "is" if third_sg else "are"
    if tense == PAST:
        return "was" if (third_sg or first_sg) else "were"
    return "will be"


def realize(tup, obj_pl, sent_type, gender, subj_pl, person, neg,
            tense, style):
    """Deterministic surface form of one factor tuple."""
    verb = VERBS[tup // 10]
    obj = OBJECTS[tup % 10][obj_pl]
    subj = subject_pronoun(person, subj_pl, gender)
    third_sg = person == 2 and subj_pl == 0
    first_sg = person == 0 and subj_pl == 0
    base, v3sg, past, ing = verb
    not_ = ["", "not"][neg]

    if style == 1:  # progressive: BE (+not) + V-ing + OBJ
        be = _be_form(tense, third_sg, first_sg)
        be_toks = be.split()
        if sent_type == 1:  # invert the (first) auxiliary
            toks = [be_toks[0], subj, not_] + be_toks[1:] + [ing, obj]
        else:
            toks = [subj, be_toks[0], not_] + be_toks[1:] + [ing, obj]
        return " ".join(t for t in toks if t)

    # simple aspect
    if tense == FUTURE:
        aux, main = "will", base
    elif neg or sent_type == 1:  # do-support
        aux = {PRESENT: ("does" if third_sg else "do"),
               PAST: "did"}[tense]
        main = base
    else:
        aux = ""
        main = {PRESENT: (v3sg if third_sg else base), PAST: past}[tense]

    if sent_type == 1:
        toks = [aux, subj, not_, main, obj]
    else:
        toks = [subj, aux, not_, main, obj]
    return " ".join(t for t in toks if t)


def generate():
    """Enumerate the full factor cross-product once, in odometer order."""
    sentences, classes = [], []
    for tup in range(90):
        for obj_pl in range(2):
            for sent_type in range(2):
                for gender in range(2):
                    for subj_pl in range(2):
                        for person in range(3):
                            for neg in range(2):
                                for tense in range(3):
                                    for style in range(2):
                                        s = realize(
                                            tup, obj_pl, sent_type,
                                            gender, subj_pl, person,
                                            neg, tense, style)
                                        sentences.append(s)
                                        classes.append(
                                            [tup, obj_pl, sent_type,
                                             gender, subj_pl, person,
                                             neg, tense, style])
    return sentences, np.array(classes, dtype=np.int64)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/raw/synth_dSentences.npz")
    args = ap.parse_args()

    sentences, classes = generate()
    assert len(sentences) == int(np.prod(FACTOR_SIZES))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez_compressed(
        args.out,
        sentences_array=np.array([s.encode() for s in sentences],
                                 dtype=object),
        latents_classes=classes,
        latents_names=np.array([n.encode() for n in FACTOR_NAMES],
                               dtype=object),
        metadata=np.array(
            {"latent_sizes": np.array(FACTOR_SIZES)}, dtype=object),
    )
    obj_path = os.path.join(os.path.dirname(args.out),
                            "object_tokens.txt")
    with open(obj_path, "w") as f:
        for sing, pl in OBJECTS:
            f.write(sing + "\n")
            f.write(pl + "\n")
    n_uniq = len(set(sentences))
    print(f"{len(sentences)} sentences ({n_uniq} unique surface forms) "
          f"-> {args.out}")
    print(f"object tokens -> {obj_path}")


if __name__ == "__main__":
    main()
