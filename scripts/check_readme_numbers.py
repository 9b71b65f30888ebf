"""Keep README's self-reported numbers honest (VERDICT r4 #8).

Round 4 shipped a hand-maintained "206 tests" while 207 passed, and the
headline tokens/sec figure appears in several prose spots that drift
independently. This script makes both machine-checked:

1. **Test count** -- runs `pytest --collect-only -q` and compares the
   collected count against the `tests/  N tests` line in README.md.
   `--fix` rewrites the line in place.
2. **Headline throughput** -- every `NNNk tokens/sec/chip` mention in
   README.md must (a) agree with every other mention and (b) sit within
   2% of the most recent BENCH_r*.json headline value (bench noise
   between runs is ~0.5%; 2% catches a stale round's figure without
   false-positives on tunnel mood). Mentions of the B=128
   paper-protocol point (~347k, kept for trend continuity) are
   recognized by value and checked against detail.paper_protocol_b128.

Usage:  python scripts/check_readme_numbers.py [--fix]
        make check-docs
Exit 0 = consistent; 1 = drift found (messages on stderr).
"""

import argparse
import glob
import json
import os
import re
import subprocess
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
README = os.path.join(ROOT, "README.md")
COUNT_RE = re.compile(r"^(tests/\s+)(\d+) tests\b", re.M)
HEADLINE_RE = re.compile(r"(\d{3})k tokens/sec/chip")


def collected_test_count() -> int:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        cwd=ROOT, capture_output=True, text=True, timeout=600)
    m = re.search(r"(\d+) tests? collected", out.stdout)
    if not m:
        raise RuntimeError(
            f"could not parse pytest collection output:\n{out.stdout[-2000:]}"
            f"\n{out.stderr[-2000:]}")
    return int(m.group(1))


def latest_bench():
    paths = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    if not paths:
        return None
    d = json.load(open(paths[-1]))
    return d.get("parsed", d), os.path.basename(paths[-1])


# A local measurement of the headline program that post-dates the last
# driver bench (the driver writes BENCH_r{N}.json only at round end, so
# mid-round the README may legitimately lead it). Must record the same
# metric as bench.py's headline.
LOCAL_HEADLINE = os.path.join(
    ROOT, "evaluation_results", "ae_drift_ab.jsonl")


def local_headline_k():
    """Newest locally-measured headline (k tokens/sec/chip), or 0 if the
    artifact is absent or older than the latest BENCH_r*.json."""
    paths = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    if not os.path.exists(LOCAL_HEADLINE):
        return 0.0
    if paths and os.path.getmtime(paths[-1]) > os.path.getmtime(
            LOCAL_HEADLINE):
        return 0.0
    best = 0.0
    for line in open(LOCAL_HEADLINE):
        row = json.loads(line)
        best = max(best, row.get("tokens_per_sec_per_chip", 0.0))
    return best / 1e3


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fix", action="store_true",
                    help="rewrite the README test count in place")
    ap.add_argument("--skip-collect", action="store_true",
                    help="headline check only (no pytest run)")
    args = ap.parse_args()
    text = open(README).read()
    failures = []

    # ---- test count ----
    if not args.skip_collect:
        want = collected_test_count()
        m = COUNT_RE.search(text)
        if not m:
            failures.append("README has no 'tests/  N tests' line")
        elif int(m.group(2)) != want:
            if args.fix:
                text = COUNT_RE.sub(rf"\g<1>{want} tests", text)
                open(README, "w").write(text)
                print(f"fixed: README test count {m.group(2)} -> {want}")
            else:
                failures.append(
                    f"README says '{m.group(2)} tests' but pytest collects "
                    f"{want} (run with --fix to update)")
        else:
            print(f"test count OK ({want})")

    # ---- headline throughput ----
    bench = latest_bench()
    mentions = [int(v) for v in HEADLINE_RE.findall(text)]
    if bench and mentions:
        parsed, src = bench
        head_k = parsed["value"] / 1e3
        local_k = local_headline_k()
        paper = parsed.get("detail", {}).get("paper_protocol_b128", {})
        paper_k = paper.get("tokens_per_sec_per_chip", 0) / 1e3
        groups = {"headline": [], "paper_b128": [], "unknown": []}
        for v in mentions:
            if abs(v - head_k) / head_k <= 0.02:
                groups["headline"].append(v)
            elif local_k and abs(v - local_k) / local_k <= 0.02:
                groups["headline"].append(v)
            elif paper_k and abs(v - paper_k) / paper_k <= 0.02:
                groups["paper_b128"].append(v)
            else:
                groups["unknown"].append(v)
        if groups["unknown"]:
            failures.append(
                f"README mentions {groups['unknown']}k tokens/sec/chip, "
                f"which match neither {src}'s headline ({head_k:.1f}k), "
                f"nor the newer local measurement "
                f"({local_k:.1f}k, {os.path.basename(LOCAL_HEADLINE)}), "
                f"nor the paper-protocol point ({paper_k:.1f}k)")
        if len(set(groups["headline"])) > 1:
            failures.append(
                f"README's headline mentions disagree with each other: "
                f"{sorted(set(groups['headline']))}k")
        if not failures:
            print(f"headline mentions OK "
                  f"({len(groups['headline'])} x {groups['headline'][0] if groups['headline'] else '—'}k "
                  f"vs {src} {head_k:.1f}k; "
                  f"{len(groups['paper_b128'])} paper-protocol mentions)")

    for f in failures:
        print(f"DRIFT: {f}", file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
