"""Per-HLO-op roofline table from an existing jax.profiler trace
(round 5, VERDICT r4 #1).

epoch_census.py's op_profile view attributes device time at XLA's
category level; this drills to named HLO ops via xprof's hlo_stats so
the headline program's milliseconds decompose into "which op, bound by
what, emitted from which source line". Host-side only -- reuses a trace
directory epoch_census.py already produced; no device needed.

Usage: python benchmarks/census_hlo.py <trace_dir> --steps 64 [--top 40]
       [--program epoch_fn]
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import argparse
import glob
import json
import re
from collections import defaultdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, required=True,
                    help="scan steps per traced call (divides times)")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--program", default="",
                    help="substring filter on 'Program id' rows via the "
                         "op-profile program name (empty = all rows)")
    args = ap.parse_args()

    from xprof.convert import _pywrap_profiler_plugin as plugin
    pbs = glob.glob(os.path.join(args.trace_dir, "plugins", "profile",
                                 "*", "*.xplane.pb"))
    assert pbs, f"no xplane.pb under {args.trace_dir}"
    data, _ = plugin.xspace_to_tools_data([pbs[-1]], "hlo_stats")
    d = json.loads(data)
    cols = [c["label"] for c in d["cols"]]
    idx = {label: i for i, label in enumerate(cols)}

    def get(row, label):
        v = row["c"][idx[label]].get("v")
        return v

    rows = []
    for r in d["rows"]:
        src = get(r, "Source Info") or ""
        src = re.sub(r"<[^>]+>", "", src).strip()
        rows.append({
            "cat": get(r, "HLO op category"),
            "name": get(r, "HLO op name"),
            "fw": (get(r, "Framework op name") or "")[-100:],
            "n": int(get(r, "#Occurrences") or 0),
            "self_us": float(get(r, "Total self time (us)") or 0.0),
            "bound": get(r, "Bound by"),
            "hbm": float(get(r, "HBM BW (GiB/s)") or 0.0),
            "gflops": float(get(r, "Model GFLOP/s") or 0.0),
            "src": src,
        })
    total_us = sum(r["self_us"] for r in rows)
    S = args.steps
    print(f"total device self time: {total_us / 1e3:.1f} ms "
          f"({total_us / 1e3 / S:.3f} ms/step over {S} steps), "
          f"{len(rows)} ops")

    print(f"\n-- top {args.top} ops by self time --")
    print(f"{'ms/step':>8} {'%':>5} {'n':>5} {'bound':>8}  "
          f"{'GF/s':>7} {'cat':<18} name / source")
    for r in sorted(rows, key=lambda r: -r["self_us"])[:args.top]:
        pct = r["self_us"] / total_us * 100 if total_us else 0
        print(f"{r['self_us'] / 1e3 / S:8.3f} {pct:5.1f} {r['n']:>5} "
              f"{(r['bound'] or '?')[:8]:>8}  {r['gflops']:7.0f} "
              f"{r['cat']:<18} {r['name']}  <{r['src']}>")

    print("\n-- by source line (ms/step) --")
    by_src = defaultdict(float)
    for r in rows:
        by_src[r["src"] or "(none)"] += r["self_us"]
    for src, us in sorted(by_src.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{us / 1e3 / S:8.3f}  {us / total_us * 100:5.1f}%  {src}")

    print("\n-- by bound-by (ms/step) --")
    by_bound = defaultdict(float)
    for r in rows:
        by_bound[r["bound"] or "?"] += r["self_us"]
    for b, us in sorted(by_bound.items(), key=lambda kv: -kv[1]):
        print(f"{us / 1e3 / S:8.3f}  {us / total_us * 100:5.1f}%  {b}")


if __name__ == "__main__":
    main()
