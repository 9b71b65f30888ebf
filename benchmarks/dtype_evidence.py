"""Evidence for settling the bf16-vs-f32 question (VERDICT round 1, weak #5).

For each (lstm_backend, compute_dtype) variant at flagship scale this script
reports, from the *optimized* HLO of the fused train step:

  - ms/step (same protocol as ab_bench.py: donated state, 20 timed steps),
  - the number of f32<->bf16 `convert` instructions that ended up INSIDE
    while-loop bodies (i.e. cast work paid once per scan iteration of the
    encoder/decoder recurrences) vs outside them (paid once per step),
  - bytes converted per while iteration, the quantity that actually hits
    HBM bandwidth.

This makes the "cast churn" claim measurable: before the cast hoist
(models/layers.py cast_matmul_weights) the [V, H] decoder projection and
[4H, H] recurrent weights were converted inside the decode/encode loops on
every timestep; after it they convert once per train step.

Optionally pass --trace <dir> to also capture a jax.profiler trace of each
variant (20 steps) for inspection with tensorboard/xprof.

Usage: python benchmarks/dtype_evidence.py [--trace /tmp/dtype_traces]
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E702,E501
import argparse
import dataclasses
import json
import re
import time

import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from dvae_tpu.models import init_vae_params
from dvae_tpu.training import (create_train_state, kl_weight_vector,
                               make_train_step)

B = 128


def build(cfg):
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
    state = create_train_state(params, 3e-4, 0)
    step = jax.jit(make_train_step(cfg, constants, 3e-4),
                   donate_argnums=(0,))
    batch_np = ge._synthetic_batch(cfg, B=B, seed=0)
    batch = {k: (jnp.asarray(v) if not isinstance(v, dict)
                 else {n: jnp.asarray(a) for n, a in v.items()})
             for k, v in batch_np.items()}
    klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
    args = (state, batch, klw, jnp.asarray(0.5), jnp.asarray(0.01))
    return step, args


_COMP_HEADER = re.compile(
    r"^\s*(?:ENTRY\s+)?%?([\w.\-]+)\s*\(.*->.*\{\s*$")
_REFS = re.compile(r"(?:calls|body|condition|to_apply)=%?([\w.\-]+)")
_CONVERT = re.compile(r"=\s*(\w+)\[([\d,]*)\][^=]*?\s+convert\(")


def convert_census(hlo: str):
    """Count bf16<->f32 convert instructions that execute once per
    while-loop iteration vs once per train step, in optimized HLO.

    Two passes: (1) split the module into computations and record which
    computations each references (fusion calls=, while body=/condition=,
    reduce to_apply=); (2) mark everything reachable from a while body as
    per-iteration, then tally convert ops and the bytes they write. This is
    the measurable form of the "cast churn" claim: weights converted inside
    a loop body are re-converted every timestep of the encoder/decoder
    recurrence; converted outside, once per step.
    """
    comps = {}          # name -> {"refs": set, "converts": [(dtype, n)]}
    cur = None
    for line in hlo.splitlines():
        m = _COMP_HEADER.match(line)
        if m:
            cur = comps.setdefault(m.group(1),
                                   {"refs": set(), "converts": []})
            continue
        if cur is None:
            continue
        cur["refs"].update(_REFS.findall(line))
        c = _CONVERT.search(line)
        if c and c.group(1) in ("bf16", "f32"):
            n = 1
            for d in c.group(2).split(","):
                if d:
                    n *= int(d)
            cur["converts"].append((c.group(1), n))
    body_names = set(re.findall(r"body=%?([\w.\-]+)", hlo))
    in_loop = set()
    frontier = [b for b in body_names if b in comps]
    while frontier:
        name = frontier.pop()
        if name in in_loop:
            continue
        in_loop.add(name)
        frontier.extend(r for r in comps.get(name, {"refs": ()})["refs"]
                        if r in comps)
    n_in = n_out = elems_in = bytes_in = 0
    for name, c in comps.items():
        for dt, n in c["converts"]:
            if name in in_loop:
                n_in += 1
                elems_in += n
                bytes_in += n * (2 if dt == "bf16" else 4)
            else:
                n_out += 1
    return {"converts_per_loop_iteration": n_in,
            "converts_per_step": n_out,
            "elements_converted_per_iteration": int(elems_in),
            "bytes_written_per_iteration": int(bytes_in)}


def measure(step, args, n=20, trace_dir=None):
    # timing windows close with host VALUE fetches: block_until_ready is
    # not a reliable barrier through this device runtime (see
    # benchmarks/RESULTS.md round-2 correction); first rep absorbs backlog
    state, batch, klw, tf, miw = args
    for _ in range(3):
        state, metrics, _, _ = step(state, batch, klw, tf, miw)
    float(metrics["total_loss"])
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    best = None
    for _ in range(2):
        t0 = time.time()
        for _ in range(n):
            state, metrics, _, _ = step(state, batch, klw, tf, miw)
        loss = float(metrics["total_loss"])
        best = (time.time() - t0) / n
    if trace_dir:
        jax.profiler.stop_trace()
    return best * 1000, loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default="",
                    help="directory for jax.profiler traces (one subdir "
                         "per variant); empty = no traces")
    ap.add_argument("--variants", nargs="*", default=[
        "scan_f32", "scan_bf16", "pallas_f32", "pallas_bf16"])
    ap.add_argument("--no-precast", action="store_true",
                    help="bypass layers.cast_matmul_weights (the round-1 "
                         "inline-cast behavior) to quantify the churn the "
                         "hoist removes")
    args = ap.parse_args()
    if args.no_precast:
        import dvae_tpu.models.vae as _vae
        import dvae_tpu.training.step as _step
        _vae.cast_matmul_weights = lambda tree, dt: tree
        _step.cast_matmul_weights = lambda tree, dt: tree

    base = ge._flagship_cfg(vocab_size=20000, emb=256, hidden=256, layers=2,
                            max_length=17)
    spec = {
        "scan_f32": dict(lstm_backend="scan"),
        "scan_bf16": dict(lstm_backend="scan", compute_dtype="bfloat16"),
        "pallas_f32": dict(lstm_backend="pallas"),
        "pallas_bf16": dict(lstm_backend="pallas",
                            compute_dtype="bfloat16"),
    }
    for name in args.variants:
        cfg = dataclasses.replace(base, **spec[name])
        step, sargs = build(cfg)
        hlo = step.lower(*sargs).compile().as_text()
        census = convert_census(hlo)
        tdir = os.path.join(args.trace, name) if args.trace else None
        ms, loss = measure(step, sargs, trace_dir=tdir)
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        print(json.dumps({"variant": name, "ms_per_step": round(ms, 3),
                          "loss": round(loss, 3), **census,
                          "peak_device_bytes": peak}))


if __name__ == "__main__":
    main()
