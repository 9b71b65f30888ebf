"""Device-time census of the FUSED-EPOCH program (round 4, VERDICT #1).

Round 3 censused only the single-step program (3.57 ms/step rbg) while the
production fused epoch measured 4.55 ms/step wall -- leaving ~22% of the
headline unattributed. This profiles the epoch program itself: one
jax.profiler trace around a single epoch_fn(S steps) call, aggregated at
op_profile's category level, so "device busy ms/step inside the scan" and
"wall - device = host/tunnel residue" are separately known quantities.

Usage: python benchmarks/epoch_census.py [--steps=S] [--unroll=N]
                                         [--batch=B] [--ce=xla|pallas]
                                         [--collect-latents]
Prints device ms/step by category + the wall-clock for the same call.
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import dataclasses
import glob
import json
import tempfile
import time

import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from dvae_tpu.models import init_vae_params
from dvae_tpu.parallel import stack_batches
from dvae_tpu.training import (create_train_state, kl_weight_vector,
                               make_train_epoch)
from dvae_tpu.utils import enable_compilation_cache


def main():
    S, unroll, collect, B, ce, ae = 64, 1, False, 128, "xla", 1
    for a in sys.argv[1:]:
        if a.startswith("--steps="):
            S = int(a.split("=")[1])
        if a.startswith("--unroll="):
            unroll = int(a.split("=")[1])
        if a.startswith("--batch="):
            B = int(a.split("=")[1])
        if a.startswith("--ce="):
            ce = a.split("=")[1]
        if a.startswith("--ae="):
            ae = int(a.split("=")[1])
        if a == "--collect-latents":
            collect = True

    enable_compilation_cache("auto")
    jax.config.update("jax_default_prng_impl", "rbg")
    cfg = ge._flagship_cfg(vocab_size=20000, emb=256, hidden=256, layers=2,
                           max_length=17)
    cfg = dataclasses.replace(cfg, lstm_backend="scan",
                              compute_dtype="bfloat16",
                              fused_ce_backend=ce,
                              ae_drift_every_n=ae)
    batch_np = ge._synthetic_batch(cfg, B=B, seed=0)
    stacked = jax.tree.map(jnp.asarray, stack_batches([batch_np] * S))
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
    state = create_train_state(params, 3e-4, 0)
    klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
    klw_seq = jnp.stack([klw] * S)
    args = (klw_seq, jnp.asarray(0.5), jnp.asarray(0.01))
    epoch_fn = jax.jit(make_train_epoch(cfg, constants, 3e-4,
                                        collect_latents=collect,
                                        unroll=unroll),
                       donate_argnums=(0,))

    # warm (compile) + settle
    for _ in range(2):
        state, em, _ = epoch_fn(state, stacked, *args)
    float(em["total_loss"][-1])

    trace_dir = tempfile.mkdtemp(prefix="epoch_census_")
    t0 = time.time()
    jax.profiler.start_trace(trace_dir)
    state, em, _ = epoch_fn(state, stacked, *args)
    float(em["total_loss"][-1])  # host-fetch barrier inside the trace
    jax.profiler.stop_trace()
    wall_s = time.time() - t0
    print(f"trace -> {trace_dir}")
    print(f"wall for 1 traced epoch call ({S} steps): {wall_s:.3f} s "
          f"= {wall_s / S * 1e3:.3f} ms/step  (incl. trace overhead)")

    from xprof.convert import _pywrap_profiler_plugin as plugin
    pbs = glob.glob(os.path.join(trace_dir, "plugins", "profile", "*",
                                 "*.xplane.pb"))
    assert pbs, f"no xplane.pb under {trace_dir}"
    data, _ = plugin.xspace_to_tools_data([pbs[-1]], "op_profile")
    d = json.loads(data)
    cats, prog_name, prog_metrics = {}, None, {}
    ops = []  # (category, op name, rawTime) leaves, for the top-op table
    for prog in d["byProgramExcludeIdle"].get("children", []):
        name = prog.get("name", "")
        if "epoch_fn" not in name:
            continue
        prog_name = name
        prog_metrics = prog.get("metrics", {})
        for cat in prog.get("children", []):
            cname = cat.get("name", "?")
            cats[cname] = (cats.get(cname, 0)
                           + cat.get("metrics", {}).get("rawTime", 0))
            stack = list(cat.get("children", []))
            while stack:
                node = stack.pop()
                kids = node.get("children", [])
                if kids:
                    stack.extend(kids)
                else:
                    ops.append((cname, node.get("name", "?"),
                                node.get("metrics", {}).get("rawTime", 0)))
    total = sum(cats.values())
    print(f"\nprogram: {prog_name}")
    print(f"device busy: {total / 1e9:.1f} ms total = "
          f"{total / 1e9 / S:.3f} ms/step; "
          f"host+tunnel residue: {(wall_s * 1e3 - total / 1e9) / S:.3f} "
          f"ms/step")
    if prog_metrics.get("flops") is not None:
        bw = prog_metrics.get("bandwidthUtils") or [0]
        print(f"device-reported FLOPs util {prog_metrics['flops'] * 100:.1f}%"
              f"; HBM util {bw[0] * 100:.1f}%")
    print("\n-- by category (ms/step) --")
    for cat, t in sorted(cats.items(), key=lambda kv: -kv[1]):
        pct = t / total * 100 if total else 0.0
        print(f"{t / 1e9 / S:8.3f}  {pct:5.1f}%  {cat}")
    print("\n-- top 30 ops (ms/step) --")
    for cname, oname, t in sorted(ops, key=lambda kv: -kv[2])[:30]:
        pct = t / total * 100 if total else 0.0
        print(f"{t / 1e9 / S:8.3f}  {pct:5.1f}%  [{cname}] {oname}")


if __name__ == "__main__":
    main()
