"""Device-time census of the fused train step (round-3 tail attack).

Captures a jax.profiler trace of N back-to-back steps at flagship scale,
then aggregates the xplane's per-op device times (xprof op_profile) into
op-category totals and a top-op table, so "where do the non-matmul
milliseconds go" is answered by the device's own accounting instead of
guesswork (VERDICT r2 weak #3: the ~2 ms "optimizer + ~4,000 small ops"
tail had never been broken down).

Usage: python benchmarks/profile_census.py [variant] [--steps N]
  variant: ab_one.py's variant table (default scan_bf16)
Prints a category table + top-25 ops with per-step ms.
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import dataclasses
import glob
import json
import tempfile

import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from dvae_tpu.models import init_vae_params
from dvae_tpu.training import (create_train_state, kl_weight_vector,
                               make_train_step)
from dvae_tpu.utils import enable_compilation_cache

from benchmarks.variants import VARIANTS


def capture(variant: str, n_steps: int, trace_dir: str) -> None:
    enable_compilation_cache("auto")
    if "--rbg" in sys.argv:
        # TPU hardware RNG (config prng_impl="rbg"); see RESULTS.md round 3
        jax.config.update("jax_default_prng_impl", "rbg")
    cfg = ge._flagship_cfg(vocab_size=20000, emb=256, hidden=256, layers=2,
                           max_length=17)
    cfg = dataclasses.replace(cfg, **VARIANTS[variant])
    batch_np = ge._synthetic_batch(cfg, B=128, seed=0)
    batch = {k: (jnp.asarray(v) if not isinstance(v, dict)
                 else {n: jnp.asarray(a) for n, a in v.items()})
             for k, v in batch_np.items()}
    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg)
    state = create_train_state(params, 3e-4, 0)
    step = jax.jit(make_train_step(cfg, constants, 3e-4),
                   donate_argnums=(0,))
    klw = jnp.asarray(kl_weight_vector(cfg, {"default": 0.01}, 1.0))
    args = (klw, jnp.asarray(0.5), jnp.asarray(0.01))
    for _ in range(5):
        state, metrics, _, _ = step(state, batch, *args)
    float(metrics["total_loss"])  # reliable barrier (RESULTS.md round 2)
    jax.profiler.start_trace(trace_dir)
    for _ in range(n_steps):
        state, metrics, _, _ = step(state, batch, *args)
    float(metrics["total_loss"])
    jax.profiler.stop_trace()


def summarize(trace_dir: str, n_steps: int):
    """Aggregate at the CATEGORY level of op_profile's byProgramExcludeIdle
    tree: only category nodes carry complete rawTime (ps) -- fusion
    children are sampled representatives and undercount by >10x."""
    from xprof.convert import _pywrap_profiler_plugin as plugin
    pbs = glob.glob(os.path.join(trace_dir, "plugins", "profile", "*",
                                 "*.xplane.pb"))
    assert pbs, f"no xplane.pb under {trace_dir}"
    data, _ = plugin.xspace_to_tools_data([pbs[-1]], "op_profile")
    d = json.loads(data)
    cats = {}
    ops = []
    prog_metrics = {}
    for prog in d["byProgramExcludeIdle"].get("children", []):
        if "train_step" not in prog.get("name", ""):
            continue
        prog_metrics = prog.get("metrics", {})
        for cat in prog.get("children", []):
            cname = cat.get("name", "?")
            cats[cname] = cats.get(cname, 0) + \
                cat.get("metrics", {}).get("rawTime", 0)
            for op in cat.get("children", []):
                ops.append((op.get("metrics", {}).get("rawTime", 0),
                            cname, op.get("name", "")))
    total = sum(cats.values())
    print(f"device time: {total / 1e9 / n_steps:.3f} ms/step over "
          f"{n_steps} steps")
    if prog_metrics.get("flops") is not None:
        bw = prog_metrics.get("bandwidthUtils") or [0]
        print(f"device-reported FLOPs utilization: "
              f"{prog_metrics['flops'] * 100:.1f}% "
              f"(rawFlops {prog_metrics.get('rawFlops', 0) / n_steps:.3e}"
              f"/step); HBM util {bw[0] * 100:.1f}%")
    print("\n-- by category (ms/step) --")
    for cat, t in sorted(cats.items(), key=lambda kv: -kv[1]):
        # rawTime can be all-zero on a trace captured before any step ran
        # (or an older xprof schema); print the partial table, not a crash
        pct = t / total * 100 if total else 0.0
        print(f"{t / 1e9 / n_steps:8.3f}  {pct:5.1f}%  {cat}")
    print("\n-- top 25 op groups (ms/step; fusion groups aggregate "
          "duplicates) --")
    ops.sort(reverse=True)
    for t, cat, name in ops[:25]:
        print(f"{t / 1e9 / n_steps:8.4f}  {cat:<22} {name[:70]}")
    return cats, total, ops


if __name__ == "__main__":
    variant = sys.argv[1] if len(sys.argv) > 1 and not \
        sys.argv[1].startswith("--") else "scan_bf16"
    n_steps = 16
    for a in sys.argv[1:]:
        if a.startswith("--steps="):
            n_steps = int(a.split("=")[1])
    trace_dir = tempfile.mkdtemp(prefix=f"census_{variant}_")
    capture(variant, n_steps, trace_dir)
    print(f"trace -> {trace_dir}")
    summarize(trace_dir, n_steps)
