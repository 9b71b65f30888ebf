"""Benchmark: fused train-step throughput on the flagship config.

Measures tokens/sec/chip for the full training step (forward + all five
loss families + all three optimizer-group updates + the AE-drift re-encode)
at sfu_amazon_100k scale (seq 17, vocab 20k, 256-dim 2-layer bidirectional
encoder -- reproduction_configs/sfu_amazon_100k/vae_adv+mi.json via
SURVEY.md section 6), on whatever device JAX provides (TPU in the driver's
environment). The headline operating point is the metrics-certified
batch-scaling knee (B=512, pallas streaming CE -- round 4); the B=128
paper-protocol point is carried in detail.paper_protocol_b128.

vs_baseline compares seconds/step against the measured CPU-torch
reference-profile baseline (benchmarks/BASELINE_MEASURED.json, produced by
benchmarks/torch_reference_baseline.py -- the reference repo itself
publishes no numbers, BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import subprocess
import sys
import time


def _device_available(timeout_s: float = 150.0) -> bool:
    """Probe the default JAX backend in a subprocess under a hard timeout.

    The tunneled TPU backend on this host can hang for hours in its init
    retry loop when the tunnel is down (observed 10h outage); a bench that
    hangs produces NO number at all. The probe runs a trivial reduction in
    a child process (so a wedged init cannot take this process with it) and
    kills the child on timeout.

    Transient failures happen too (observed: two consecutive probe
    failures minutes apart with a healthy chip on either side -- a
    tunnel lease/init flake, not an outage), so the probe retries:
    a flaky-but-alive accelerator must not silently demote the headline
    to a CPU number.
    """
    code = ("import jax, jax.numpy as jnp; "
            "assert float(jnp.ones((4, 4)).sum()) == 16.0")
    for attempt in range(3):
        if attempt:
            time.sleep(10.0)
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=timeout_s,
                               stdout=subprocess.DEVNULL,
                               stderr=subprocess.DEVNULL)
            if r.returncode == 0:
                return True
        except Exception:
            pass
    return False


def main():
    from dvae_tpu.utils import apply_platform_override
    plat = apply_platform_override()  # DVAE_PLATFORM=... before backend init
    degraded = None
    skip_probe = os.environ.get("DVAE_SKIP_PROBE", "") not in ("", "0")
    if plat is None and not skip_probe and not _device_available():
        # No explicit platform override and the accelerator is unreachable:
        # fall back to the host CPU (honestly labeled, reduced rep count)
        # rather than hanging or crashing with no benchmark line at all.
        os.environ["DVAE_PLATFORM"] = "cpu"
        apply_platform_override()
        degraded = ("accelerator unavailable (bounded init probe failed); "
                    "measured on host CPU with reduced rep counts -- NOT a "
                    "TPU number")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvae_tpu.utils import enable_compilation_cache
    enable_compilation_cache("auto")
    # TPU hardware RNG: distribution-equal draws, -22% device step time vs
    # threefry (the decode sampler's per-logit random bits are the single
    # largest op at flagship scale -- benchmarks/RESULTS.md round 3).
    # Production knob: config "prng_impl"; studies default to threefry.
    jax.config.update("jax_default_prng_impl", "rbg")

    import __graft_entry__ as ge
    from dvae_tpu.models import init_vae_params
    from dvae_tpu.training import (create_train_state, kl_weight_vector,
                                   make_train_step)

    import dataclasses

    # Headline operating point (round 4): the training-side batch-scaling
    # knee, B=512 with the pallas streaming CE (benchmarks/RESULTS.md) --
    # certified end-to-end by the B=512 flagship twin (80 epochs == the
    # B=128 twin's optimizer-step count; full paper battery;
    # evaluation_results/flagship_r4_certification/b512_certification.md).
    # The paper-protocol B=128 point is still measured and carried in
    # detail.paper_protocol_b128 for round-over-round trend continuity.
    # A degraded (CPU-fallback) run keeps B=128 + XLA CE: the pallas
    # kernel runs in interpret mode off-TPU and would never finish.
    B = 128 if degraded else 512
    cfg = ge._flagship_cfg(vocab_size=20000, emb=256, hidden=256, layers=2,
                           max_length=17)
    # the perf-recommended configuration (honest-timing A/B, RESULTS.md
    # round 2): scan recurrence + bf16 compute (pre-cast weights).
    # Parity-default runs stay f32 (reference numerics).
    cfg = dataclasses.replace(
        cfg, lstm_backend="scan", compute_dtype="bfloat16",
        fused_ce_backend="xla" if degraded else "pallas",
        # the recommended production stride for the AE-drift re-encode
        # metric (round 5: -4.6% step time, benchmarks/ae_drift_ab.py;
        # computed-step metric values bit-identical); flops_per_step/MFU
        # amortize the re-encode over the stride (utils/flops.py)
        ae_drift_every_n=1 if degraded else 5)
    # The per-step dispatch-loop diagnostic and the XLA cost analysis run
    # on the B=128 XLA-CE program (always warm in the compilation cache;
    # a single-step B=512 pallas program exists nowhere in production --
    # the driver's chunked epoch IS the unit -- and would cost a fresh
    # multi-minute compile for a number nobody uses).
    # paper-protocol trend point stays at full reference parity (ae=1)
    cfg128 = dataclasses.replace(cfg, fused_ce_backend="xla",
                                 ae_drift_every_n=1)
    batch_np = ge._synthetic_batch(cfg128, B=128, seed=0)
    batch = {k: (jnp.asarray(v) if not isinstance(v, dict)
                 else {n: jnp.asarray(a) for n, a in v.items()})
             for k, v in batch_np.items()}

    params, constants = init_vae_params(jax.random.PRNGKey(0), cfg128)
    state = create_train_state(params, 3e-4, 0)
    step = jax.jit(make_train_step(cfg128, constants, 3e-4),
                   donate_argnums=(0,))
    klw = jnp.asarray(kl_weight_vector(cfg128, {"default": 0.01}, 1.0))
    tf = jnp.asarray(0.5)
    miw = jnp.asarray(0.01)

    # warmup / compile. NOTE (round 2): through the tunneled device
    # runtime, jax.block_until_ready can return BEFORE execution completes
    # (profiler-verified), so every timing window must end in a host VALUE
    # fetch; the first timed rep absorbs queue backlog and is dropped.
    for _ in range(3):
        state, metrics, _, _ = step(state, batch, klw, tf, miw)
    float(metrics["total_loss"])

    n_steps = 8 if degraded else 32
    times = []
    for _ in range(2 if degraded else 4):
        t0 = time.time()
        for _ in range(n_steps):
            state, metrics, _, _ = step(state, batch, klw, tf, miw)
        float(metrics["total_loss"])  # host fetch = reliable barrier
        times.append((time.time() - t0) / n_steps)
    times = sorted(times[1:])
    sec_per_step_dispatch = times[len(times) // 2]

    # Headline: the PRODUCTION path. The driver defaults to fused_epoch
    # (one lax.scan device program over the epoch's stacked batches), so
    # per-step host dispatch -- ~2 ms/step of tunnel overhead in the loop
    # above -- does not exist in real training. Round-4 attribution
    # (benchmarks/epoch_census.py): the epoch program's device time equals
    # the single-step census (3.55 ms rbg); everything above it is fixed
    # per-call dispatch that amortizes as 1/S, so S must be
    # production-scale to be honest (flagship corpus epochs are S=781;
    # S=256 measures within 0.5% of S=768). Steady-state production
    # epochs are lean (keep_latent_epochs prunes -> no latent scan
    # outputs; collect_latents=False default in the harness) and the
    # recommended config sets epoch_scan_unroll=2 (math-identical,
    # tests/test_lean_epoch.py; -1.2% device time in the census).
    from benchmarks.fused_epoch_timing import time_fused_epoch
    # Headline window: S=64 == the production epoch_chunk_steps=64 of the
    # certified B=512 config, so the per-epoch-call dispatch amortization
    # in the timing matches real training exactly. The B=128 paper point
    # keeps its S=256 window (flagship epochs are S=781; S=256 measures
    # within 0.5% of S=768 -- round-4 attribution).
    S = 16 if degraded else 64
    timing = time_fused_epoch(cfg, B, S, reps=2 if degraded else 4,
                              unroll=1 if degraded else 2)
    sec_per_step = timing["sec_per_step"]

    tokens_per_batch = timing["tokens_per_batch"]
    n_chips = jax.device_count()
    tokens_per_sec_per_chip = tokens_per_batch / sec_per_step / n_chips

    paper_128 = None
    if not degraded:
        t128 = time_fused_epoch(cfg128, 128, 256, reps=4, unroll=2)
        paper_128 = {
            "seconds_per_step": round(t128["sec_per_step"], 6),
            "tokens_per_sec_per_chip": round(
                t128["tokens_per_batch"] / t128["sec_per_step"] / n_chips,
                1),
            "note": "B=128 / XLA CE / S=256 -- the paper-protocol "
                    "operating point, == the round-3 headline config; "
                    "carried for round-over-round trend continuity",
        }

    # MFU: analytic model FLOPs from the config (utils/flops.py) against
    # the device's dense peak; XLA's own executable flop count is carried
    # as a cross-check (it sees the compiled program, incl. rematerialized
    # backward matmuls).
    from dvae_tpu.utils.flops import mfu as compute_mfu, train_step_flops
    device_kind = jax.devices()[0].device_kind
    eff = compute_mfu(cfg, B, cfg.max_length, sec_per_step, device_kind)
    xla_flops = None
    try:
        if degraded:
            raise RuntimeError("skip cost analysis on degraded CPU fallback")
        lowered = jax.jit(
            make_train_step(cfg128, constants, 3e-4), donate_argnums=(0,)
        ).lower(state, batch, klw, tf, miw)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        xla_flops = float(ca.get("flops", float("nan")))
    except Exception:
        pass

    # Same-batch baseline: the torch CPU reference profile measured at
    # the SAME batch size as the headline (B=512: 80.68 s/step vs B=128:
    # 19.40 -- essentially linear in B, benchmarks/torch_reference_baseline.py
    # --batch), so the ratio stays a per-step == per-token comparison.
    vs_baseline = None
    base_name = ("BASELINE_MEASURED.json" if B == 128
                 else f"BASELINE_MEASURED_B{B}.json")
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchmarks", base_name)
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        assert base["batch_size"] == B
        vs_baseline = base["torch_cpu_seconds_per_step"] / sec_per_step

    # A degraded (CPU-fallback) run gets a DIFFERENT metric name so trend
    # tracking over the normal metric can never ingest a ~1000x-lower CPU
    # number as chip throughput; the flag is also surfaced top-level.
    print(json.dumps({
        "metric": ("train_step_tokens_per_sec_per_chip" if not degraded
                   else "train_step_tokens_per_sec_CPU_FALLBACK"),
        "degraded": bool(degraded),
        "value": round(tokens_per_sec_per_chip, 1),
        "unit": "tokens/sec/chip",
        # Top-level so round-over-round trend consumers can partition a
        # config change from a throughput change (the headline moved from
        # B=128/XLA-CE/S=256 to this point in round 4; the old point is
        # still measured under detail.paper_protocol_b128).
        "operating_point": (f"B={B}/{cfg.fused_ce_backend}-CE/S={S}/"
                            f"rbg/bf16/unroll2/ae{cfg.ae_drift_every_n}"),
        "vs_baseline": (round(vs_baseline, 2)
                        if vs_baseline is not None else None),
        "detail": {
            "seconds_per_step": round(sec_per_step, 6),
            "timed_path": f"lean fused epoch (production steady state): {S}"
                          " steps per lax.scan device program (== the"
                          " certified config's epoch_chunk_steps), unroll=2,"
                          " host fetch barrier",
            "seconds_per_step_dispatch_loop": round(sec_per_step_dispatch,
                                                    6),
            "batch_size": B,
            "fused_ce_backend": cfg.fused_ce_backend,
            "tokens_per_batch": tokens_per_batch,
            "device": str(jax.devices()[0]),
            "n_chips": n_chips,
            "degraded": degraded,
            "prng_impl": "rbg",
            "paper_protocol_b128": paper_128,
            "flops_per_step": eff["flops_per_step"],
            "achieved_tflops": round(eff["achieved_tflops"], 2),
            "peak_tflops": eff["peak_tflops"] or None,
            "mfu": (round(eff["mfu"], 4)
                    if eff["mfu"] == eff["mfu"] else None),
            "flops_breakdown": {k: int(v) for k, v in
                                train_step_flops(cfg, B,
                                                 cfg.max_length).items()},
            "xla_executable_flops_b128_step": xla_flops,
            "config": "sfu_amazon_100k scale (V=20k, H=256, 2-layer biLSTM,"
                      " adv+mi on, full fused train step); headline point ="
                      " the batch-scaling knee B=512 + pallas streaming CE,"
                      " metrics-certified end-to-end (evaluation_results/"
                      "flagship_r4_certification/b512_certification.md)",
            "baseline_caveat": "denominator is the reference's measured "
                               "computational profile on ONE CPU thread "
                               "with its always-on anomaly detection "
                               "(run.py:22); vs its intended GPU "
                               "environment the honest factor is ~2-3 "
                               "orders of magnitude lower (see "
                               "benchmarks/RESULTS.md)",
        },
    }))


if __name__ == "__main__":
    main()
