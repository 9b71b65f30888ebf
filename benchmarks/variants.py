"""Single source of truth for the benchmark variant -> ModelConfig
override table, shared by ab_one.py (timing) and profile_census.py
(xprof census) so a new knob never has to be added in two places."""

VARIANTS = {
    "scan_f32": dict(lstm_backend="scan"),
    "pallas_f32": dict(lstm_backend="pallas"),
    "scan_bf16": dict(lstm_backend="scan", compute_dtype="bfloat16"),
    "pallas_bf16": dict(lstm_backend="pallas", compute_dtype="bfloat16"),
    "pallas_ce": dict(lstm_backend="pallas", fused_ce_backend="pallas"),
    "scan_bf16_pce": dict(lstm_backend="scan", compute_dtype="bfloat16",
                          fused_ce_backend="pallas"),
    "scan_bf16_cdf": dict(lstm_backend="scan", compute_dtype="bfloat16",
                          decoder_sampler="cdf"),
    "scan_bf16_cond": dict(lstm_backend="scan", compute_dtype="bfloat16",
                           cond_sampler=True),
    # the pre-round-3 unconditional program (cond_sampler now defaults on)
    "scan_bf16_nocond": dict(lstm_backend="scan", compute_dtype="bfloat16",
                             cond_sampler=False),
    "xla_ce": dict(lstm_backend="pallas", fused_ce_backend="xla"),
}
