"""Analytic per-step FLOPs accounting -> MFU.

Model FLOPs (the standard MFU numerator: algorithmic multiply-adds x 2,
counted from the config, independent of how XLA compiles them) for the
fused train step in training/step.py:

  main objective forward
    encoder: per layer/direction, the whole-sequence input projection
      [B,T,I]x[I,4H] plus T recurrent [B,H]x[H,4H] steps (models/lstm.py)
    decoder: T-1 steps of the L-layer LSTM stack (models/vae.py
      decoder_hidden_step) + the [B,H]x[H,V] vocab projection per step
    heads: c2p latent heads, z2h, discriminator/adversary linears, CLUB
      estimator MLPs (models/club.py)
  main backward: 2x forward matmul FLOPs (each matmul contributes a
    dL/dx and a dL/dW product of the same size); the fused-CE backward
    additionally REMATERIALIZES the vocab projection (ops/fused_ce.py),
    adding one forward-sized projection pass
  adversary/CLUB gradient groups: forward + 2x backward over their small
    heads (the encoder is behind stop_gradient)
  AE-drift re-encode: one more encoder + c2p forward (training/step.py)

Elementwise work (gates, dropout, softmax, optimizer) is omitted -- it is
O(BTH) against O(BTH^2) matmuls, <1% at flagship scale.

The reference has no FLOPs/MFU accounting anywhere (BASELINE.md); this is
what converts tokens/sec into an absolute hardware-efficiency claim.
"""

from __future__ import annotations

from typing import Dict

from dvae_tpu.config import ModelConfig

# Dense peak TFLOP/s by TPU device kind (per chip). v5e: 197 bf16 / 98 f32.
PEAK_FLOPS = {
    "TPU v5 lite": {"bfloat16": 197e12, "float32": 98e12},
    "TPU v5": {"bfloat16": 459e12, "float32": 229e12},
    "TPU v4": {"bfloat16": 275e12, "float32": 137e12},
    "TPU v6 lite": {"bfloat16": 918e12, "float32": 459e12},
}


def _lstm_seq_flops(B: int, T: int, I: int, H: int) -> int:
    """One direction, whole sequence: input proj + recurrent proj."""
    return 2 * B * T * I * 4 * H + 2 * B * T * H * 4 * H


def encoder_flops(cfg: ModelConfig, B: int, T: int) -> int:
    if cfg.bow_encoder:
        return 0  # embedding lookup + max-pool: no matmuls
    ndir = 2 if cfg.bidirectional else 1
    total = 0
    I = cfg.emb_dim
    for _ in range(cfg.enc_layers):
        total += ndir * _lstm_seq_flops(B, T, I, cfg.hidden_dim)
        I = cfg.hidden_dim * ndir
    return total


def latent_head_flops(cfg: ModelConfig, B: int,
                      include_z2h: bool = True) -> int:
    """c2p heads (context -> 2*dim each) + z2h."""
    c2p = 2 * B * cfg.context_dim * sum(2 * d for d in cfg.latent_dims)
    z2h = 2 * B * cfg.total_latent_dim * 2 * cfg.hidden_dim * cfg.dec_layers
    return c2p + (z2h if include_z2h else 0)


def _small_head_flops(cfg: ModelConfig, B: int) -> int:
    """Discriminator + adversary linears + CLUB estimator MLP forwards."""
    dsc = sum(2 * B * cfg.latent_dim_of(n) * cfg.dsc_output_dim_of(n)
              for n in cfg.dsc_names)
    adv = sum(2 * B * cfg.latent_dim_of(ln) * cfg.dsc_output_dim_of(lab)
              for ln, lab in cfg.adv_pairs) if cfg.adversarial_loss else 0
    club = 0
    if cfg.mi_loss:
        for a, b in cfg.mi_pairs:
            xd, yd, h = (cfg.latent_dim_of(a), cfg.latent_dim_of(b),
                         cfg.mi_hidden_of((a, b)) // 2)
            # mu and logvar nets, each x -> h -> y (models/club.py)
            club += 2 * (2 * B * xd * h + 2 * B * h * yd)
    return dsc + adv + club


def decoder_flops(cfg: ModelConfig, B: int, T: int,
                  include_projection: bool = True) -> int:
    steps = T - 1  # position 0 is the hardcoded SOS row
    total = 0
    I = cfg.emb_dim
    for _ in range(cfg.dec_layers):
        total += (2 * B * steps * I * 4 * cfg.hidden_dim
                  + 2 * B * steps * cfg.hidden_dim * 4 * cfg.hidden_dim)
        I = cfg.hidden_dim
    if include_projection:
        total += 2 * B * steps * cfg.hidden_dim * cfg.out_vocab_size
    return total


def train_step_flops(cfg: ModelConfig, B: int, T: int) -> Dict[str, int]:
    """FLOPs breakdown of ONE fused train step (training/step.py), at the
    model's static [B, T] shape."""
    enc = encoder_flops(cfg, B, T)
    dec = decoder_flops(cfg, B, T)
    proj = 2 * B * (T - 1) * cfg.hidden_dim * cfg.out_vocab_size
    heads = latent_head_flops(cfg, B) + _small_head_flops(cfg, B)
    fwd = enc + dec + heads
    # backward: 2x every forward matmul; the fused CE also rematerializes
    # the projection once (ops/fused_ce.py _bwd)
    bwd = 2 * fwd + (proj if cfg.fused_decoder_ce else 0)
    # adversary + CLUB optimizer groups: forward + backward over the small
    # heads only (z is detached)
    aux = 3 * _small_head_flops(cfg, B)
    # AE-drift re-encode with updated params: encoder + c2p only -- the
    # re-encode path (step.py "autoencoding drift") never runs z2h.
    # Amortized over the config's stride (ae_drift_every_n lax.cond-skips
    # it off-stride) so flops_per_step and MFU describe the average step
    # the measured program actually executes.
    stride = max(1, getattr(cfg, "ae_drift_every_n", 1))
    reenc = (enc + latent_head_flops(cfg, B, include_z2h=False)) // stride
    total = fwd + bwd + aux + reenc
    return {"forward": fwd, "backward": bwd, "aux_groups": aux,
            "reencode": reenc, "reencode_stride": stride, "total": total}


def peak_flops_per_chip(device_kind: str, compute_dtype: str) -> float:
    """Dense peak for MFU's denominator; 0.0 when the device is unknown
    (callers then omit the MFU claim rather than fabricate one)."""
    for kind, peaks in PEAK_FLOPS.items():
        if device_kind.startswith(kind):
            return peaks.get(compute_dtype, peaks["float32"])
    return 0.0


def mfu(cfg: ModelConfig, B: int, T: int, seconds_per_step: float,
        device_kind: str) -> Dict[str, float]:
    """Model FLOPs utilization of one chip at the measured step time."""
    fl = train_step_flops(cfg, B, T)
    peak = peak_flops_per_chip(device_kind, cfg.compute_dtype)
    achieved = fl["total"] / seconds_per_step
    return {
        "flops_per_step": float(fl["total"]),
        "achieved_tflops": achieved / 1e12,
        "peak_tflops": peak / 1e12,
        "mfu": (achieved / peak) if peak else float("nan"),
    }
