from dvae_tpu.ops.pallas_lstm import lstm_scan_pallas, pallas_lstm_supported
from dvae_tpu.ops.fused_ce import out_proj_ce_sample, sos_position_ce
from dvae_tpu.ops.pallas_ce import pallas_ce_sample, pallas_ce_supported

__all__ = ["lstm_scan_pallas", "pallas_lstm_supported",
           "out_proj_ce_sample", "sos_position_ce",
           "pallas_ce_sample", "pallas_ce_supported"]
