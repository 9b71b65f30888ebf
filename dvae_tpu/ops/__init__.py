from dvae_tpu.ops.pallas_lstm import lstm_scan_pallas, pallas_lstm_supported

__all__ = ["lstm_scan_pallas", "pallas_lstm_supported"]
