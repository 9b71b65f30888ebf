"""MiniSummaryWriter: files must be readable by the standard TensorBoard
event loader, and fast."""

import glob
import time

import numpy as np
import pytest

from dvae_tpu.training.tb_writer import MiniSummaryWriter, crc32c


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert crc32c(b"") == 0x0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes([0] * 32)) == 0x8A9136AA


def test_events_readable_by_tensorboard(tmp_path):
    tb = pytest.importorskip("tensorboard")
    w = MiniSummaryWriter(str(tmp_path))
    values = [("loss", 1.5, 0), ("loss", 1.25, 1), ("acc/top1", 0.75, 1)]
    for tag, v, s in values:
        w.add_scalar(tag, v, s)
    w.close()

    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader)
    path = glob.glob(str(tmp_path / "events.out.tfevents.*"))[0]
    events = list(EventFileLoader(path).Load())
    # first event is the file_version header
    assert events[0].file_version == "brain.Event:2"
    got = []
    for ev in events[1:]:
        for val in ev.summary.value:
            # modern loaders migrate simple_value into tensor.float_val
            v = (val.tensor.float_val[0] if val.tensor.float_val
                 else val.simple_value)
            got.append((val.tag, round(v, 6), ev.step))
    assert got == [(t, v, s) for t, v, s in values]


def test_writer_speed(tmp_path):
    w = MiniSummaryWriter(str(tmp_path))
    t0 = time.time()
    for i in range(5000):
        w.add_scalar("step_total_loss", float(i), i)
    w.close()
    dt = time.time() - t0
    # torch's writer needs ~12s for this on this host; ours must be fast
    assert dt < 2.0, f"too slow: {dt:.2f}s for 5000 scalars"
