"""Minimal, fast TensorBoard event writer.

torch.utils.tensorboard costs ~2.4 ms per scalar on this host (protobuf
construction + per-event CRC in Python via the tensorboard package): at the
reference's logging taxonomy (~50 per-step scalars) that is ~13 s/epoch --
more than the entire fused device epoch. This module hand-encodes the
Event/Summary protobuf wire format and TFRecord framing (CRC32C with the
masked-CRC trick) with no proto or TF dependency, ~100x faster, producing
files the standard TensorBoard loader reads (verified in
tests/test_tb_writer.py against tensorboard's own EventFileLoader).
"""

from __future__ import annotations

import os
import socket
import struct
import time
from typing import List

# ---- CRC32C (Castagnoli), table-driven ----
_CRC_TABLE: List[int] = []


def _build_table():
    poly = 0x82F63B78
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ (poly if crc & 1 else 0)
        _CRC_TABLE.append(crc)


_build_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    table = _CRC_TABLE
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return ((((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF)


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode_event(wall_time: float, step: int, payload: bytes) -> bytes:
    """Event proto: 1=wall_time(double), 2=step(int64), payload appended
    (already-encoded optional fields such as summary or file_version)."""
    out = bytearray()
    out += b"\x09" + struct.pack("<d", wall_time)
    if step:
        out += b"\x10" + _varint(step)
    out += payload
    return bytes(out)


def _scalar_summary(tag: str, value: float) -> bytes:
    tag_b = tag.encode("utf-8")
    val = (b"\x0a" + _varint(len(tag_b)) + tag_b
           + b"\x15" + struct.pack("<f", value))
    summary = b"\x0a" + _varint(len(val)) + val
    return b"\x2a" + _varint(len(summary)) + summary


def _tfrecord(data: bytes) -> bytes:
    length = struct.pack("<Q", len(data))
    return (length + struct.pack("<I", _masked_crc(length)) + data
            + struct.pack("<I", _masked_crc(data)))


class MiniSummaryWriter:
    """Scalar-only TensorBoard writer (events.out.tfevents.* files)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        fname = (f"events.out.tfevents.{int(time.time())}."
                 f"{socket.gethostname()}.{os.getpid()}.v2")
        self._f = open(os.path.join(log_dir, fname), "wb")
        version = b"\x1a" + _varint(len(b"brain.Event:2")) + b"brain.Event:2"
        self._f.write(_tfrecord(_encode_event(time.time(), 0, version)))
        self._buf = bytearray()

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        ev = _encode_event(time.time(), int(step),
                           _scalar_summary(tag, float(value)))
        self._buf += _tfrecord(ev)
        if len(self._buf) > 1 << 20:
            self.flush()

    def flush(self) -> None:
        if self._buf:
            self._f.write(self._buf)
            self._buf = bytearray()
        self._f.flush()

    def close(self) -> None:
        self.flush()
        self._f.close()
