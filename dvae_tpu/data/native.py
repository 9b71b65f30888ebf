"""ctypes bindings for the native (C++) tokenizer/encoder.

Builds native/libdvae_native.so on first use (g++, see native/Makefile) and
exposes:
  - tokenize_corpus(sentences, lowercase) -> list[list[str]] (no SOS/EOS)
  - NativeVocab.encode(sentences, ...) -> (ids [n, max_len] int32,
      lengths [n] int32) in one C pass
Falls back silently to the pure-Python pipeline when the toolchain or the
library is unavailable (callers check `available()`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdvae_native.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    try:
        # cross-process exclusive lock: concurrent sessions in the same
        # checkout must not rewrite the .so while another dlopens it
        import fcntl
        with open(os.path.join(_NATIVE_DIR, ".build.lock"), "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        # make is a no-op when the .so is newer than the sources; it
        # rebuilds a stale committed library after source changes
        if not _build() and not os.path.exists(_LIB_PATH):
            _build_failed = True
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.vocab_create.restype = ctypes.c_void_p
        lib.vocab_create.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_int64),
                                     ctypes.c_int32]
        lib.vocab_free.argtypes = [ctypes.c_void_p]
        lib.tokenize_encode.restype = ctypes.c_int64
        lib.tokenize_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        lib.tokenize_corpus.restype = ctypes.c_int64
        lib.tokenize_corpus.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
            ctypes.c_int32, ctypes.c_char_p, ctypes.c_int64]
        if hasattr(lib, "write_csv_f32"):  # absent in a stale prebuilt .so
            lib.write_csv_f32.restype = ctypes.c_int64
            lib.write_csv_f32.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def csv_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "write_csv_f32")


def write_csv_f32(path: str, arr: np.ndarray) -> bool:
    """Write a 2-D array as "%.4f" CSV, byte-identical to
    np.savetxt(fmt='%.4f', delimiter=',') but formatted in C without the
    GIL (ctypes releases it for the call's duration). Returns False when
    the native library is unavailable (caller falls back to savetxt)."""
    lib = _load()
    if lib is None or not hasattr(lib, "write_csv_f32"):
        return False
    a = np.ascontiguousarray(arr, dtype=np.float32)
    assert a.ndim == 2
    n = lib.write_csv_f32(path.encode("utf-8"),
                          a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                          a.shape[0], a.shape[1])
    if n < 0:
        raise OSError(f"native CSV writer failed to open or fully write "
                      f"{path!r} (disk full / permission?)")
    return True


def _pack(sentences: Sequence[str]) -> Tuple[bytes, np.ndarray]:
    encoded = [s.encode("utf-8") for s in sentences]
    offs = np.zeros(len(encoded) + 1, np.int64)
    np.cumsum([len(b) for b in encoded], out=offs[1:])
    return b"".join(encoded), offs


def tokenize_corpus(sentences: Sequence[str],
                    lowercase: bool = True) -> List[List[str]]:
    """Native tokenization, identical output to
    data.text.preprocess_sentences(..., sos=None, eos=None)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    text, offs = _pack(sentences)
    cap = max(len(text) * 2 + 16 * len(sentences) + 64, 1024)
    out = ctypes.create_string_buffer(cap)
    n = lib.tokenize_corpus(
        text, offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(sentences), int(lowercase), out, cap)
    assert n >= 0, "native tokenize buffer overflow"
    rows = out.raw[:n].decode("utf-8").split("\n")[:len(sentences)]
    return [row.split(" ") if row else [] for row in rows]


class NativeVocab:
    """Hash-table vocab held in native memory for one-pass encode."""

    def __init__(self, vocab: Sequence[str]):
        lib = _load()
        assert lib is not None, "native library unavailable"
        self._lib = lib
        words, offs = _pack(vocab)
        self._handle = lib.vocab_create(
            words, offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(vocab))
        self.size = len(vocab)

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib is not None:
            self._lib.vocab_free(self._handle)
            self._handle = None

    def encode(self, sentences: Sequence[str], lowercase: bool,
               sos_id: int, eos_id: int, unk_id: int, pad_id: int,
               max_len: int) -> Tuple[np.ndarray, np.ndarray]:
        """Tokenize + encode the whole corpus in one native pass."""
        text, offs = _pack(sentences)
        n = len(sentences)
        ids = np.empty((n, max_len), np.int32)
        lengths = np.empty(n, np.int32)
        ret = self._lib.tokenize_encode(
            self._handle, text,
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
            int(lowercase), sos_id, eos_id, unk_id, pad_id, max_len,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if ret < 0:
            raise ValueError(
                f"sentence {-ret - 1} exceeds max_len={max_len}")
        return ids, lengths
