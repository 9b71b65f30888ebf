"""Experiment logging: scalar accumulator, TensorBoard/JSONL writers,
latent-metadata logs, reconstruction logs.

Artifact contract (identical to the reference, SURVEY.md section 1):
  logs/{name}/vocab.txt
  logs/{name}/metadata/ordered_ids/{dataset}_{epoch}.log
  logs/{name}/metadata/{z,mu,logvar}/{dataset}_{latent}_{epoch}.log  (CSV,
      one row per example, 4-decimal floats -- reference run.py:166-194)
  logs/{name}/reconstructions_{dataset}.log ('x' ==> 'x_hat' per epoch,
      reference vae/utils.py:253-262)
  logs/{name}/config_epoch{N}.json
  logs/{name}/run.log
  runs/{name}/{train,dev,test}/  (TensorBoard scalars, key taxonomy
      step_*/avg_* -- reference run.py:43-119)
"""

from __future__ import annotations

import csv
import json
import os
import queue
import re
import threading
from typing import Any, Dict, List, Optional, Sequence

import numpy as np


class ScalarWriter:
    """TensorBoard writer (fast built-in encoder, see tb_writer.py) with a
    JSONL mirror.

    Writes are asynchronous: add_scalar enqueues (tag, value, step) and a
    per-writer worker thread does the JSON/TB encoding, so the ~60k
    per-step scalar records of a flagship epoch never sit on the training
    thread. flush()/close() drain the queue first, so anything written
    before them is durable and ordered."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._tb = None
        if use_tensorboard:
            from dvae_tpu.training.tb_writer import MiniSummaryWriter
            self._tb = MiniSummaryWriter(log_dir)
        self._jsonl_path = os.path.join(log_dir, "scalars.jsonl")
        self._jsonl = open(self._jsonl_path, "a")
        self._q: queue.Queue = queue.Queue()
        self._worker = threading.Thread(target=self._drain, daemon=True)
        self._worker.start()

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self._q.put((tag, float(value), int(step)))

    def _write_one(self, tag: str, value: float, step: int) -> None:
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        self._jsonl.write(json.dumps(
            {"tag": tag, "value": value, "step": step}) + "\n")

    def _drain(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            if isinstance(item, threading.Event):
                item.set()
                continue
            try:
                self._write_one(*item)
            except Exception:  # keep draining: a dead worker would hang
                import logging as _logging  # flush()/close() barriers
                _logging.exception("scalar write failed")

    def _barrier(self) -> None:
        if not self._worker.is_alive():
            return
        ev = threading.Event()
        self._q.put(ev)
        ev.wait()

    def flush(self) -> None:
        self._barrier()
        if self._tb is not None:
            self._tb.flush()
        self._jsonl.flush()

    def close(self) -> None:
        self._barrier()
        self._q.put(None)
        self._worker.join()
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()


class LossLogger:
    """Nested-dict loss accumulator (reference LossLogger, run.py:43-119).

    update() appends scalars (recursing into dicts); log_step writes the
    last value per key with prefix 'step'; log_epoch writes means with
    prefix 'avg'; summarize returns (mean, std).
    """

    def __init__(self, writer: Optional[ScalarWriter], epoch: int):
        self.losses: Dict[str, Any] = {}
        self.writer = writer
        self.epoch = epoch

    def update(self, d: Dict[str, Any], subdict: Optional[Dict] = None):
        target = self.losses if subdict is None else subdict
        for key, val in d.items():
            if isinstance(val, dict):
                target.setdefault(key, {})
                self.update(val, subdict=target[key])
            else:
                target.setdefault(key, []).append(_to_scalar(val))

    def _log(self, i: int, subdict, base_keystr: str, collapse_fn):
        to_log = self.losses if subdict is None else subdict
        for key, val in to_log.items():
            keystr = f"{base_keystr}_{key}"
            if isinstance(val, dict):
                self._log(i, val, keystr, collapse_fn)
            else:
                if self.writer is not None:
                    self.writer.add_scalar(keystr, collapse_fn(val), i)

    def log_epoch(self):
        self._log(self.epoch, None, "avg", np.mean)

    def log_step(self, step: int):
        self._log(step, None, "step", lambda v: v[-1])

    def summarize(self, key: str):
        vals = self.losses.get(key, [0.0])
        return float(np.mean(vals)), float(np.std(vals))


def _to_scalar(x):
    if hasattr(x, "item"):
        return float(np.asarray(x))
    return float(x)


def log_params(latent_logs: Dict[str, Dict[str, List[np.ndarray]]],
               example_ids: Sequence[str], logdir: str, dataset_name: str,
               epoch: int, keep_epochs: int = 0) -> None:
    """Write the latent-parameter metadata files consumed by the evaluation
    suite (reference run.py:166-194). latent_logs maps
    {latent_name: {param_name: [per-example rows]}}. keep_epochs > 0
    deletes this dataset's metadata for epochs <= epoch - keep_epochs
    after writing (the evaluation suite reads the latest epoch only --
    evaluation/metadata.py get_last_epoch)."""
    metadata_dir = os.path.join(logdir, "metadata")
    ids_dir = os.path.join(metadata_dir, "ordered_ids")
    os.makedirs(ids_dir, exist_ok=True)
    with open(os.path.join(ids_dir, f"{dataset_name}_{epoch}.log"),
              "w") as f:
        for i in example_ids:
            f.write(f"{i}\n")
    for latent_name, per_param in latent_logs.items():
        for param_name, rows in per_param.items():
            param_dir = os.path.join(metadata_dir, param_name)
            os.makedirs(param_dir, exist_ok=True)
            path = os.path.join(
                param_dir, f"{dataset_name}_{latent_name}_{epoch}.log")
            arr = np.atleast_2d(np.asarray(rows))
            # Fast path: native C formatter (native/tokenizer.cpp
            # write_csv_f32), byte-identical to np.savetxt's "%.4f" and
            # GIL-free, so this background thread doesn't steal the
            # training thread's core. float32 only -- a float64 input
            # could round differently at the 4th decimal after downcast.
            from dvae_tpu.data import native as _native
            if arr.dtype == np.float32 and _native.csv_available() and \
                    _native.write_csv_f32(path, arr):
                continue
            # np.savetxt formats in C: ~10x faster than per-value Python
            # formatting at 100k-example scale; output is byte-identical
            # to the reference's csv.writer of "%.4f" cells.
            np.savetxt(path, arr, fmt="%.4f", delimiter=",")
    if keep_epochs > 0:
        _prune_metadata(metadata_dir, dataset_name, epoch - keep_epochs)


def _prune_metadata(metadata_dir: str, dataset_name: str,
                    max_stale_epoch: int) -> None:
    """Delete one dataset's per-epoch metadata CSVs (mu/logvar/z +
    ordered_ids) for every epoch <= max_stale_epoch."""
    stale = re.compile(
        rf"^{re.escape(dataset_name)}_(?:.+_)?(\d+)\.log$")
    for sub in os.listdir(metadata_dir):
        subdir = os.path.join(metadata_dir, sub)
        if not os.path.isdir(subdir):
            continue
        for f in os.listdir(subdir):
            m = stale.match(f)
            if m and int(m.group(1)) <= max_stale_epoch:
                try:
                    os.remove(os.path.join(subdir, f))
                except OSError:
                    pass


_metadata_threads: List = []


def log_params_async(latent_logs, example_ids, logdir: str,
                     dataset_name: str, epoch: int,
                     keep_epochs: int = 0) -> None:
    """Run log_params in a background thread so the ~1 s of CSV formatting
    (1 CPU core, ~2M floats at 100k scale) overlaps the next epoch's device
    compute. Files are per-(dataset, epoch) unique so writes never contend;
    call wait_for_metadata_writes() before reading them back or exiting."""
    _metadata_threads[:] = [t for t in _metadata_threads if t.is_alive()]
    t = threading.Thread(
        target=log_params,
        args=(latent_logs, example_ids, logdir, dataset_name, epoch,
              keep_epochs),
        daemon=True)
    t.start()
    _metadata_threads.append(t)


def log_latents_async(latents_seq, masks, example_ids, logdir: str,
                      dataset_name: str, epoch: int,
                      keep_epochs: int = 0) -> None:
    """log_params_async, but starting from the [S, B, D]-shaped per-step
    DEVICE arrays the fused epoch returns: the device->host transfer (the
    single largest host-side cost of a flagship epoch, ~150 MB through a
    slow device link), the mask gather, and the CSV formatting all run in
    the background thread, overlapped with the next epoch's compute. The
    caller should kick off the DMA first via copy_to_host_async.

    latents_seq may also be a LIST of such pytrees (the chunked-epoch
    path, config `epoch_chunk_steps`): each element carries [Ci, B, D] or
    [B, D] leaves and the chunks concatenate, in order, to the epoch's
    S * B example rows."""
    parts = latents_seq if isinstance(latents_seq, list) else [latents_seq]

    def work(latents_box):
        keep = np.concatenate(
            [np.asarray(m).astype(bool) for m in masks])

        def host_rows(arr):
            a = np.asarray(arr)          # completes the async DMA
            return a.reshape(-1, a.shape[-1])

        # materialize EVERYTHING to host first and drop the device refs,
        # so the ~150 MB of per-epoch device latents are freed as soon as
        # the DMA finishes rather than pinned until the CSVs are written
        chunks = latents_box.pop()
        gathered: Dict[str, Dict[str, Any]] = {}
        for part in chunks:
            for ln, per_param in part.items():
                slot = gathered.setdefault(ln, {})
                for pn, arr in per_param.items():
                    slot.setdefault(pn, []).append(host_rows(arr))
        gathered = {ln: {pn: np.concatenate(rows)[keep]
                         for pn, rows in per_param.items()}
                    for ln, per_param in gathered.items()}
        log_params(gathered, example_ids, logdir, dataset_name, epoch,
                   keep_epochs)

    # backpressure: at most 2 epochs of metadata in flight -- a slow disk
    # must not accumulate unbounded threads + pinned device buffers
    _metadata_threads[:] = [t for t in _metadata_threads if t.is_alive()]
    while len(_metadata_threads) >= 2:
        _metadata_threads.pop(0).join()
    box = [parts]
    del latents_seq, parts
    t = threading.Thread(target=work, args=(box,), daemon=True)
    t.start()
    _metadata_threads.append(t)


def wait_for_metadata_writes() -> None:
    for t in _metadata_threads:
        t.join()
    _metadata_threads.clear()


def append_reconstructions(pairs, logdir: str, name: str,
                           epoch: int) -> None:
    """Append `'input' ==> 'reconstruction'` lines per epoch
    (reference vae/utils.py:253-262)."""
    path = os.path.join(logdir, f"reconstructions_{name}.log")
    with open(path, "a") as f:
        f.write(f"EPOCH {epoch}\n")
        for x, r in pairs:
            f.write(f"'{x}' ==> '{r}'\n")
