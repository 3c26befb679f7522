"""Batch readers with background prefetch.

Reference pattern: a daemon thread fills a bounded queue from disk while the
train loop consumes (util/data_reader.py:8-66, util/data_reader_refvos.py:48-110).
Kept here (threads + queue) because it is exactly the right host-side shape
for feeding a TPU: the accelerator step runs async while the host decodes the
next batch.  Adds what the reference lacks: batch COLLATION to [B, ...]
arrays (the reference assembles batches in the train loop, one sess.run feed
per sample — trainval_model.py:82-96) and deterministic epoch seeding.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Callable, Iterator, Optional, Sequence

import numpy as np


class PrefetchReader:
    """Generic sample reader: `load_fn(index) -> dict of np arrays`,
    shuffled per epoch, prefetched by a daemon thread."""

    def __init__(self, num_samples: int, load_fn: Callable[[int], dict],
                 shuffle: bool = True, prefetch_num: int = 8, seed: int = 0):
        self.num_samples = num_samples
        self.load_fn = load_fn
        self.shuffle = shuffle
        self.n_batch = 0
        self.n_epoch = 0
        self._rng = np.random.default_rng(seed)
        self._queue: "queue.Queue[dict]" = queue.Queue(maxsize=prefetch_num)
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        order = np.arange(self.num_samples)
        pos = 0
        while True:
            if pos == 0 and self.shuffle:
                order = self._rng.permutation(self.num_samples)
            try:
                sample = self.load_fn(int(order[pos]))
            except BaseException as e:  # propagate to the consumer —
                # a silently dead worker deadlocks read() forever
                self._queue.put(e, block=True)
                return
            self._queue.put(sample, block=True)
            pos = (pos + 1) % self.num_samples

    def read(self) -> dict:
        sample = self._queue.get(block=True)
        if isinstance(sample, BaseException):
            raise RuntimeError(
                f"prefetch worker failed: {sample!r}") from sample
        self.n_batch = (self.n_batch + 1) % self.num_samples
        self.n_epoch += (self.n_batch == 0)
        return sample

    def read_batch(self, batch_size: int, keys: Optional[Sequence[str]] = None
                   ) -> dict:
        """Collate `batch_size` samples into stacked [B, ...] arrays."""
        samples = [self.read() for _ in range(batch_size)]
        keys = keys or samples[0].keys()
        out = {}
        for k in keys:
            vals = [np.asarray(s[k]) for s in samples]
            out[k] = np.stack(vals, axis=0)
        return out


class NpzReader(PrefetchReader):
    """Offline-batch reader over per-sample .npz files written by the batch
    builders (reference: util/data_reader.py reading build_batches.py output
    '<folder>/<prefix>_<n>.npz')."""

    def __init__(self, data_folder: str, data_prefix: str, shuffle=True,
                 prefetch_num: int = 8, seed: int = 0, id2name=None):
        """`id2name`: optional {str(sample_id): image_name} map attached to
        each sample as 'img_name' (reference util/data_reader_ignore.py:8-23,
        used by visualization drivers to name their dumps)."""
        self.data_folder = data_folder
        self.data_prefix = data_prefix
        self.id2name = id2name
        n = 0
        while os.path.isfile(self._path(n)):
            n += 1
        if n == 0:
            raise RuntimeError(f"no batches found at {data_folder}/"
                               f"{data_prefix}_*.npz")
        super().__init__(n, self._load, shuffle, prefetch_num, seed)

    def _path(self, i: int) -> str:
        return os.path.join(self.data_folder, f"{self.data_prefix}_{i}.npz")

    def _load(self, i: int) -> dict:
        with np.load(self._path(i), allow_pickle=True) as z:
            out = {k: z[k] for k in z.files}
        if self.id2name is not None:
            out["img_name"] = self.id2name[str(i)]
        return out


def batch_iterator(reader: PrefetchReader, batch_size: int,
                   keys: Optional[Sequence[str]] = None) -> Iterator[dict]:
    while True:
        yield reader.read_batch(batch_size, keys)
