"""Prefetching host input pipeline.

Replaces the reference's torch DataLoader workers (`data/build.py:49-90`)
with a thread pool decoding/augmenting ahead of the accelerator and a small
device-prefetch queue: while the TPU runs step N, workers assemble batch N+1
and `jax.device_put` overlaps the host->HBM transfer (SURVEY.md §7.3.6).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def _stack(examples):
    batch = {}
    for k in examples[0]:
        vals = [e[k] for e in examples]
        if isinstance(vals[0], str):
            batch[k] = vals
        else:
            batch[k] = np.stack(vals)
    return batch


class PrefetchLoader:
    """Iterable over stacked numpy batches with background workers."""

    def __init__(self, dataset, batch_size, shuffle=False, num_workers=2,
                 seed=0, drop_last=True, prefetch=2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def _index_order(self, epoch):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(idx)
        return idx

    def epoch(self, epoch=0):
        order = self._index_order(epoch)
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order) - (self.batch_size - 1 if self.drop_last else 0),
                           self.batch_size)
        ]
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for bi, idxs in enumerate(batches):
                    if stop.is_set():
                        return
                    rngs = [
                        np.random.default_rng((self.seed, epoch, bi, int(i)))
                        for i in idxs
                    ]
                    examples = list(
                        pool.map(
                            lambda a: self.dataset.__getitem__(int(a[0]), rng=a[1]),
                            zip(idxs, rngs),
                        )
                    )
                    out_q.put(_stack(examples))
            out_q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()

    def __iter__(self):
        return self.epoch(0)


def device_prefetch(iterator, sharding=None, depth=2, timings=None):
    """Move batches to device ahead of consumption (double-buffering).

    `timings`: optional dict accumulating host seconds spent issuing the
    device_put transfers under key "transfer" (loop-bucket attribution)."""
    import jax
    import time

    buf = []
    def put(b):
        t0 = time.perf_counter()
        if sharding is not None:
            out = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding)
                if isinstance(x, np.ndarray)
                else x,
                b,
            )
        else:
            out = jax.tree_util.tree_map(
                lambda x: jax.device_put(x) if isinstance(x, np.ndarray) else x,
                b,
            )
        if timings is not None:
            timings["transfer"] = (
                timings.get("transfer", 0.0) + time.perf_counter() - t0
            )
        return out

    it = iter(iterator)
    try:
        for _ in range(depth):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    for nxt in it:
        out = buf.pop(0)
        buf.append(put(nxt))
        yield out
    for b in buf:
        yield b
