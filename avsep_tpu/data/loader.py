"""Prefetching batch loader.

Replaces the reference's ``torch.utils.data.DataLoader`` + ``ConcatDataset``
(reference ``main.py:633-657``): a thread-pool assembles batches of host
numpy arrays while the previous step runs on the TPU; string fields stay on
host.  ``iter_forever`` reproduces the loader-restart-on-epoch-end behavior
of ``get_av_ao_batch`` (reference ``main.py:585-598``).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Sequence

import numpy as np


class ConcatDataset:
    """Concatenation of map-style datasets (torch ConcatDataset shape)."""

    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self.offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self.offsets[-1])

    def __getitem__(self, i: int):
        k = int(np.searchsorted(self.offsets, i, side="right") - 1)
        return self.datasets[k][i - int(self.offsets[k])]


def collate(samples: List[Dict]) -> Dict:
    """Stack array fields; keep str/object fields as lists."""
    out: Dict = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        else:
            out[key] = vals
    return out


class BatchLoader:
    """Shuffling, prefetching batch iterator over a map-style dataset."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 8, seed: int = 0, drop_last: bool = False,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._epoch = 0

    def _index_batches(self) -> List[np.ndarray]:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + self._epoch).shuffle(idx)
        batches = [idx[i:i + self.batch_size]
                   for i in range(0, n, self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict]:
        batches = self._index_batches()
        self._epoch += 1
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                for b in batches:
                    if stop.is_set():
                        return
                    futures = [pool.submit(self.dataset.__getitem__, int(i))
                               for i in b]
                    q.put(collate([f.result() for f in futures]))
            finally:
                q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
            pool.shutdown(wait=False)


def iter_forever(loader: BatchLoader) -> Iterator[Dict]:
    """Endless iterator with epoch restarts (reference main.py:585-598)."""
    while True:
        yield from loader
