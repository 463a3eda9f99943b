"""Host-side batch pipeline: threaded prefetching loader over numpy samples.

Replaces the reference's `torch.utils.data.DataLoader(num_workers=4,
pin_memory=True)` (coach.py:67-68) with a thread-pool prefetcher producing
device-ready fixed-shape numpy batches. Image decode/resize releases the GIL
inside PIL/numpy, so threads achieve the same overlap as worker processes
without pickling, and the arrays feed `jax.device_put` directly.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

import numpy as np


def collate(samples: List[Dict]) -> Dict:
    """Stack a list of sample dicts into a batch dict. Array fields gain a
    leading batch axis; strings become lists."""
    out: Dict = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        elif isinstance(vals[0], (int, float, np.integer, np.floating)):
            out[key] = np.asarray(vals)
        else:
            out[key] = vals
    return out


class DataLoader:
    """Iterable over batches with background prefetch.

    shuffle uses a per-epoch seeded rng so runs are reproducible under the
    global seed like the reference's seeded torch DataLoader."""

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 num_workers: int = 4, seed: int = 0, drop_last: bool = False,
                 prefetch: int = 4, num_shards: int = 1, shard_id: int = 0):
        """num_shards/shard_id: multi-host data sharding. `batch_size` stays
        the GLOBAL batch; every process walks the identical (seeded) global
        batch schedule but loads/decodes only its contiguous
        batch_size/num_shards chunk, which `parallel.make_global_array`
        assembles into the globally-sharded batch array. ALL partial tail
        batches are dropped (fixed shapes across hosts; a short tail could
        not shard over the device mesh anyway)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_shards = max(1, int(num_shards))
        self.shard_id = int(shard_id)
        assert 0 <= self.shard_id < self.num_shards
        assert batch_size % self.num_shards == 0, (
            f"global batch_size {batch_size} must divide over "
            f"{self.num_shards} processes")
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last or self.num_shards > 1:
            return n // self.batch_size    # sharded loaders drop all tails
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def _batch_indices(self) -> List[np.ndarray]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        batches = [order[i:i + self.batch_size] for i in range(0, n, self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        if self.num_shards > 1:
            # every process sees the same schedule; keep only this process's
            # contiguous chunk of each batch (process-ordered blocks match
            # the device order of the global mesh). ALL partial tails drop:
            # a tail smaller than the global batch can't shard over the mesh
            # (dp mode requires batch_size % n_devices == 0), and building
            # it "replicated" from per-process different rows would silently
            # corrupt the global array.
            sharded = []
            for idxs in batches:
                if len(idxs) != self.batch_size:
                    continue
                k = len(idxs) // self.num_shards
                sharded.append(idxs[self.shard_id * k:(self.shard_id + 1) * k])
            batches = sharded
        return batches

    def __iter__(self) -> Iterator[Dict]:
        batches = self._batch_indices()
        self._epoch += 1
        if not batches:
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                futures = [pool.submit(self._load_batch, idxs) for idxs in batches]
                for fut in futures:
                    if stop.is_set():
                        for f in futures:
                            f.cancel()
                        return
                    try:
                        q.put(("ok", fut.result()))
                    except Exception as e:  # propagate loader errors
                        q.put(("err", e))
                        return
            q.put(("done", None))

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                kind, item = q.get()
                if kind == "done":
                    break
                if kind == "err":
                    raise item
                yield item
        finally:
            stop.set()

    def _load_batch(self, idxs) -> Dict:
        return collate([self.dataset[int(i)] for i in idxs])
