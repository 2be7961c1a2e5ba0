"""Host input pipeline: threaded prefetching loaders feeding the device.

Replaces the reference's 8-process-per-domain torch DataLoader stack
(/root/reference/code/train.py:549-566) with a thread-pool pipeline (PIL /
numpy release the GIL for the heavy parts; the FFT left the host entirely —
it runs on device).  Semantics kept:
  * shuffle + drop_last per source-domain loader;
  * the *longest* loader defines the epoch; shorter loaders cycle
    (train.py:560-566).  Divergence: the reference's itertools.cycle
    replays the first epoch's batches verbatim forever; we reshuffle on
    every wrap (documented, strictly better randomness).
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


def _collate(items: List[Dict]) -> Dict[str, np.ndarray]:
    out = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        if isinstance(vals[0], np.ndarray) or np.isscalar(vals[0]) or isinstance(vals[0], (int, float, np.integer, np.floating)):
            out[k] = np.stack([np.asarray(v) for v in vals])
        else:
            out[k] = vals  # e.g. string ids
    return out


class DataLoader:
    """Minimal threaded loader: shuffle, drop_last, prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 4,
        seed: Optional[int] = None,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._epoch_order()
        nb = len(self)
        if nb == 0:
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def batch_indices(b):
            return order[b * self.batch_size : (b + 1) * self.batch_size]

        def producer():
            try:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in range(nb):
                        if stop.is_set():
                            break
                        items = list(pool.map(self.dataset.__getitem__, batch_indices(b)))
                        q.put(_collate(items))
            except Exception as e:  # surface worker errors to the consumer
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


class _CycledLoader:
    """Endless iterator that reshuffles each wrap."""

    def __init__(self, loader: DataLoader):
        self.loader = loader
        self._it = iter(loader)

    def __next__(self):
        try:
            return next(self._it)
        except StopIteration:
            self._it = iter(self.loader)
            return next(self._it)


class MultiDomainIterator:
    """Zip of per-domain loaders; epoch length = longest loader
    (train.py:560-566). Yields a list of per-domain batches per step."""

    def __init__(self, loaders: Sequence[DataLoader]):
        self.loaders = list(loaders)
        for i, l in enumerate(self.loaders):
            if len(l) == 0:
                raise ValueError(
                    f"loader {i} yields 0 batches (dataset size {len(l.dataset)} "
                    f"< batch size {l.batch_size} with drop_last)"
                )
        self.steps_per_epoch = max(len(l) for l in self.loaders)
        self._max_id = int(np.argmax([len(l) for l in self.loaders]))

    def __len__(self) -> int:
        return self.steps_per_epoch

    def __iter__(self):
        cycled = [
            iter(l) if i == self._max_id else _CycledLoader(l)
            for i, l in enumerate(self.loaders)
        ]
        for _ in range(self.steps_per_epoch):
            yield [next(c) for c in cycled]


def concat_domain_batches(batches: List[Dict[str, np.ndarray]], keys: Sequence[str]) -> Dict[str, np.ndarray]:
    """Concatenate per-domain sub-batches along axis 0 (train.py:232-242)."""
    return {k: np.concatenate([b[k] for b in batches], axis=0) for k in keys}


class FusedMultiDomainLoader:
    """Workers assemble the COMBINED multi-domain batch directly.

    Semantics match MultiDomainIterator + concat_domain_batches (per-domain
    sub-batches of fixed sizes, domain-major order, longest domain defines
    the epoch, shorter domains cycle with reshuffle), but each step's full
    (sum(b_i), H, W, C) arrays are written by a worker thread into their
    final layout — the main thread only hands the dict to the device, so
    the jit dispatch chain is never blocked on host assembly.
    """

    def __init__(
        self,
        datasets: Sequence,
        batch_sizes: Sequence[int],
        keys: Sequence[str],
        num_workers: int = 6,
        seed: Optional[int] = None,
        prefetch: int = 4,
    ):
        assert len(datasets) == len(batch_sizes)
        self.datasets = list(datasets)
        self.batch_sizes = list(batch_sizes)
        self.keys = list(keys)
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)
        lens = [len(ds) // bs for ds, bs in zip(datasets, batch_sizes)]
        for i, n in enumerate(lens):
            if n == 0:
                raise ValueError(
                    f"domain {i}: dataset size {len(datasets[i])} < batch size {batch_sizes[i]}"
                )
        self.steps_per_epoch = max(lens)

    def __len__(self) -> int:
        return self.steps_per_epoch

    def _epoch_plan(self) -> List[List[np.ndarray]]:
        """Per-step, per-domain index lists for one epoch."""
        plan = [[None] * len(self.datasets) for _ in range(self.steps_per_epoch)]
        for d, (ds, bs) in enumerate(zip(self.datasets, self.batch_sizes)):
            order = self.rng.permutation(len(ds))
            pos = 0
            for s in range(self.steps_per_epoch):
                if pos + bs > len(order):  # wrap: reshuffle (see DataLoader note)
                    order = self.rng.permutation(len(ds))
                    pos = 0
                plan[s][d] = order[pos : pos + bs]
                pos += bs
        return plan

    def _build_step(self, assignments: List[np.ndarray]) -> Dict[str, np.ndarray]:
        out: Dict[str, Optional[np.ndarray]] = {k: None for k in self.keys}
        row = 0
        for d, idxs in enumerate(assignments):
            for i in idxs:
                item = self.datasets[d][int(i)]
                for k in self.keys:
                    v = np.asarray(item[k])
                    if out[k] is None:
                        total = sum(len(a) for a in assignments)
                        out[k] = np.empty((total,) + v.shape, v.dtype)
                    out[k][row] = v
                row += 1
        return out  # type: ignore[return-value]

    def __iter__(self):
        from concurrent.futures import ThreadPoolExecutor

        plan = self._epoch_plan()
        with ThreadPoolExecutor(self.num_workers) as pool:
            window = []
            nxt = 0
            while nxt < len(plan) and len(window) < self.prefetch:
                window.append(pool.submit(self._build_step, plan[nxt]))
                nxt += 1
            while window:
                fut = window.pop(0)
                if nxt < len(plan):
                    window.append(pool.submit(self._build_step, plan[nxt]))
                    nxt += 1
                yield fut.result()
