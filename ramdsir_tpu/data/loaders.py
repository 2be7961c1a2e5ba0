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


def _assemble_batch(
    datasets,
    keys: Sequence[str],
    base_seed: int,
    epoch: int,
    step: int,
    assignments: List[np.ndarray],
    rows: Optional[slice] = None,
) -> Dict[str, np.ndarray]:
    """Build (a row-slice of) one combined domain-major batch.

    Each sample's Generator is derived from (seed, epoch, step, domain,
    row-in-domain) — a pure function of the sample's GLOBAL position — so
    thread workers, process workers, and multi-host row slices all produce
    bit-identical data for the same seed.
    """
    total = sum(len(a) for a in assignments)
    lo, hi = (rows.start, rows.stop) if rows is not None else (0, total)
    out: Dict[str, np.ndarray] = {}
    row = 0
    for d, idxs in enumerate(assignments):
        ds = datasets[d]
        for j, i in enumerate(idxs):
            if not (lo <= row < hi):
                row += 1
                continue
            if hasattr(ds, "get_item"):
                rng = np.random.default_rng((base_seed, epoch, step, d, int(j)))
                item = ds.get_item(int(i), rng)
            else:
                item = ds[int(i)]
            for k in keys:
                v = np.asarray(item[k])
                if k not in out:
                    out[k] = np.empty((hi - lo,) + v.shape, v.dtype)
                out[k][row - lo] = v
            row += 1
    return out


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
        rows: Optional[slice] = None,
    ):
        assert len(datasets) == len(batch_sizes)
        # rows: multi-host data loading — this process materializes only
        # its slice of the GLOBAL domain-major batch (parallel.distributed.
        # local_batch_slice); augmentation stays counter-seeded by global
        # (domain, row) position, so sliced rows == the full build's rows.
        self.rows = rows
        self.datasets = list(datasets)
        self.batch_sizes = list(batch_sizes)
        self.keys = list(keys)
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)
        # Per-sample augmentation randomness is counter-based: each sample's
        # Generator is derived from (seed, epoch, step, domain, row), so the
        # pipeline is reproducible AND thread-safe no matter how the worker
        # pool schedules steps (numpy Generators are not thread-safe; a
        # shared one would interleave/repeat draws under concurrency).
        self._base_seed = seed if seed is not None else int(np.random.SeedSequence().entropy) % (2**31)
        self._epoch = 0
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

    def _build_step(
        self, assignments: List[np.ndarray], epoch: int, step: int
    ) -> Dict[str, np.ndarray]:
        return _assemble_batch(
            self.datasets, self.keys, self._base_seed, epoch, step, assignments, self.rows
        )

    def __iter__(self):
        from concurrent.futures import ThreadPoolExecutor

        plan = self._epoch_plan()
        epoch = self._epoch
        self._epoch += 1
        with ThreadPoolExecutor(self.num_workers) as pool:
            window = []
            nxt = 0
            while nxt < len(plan) and len(window) < self.prefetch:
                window.append(pool.submit(self._build_step, plan[nxt], epoch, nxt))
                nxt += 1
            while window:
                fut = window.pop(0)
                if nxt < len(plan):
                    window.append(pool.submit(self._build_step, plan[nxt], epoch, nxt))
                    nxt += 1
                yield fut.result()


def _proc_worker_main(datasets, keys, base_seed, q_in, q_out, rows=None):
    """Loader worker process: builds complete combined batches.

    Touches only numpy/PIL/cv2 — NEVER jax (the parent owns the device).
    Sample randomness is counter-derived from (seed, epoch, step, domain,
    row), identical to the thread loader, so thread- and process-based
    pipelines produce the same batches for the same seed.
    """
    try:
        import cv2

        cv2.setNumThreads(0)  # one job per worker; no nested pools
    except Exception:
        pass
    while True:
        task = q_in.get()
        if task is None:
            return
        epoch, step, assignments = task
        try:
            out = _assemble_batch(datasets, keys, base_seed, epoch, step, assignments, rows)
            q_out.put((step, out))
        except Exception as e:  # surface to the parent
            import traceback

            q_out.put((step, RuntimeError(f"loader worker failed: {e}\n{traceback.format_exc()}")))


class ProcessFusedMultiDomainLoader(FusedMultiDomainLoader):
    """FusedMultiDomainLoader with PROCESS workers (reference capability:
    24-40 DataLoader worker processes, train.py:558-559).

    Python threads cap the host pipeline at the GIL (~200 img/s measured on
    the round-1 loader); worker processes decode/augment truly in parallel.
    Workers are persistent across epochs; each keeps its own decode cache.
    Default start method is `forkserver`: plain `fork` from a process with a
    live JAX runtime risks deadlock (JAX is multithreaded; a lock held at
    fork time stays held forever in the child), while forkserver children
    fork from a clean, jax-free server process — datasets ship by pickle
    once at pool creation.  Workers only run numpy/PIL/cv2, never jax.
    """

    def __init__(self, *args, num_workers: Optional[int] = None, start_method: Optional[str] = None, **kwargs):
        import os

        kwargs.setdefault("prefetch", 6)
        super().__init__(*args, **kwargs)
        self.num_workers = num_workers or min(8, max(2, (os.cpu_count() or 4) - 2))
        self._start_method = start_method or "forkserver"
        self._pool = None

    def _ensure_pool(self):
        if self._pool is not None:
            return
        import multiprocessing as mp
        import os

        ctx = mp.get_context(self._start_method)
        self._q_in = ctx.Queue()
        self._q_out = ctx.Queue()
        # spawn/forkserver children re-run sitecustomize; scrub the TPU-boot
        # env var so they come up as plain (jax-free) python processes and
        # never dial the TPU relay.
        scrub = self._start_method != "fork" and "PALLAS_AXON_POOL_IPS" in os.environ
        saved = os.environ.pop("PALLAS_AXON_POOL_IPS", None) if scrub else None
        try:
            self._pool = [
                ctx.Process(
                    target=_proc_worker_main,
                    args=(self.datasets, self.keys, self._base_seed, self._q_in, self._q_out, self.rows),
                    daemon=True,
                )
                for _ in range(self.num_workers)
            ]
            for p in self._pool:
                p.start()
        finally:
            if saved is not None:
                os.environ["PALLAS_AXON_POOL_IPS"] = saved

    def shutdown(self):
        if self._pool is None:
            return
        for _ in self._pool:
            self._q_in.put(None)
        for p in self._pool:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()
        self._pool = None

    def __del__(self):
        try:
            self.shutdown()
        except Exception:
            pass

    def __iter__(self):
        self._ensure_pool()
        plan = self._epoch_plan()
        epoch = self._epoch
        self._epoch += 1
        inflight = 0
        nxt = 0
        ready: Dict[int, Dict[str, np.ndarray]] = {}
        want = 0
        while nxt < len(plan) and inflight < self.prefetch:
            self._q_in.put((epoch, nxt, [np.asarray(a) for a in plan[nxt]]))
            nxt += 1
            inflight += 1
        while want < len(plan):
            while want not in ready:
                step, batch = self._q_out.get()
                inflight -= 1
                if isinstance(batch, Exception):
                    raise batch
                ready[step] = batch
                if nxt < len(plan):
                    self._q_in.put((epoch, nxt, [np.asarray(a) for a in plan[nxt]]))
                    nxt += 1
                    inflight += 1
            yield ready.pop(want)
            want += 1
