"""Threaded, host-sharded data loader.

TPU-native replacement for the reference's ``torch.utils.data.DataLoader``
(8 fork workers, ``train_sceneflow.py:84-85``): worker threads decode and
augment on the host while the previous batch is on device; under multi-host
SPMD each process loads only its shard of the global batch
(``jax.process_index()``-strided indices), which is the standard JAX
per-host input pipeline. Device-side prefetch (H2D one batch ahead,
overlapped with the in-flight step) lives in
``train.loop._device_batches``.

Determinism: sample ``i`` of epoch ``e`` is augmented with
``np.random.default_rng(hash(seed, e, i))`` regardless of worker count or
host layout.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np


def _collate(samples: list[dict]) -> dict:
    out: dict = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], list):
            out[key] = [np.stack([v[i] for v in vals])
                        for i in range(len(vals[0]))]
        elif isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        elif isinstance(vals[0], (int, float)):
            out[key] = np.asarray(vals)
        else:
            out[key] = vals  # strings etc.
    return out


class DataLoader:
    def __init__(self, dataset, batch_size: int, *, shuffle: bool = False,
                 num_workers: int = 4, drop_last: bool = True, seed: int = 1,
                 shard_index: int = 0, num_shards: int = 1,
                 use_processes: bool = False) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.shard_index = shard_index
        self.num_shards = num_shards
        # Fork-based workers (the reference's torch loader semantics,
        # train_sceneflow.py:84-85): the decode+augment path is
        # numpy/PIL-heavy enough that thread workers serialize on the GIL
        # (measured ~8% overlap efficiency at batch 4; BASELINE.md).
        # Threads stay the default for tests and low-core hosts.
        self.use_processes = use_processes
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            # note: the reference trains with shuffle=False
            # (train_sceneflow.py:84); shuffle is opt-in here too.
            np.random.default_rng((self.seed, self.epoch)).shuffle(idx)
        return idx[self.shard_index::self.num_shards]

    def __len__(self) -> int:
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        indices = self._indices()
        nb = len(self)
        batches = [indices[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]
        if self.use_processes:
            yield from self._iter_processes(batches)
            return

        out_q: "queue.Queue" = queue.Queue(maxsize=self.num_workers * 2)
        job_q: "queue.Queue" = queue.Queue()
        for bi, b in enumerate(batches):
            job_q.put((bi, b))

        results: dict[int, dict] = {}
        lock = threading.Lock()
        cond = threading.Condition(lock)

        def worker():
            while True:
                try:
                    bi, batch_idx = job_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    samples = []
                    for i in batch_idx:
                        rng = np.random.default_rng(
                            (self.seed, self.epoch, int(i)))
                        samples.append(self.dataset.get(int(i), rng))
                    result = _collate(samples)
                except BaseException as e:  # surface in the consumer,
                    result = e              # don't hang the cond.wait
                with cond:
                    results[bi] = result
                    cond.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        for bi in range(nb):
            with cond:
                while bi not in results:
                    cond.wait()
                batch = results.pop(bi)
            if isinstance(batch, BaseException):
                raise batch
            yield batch

    def _iter_processes(self, batches) -> Iterator[dict]:
        """Fork workers: each builds whole batches and ships the collated
        arrays back over a pipe queue. Augmentation stays deterministic —
        the per-sample rng is keyed by (seed, epoch, index), not by worker."""
        import multiprocessing as mp

        ctx = mp.get_context("fork")
        job_q = ctx.Queue()
        out_q = ctx.Queue(maxsize=self.num_workers * 2)
        for bi, b in enumerate(batches):
            job_q.put((bi, np.asarray(b)))
        for _ in range(self.num_workers):
            job_q.put(None)

        def worker():
            while True:
                job = job_q.get()
                if job is None:
                    return
                bi, batch_idx = job
                try:
                    samples = []
                    for i in batch_idx:
                        rng = np.random.default_rng(
                            (self.seed, self.epoch, int(i)))
                        samples.append(self.dataset.get(int(i), rng))
                    result = _collate(samples)
                except BaseException as e:
                    try:
                        out_q.put((bi, e))
                    except Exception:  # unpicklable exception
                        out_q.put((bi, RuntimeError(repr(e))))
                    continue
                out_q.put((bi, result))

        procs = [ctx.Process(target=worker, daemon=True)
                 for _ in range(self.num_workers)]
        for p in procs:
            p.start()
        try:
            pending: dict[int, dict] = {}
            for want in range(len(batches)):
                while want not in pending:
                    try:
                        bi, batch = out_q.get(timeout=30)
                    except queue.Empty:
                        # liveness guard: a crashed worker (OOM, bad
                        # sample) must surface as an error, not a hang
                        if not any(p.is_alive() for p in procs):
                            raise RuntimeError(
                                "all loader worker processes died; see "
                                "their stderr for the failing sample")
                        continue
                    pending[bi] = batch
                got = pending.pop(want)
                if isinstance(got, BaseException):
                    raise got
                yield got
        finally:
            for p in procs:
                p.terminate()
            for p in procs:
                p.join()
