"""Static-shape batch iterator.

Replaces the reference's ``torch.utils.data.DataLoader`` with
``num_workers=0`` and GPU-resident ``__getitem__`` (run_PMR_ModCR.py:40-48,
Data/VCRChunkAlign.py:596-597) with a host-side iterator that

- shuffles deterministically per epoch from a seed (reference relies on
  torch's global RNG after ``set_seed``, utils/misc.py:21-27);
- always emits *full, fixed-geometry* batches (the final short batch is
  padded with repeated examples and reported via ``batch["example_mask"]``
  so eval can drop the duplicates) — the jitted step compiles exactly once;
- overlaps host featurization with device compute via a one-batch
  lookahead thread (the reference forces synchronous loading because its
  dataset owns CUDA tensors).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np


class DataLoader:
    """Iterates fixed-shape collated batches over a PMR/VCR dataset.

    ``dataset`` must expose ``__len__`` and ``batch(indices) -> dict``.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        seed: int = 88,
        drop_last: bool = False,
        prefetch: bool = True,
        shard: Optional[tuple] = None,   # (process_index, process_count)
    ):
        if batch_size <= 0:
            raise ValueError("batch_size must be positive")
        if shard is not None:
            idx, count = shard
            if not (0 <= idx < count):
                raise ValueError(f"bad shard {shard}")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.shard = shard
        self.epoch = 0

    def _order(self) -> np.ndarray:
        """Global example order for this epoch, sliced to this host's shard.

        Every host shuffles with the same seed and takes a strided slice —
        disjoint coverage with no coordination, the multi-host input recipe
        the single-process reference has no analogue of."""
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        if self.shard is not None:
            idx, count = self.shard
            order = order[idx::count]
        return order

    def __len__(self) -> int:
        """Batch count — identical on EVERY shard rank.

        Sharded loaders feed lifted global batches whose jitted step runs
        collectives; ranks must therefore agree on the number of batches
        or the psum deadlocks.  ``order[idx::count]`` shards differ by up
        to one example, so: with ``drop_last`` every rank emits the MIN
        shard's full-batch count (≤1 batch of data dropped on the longer
        ranks); without it every rank emits the MAX shard's count, shorter
        ranks padding fully-masked batches (example_mask=0 rows contribute
        nothing to the psum'd metrics).
        """
        if self.shard is not None:
            total, (_, count) = len(self.dataset), self.shard
            if self.drop_last:
                return (total // count) // self.batch_size
            mx = (total + count - 1) // count
            return (mx + self.batch_size - 1) // self.batch_size
        n = len(self.dataset)  # no _order(): shuffling doesn't change counts
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _index_batches(self):
        order = self._order()
        n = len(order)
        target = len(self)                      # rank-symmetric (see __len__)
        emitted = 0
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            if emitted >= target:
                break                           # longer shard: drop extras
            yield order[start:start + self.batch_size]
            emitted += 1
        while emitted < target:                 # shorter shard: empty batches
            yield order[:0]
            emitted += 1

    def _make_batch(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        real = len(idx)
        if real < self.batch_size:
            # pad the final batch by repeating indices; mark the real rows
            # (a fully-empty rank-symmetry batch repeats example 0, all
            # rows masked)
            pad = (np.resize(idx, self.batch_size) if real
                   else np.zeros((self.batch_size,), np.int64))
            batch = self.dataset.batch(pad)
            mask = np.zeros((self.batch_size,), np.float32)
            mask[:real] = 1.0
        else:
            batch = self.dataset.batch(idx)
            mask = np.ones((self.batch_size,), np.float32)
        batch["example_mask"] = mask
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if not self.prefetch:
            for idx in self._index_batches():
                yield self._make_batch(idx)
            return

        q: "queue.Queue" = queue.Queue(maxsize=2)
        sentinel = object()
        err: list = []
        stop = threading.Event()

        def _put(item) -> bool:
            """Bounded put that gives up when the consumer is gone —
            an abandoned iterator (e.g. ``next(iter(loader))`` for a
            sample batch) must not leave this thread parked on a full
            queue holding batch memory forever."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for idx in self._index_batches():
                    if not _put(self._make_batch(idx)):
                        return
            except BaseException as e:  # surfaced in the consumer
                err.append(e)
            finally:
                _put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
            t.join()
            if err:
                raise err[0]
        finally:
            # consumer exiting (normally or abandoned): release the producer
            stop.set()
