"""Cross-request micro-batching for the serving path.

The round-2 server serialized every device call on one global lock, so N
concurrent clients degraded to single-stream latency.  This dispatcher
replaces the lock with a batching queue:

- request threads featurize their own examples (pure-numpy host work —
  embarrassingly parallel) and enqueue (features, Future) pairs;
- ONE dispatcher thread drains the queue, grouping up to
  ``scorer.micro_batch`` examples that arrive within ``max_wait_ms`` of the
  first, runs them as a single device call
  (:meth:`ModCRScorer.score_featurized`), and scatters results back
  through the futures.

The "scorer" is duck-typed: anything exposing ``featurize(example)``,
``score_featurized(feats, example_ids)`` and ``micro_batch`` works — the
server batches :class:`RationaleGenerator` /generate requests through this
same dispatcher.

Under load the deadline never idles: while the device scores batch i the
queue accumulates batch i+1, so throughput approaches
``micro_batch × single-stream rate`` while a lone request pays at most
``max_wait_ms`` extra latency.
"""

from __future__ import annotations

import collections
import queue
import threading
import time
from concurrent.futures import Future
from typing import Deque, Dict, List, Sequence

from multimodal_context_reasoning_tpu.data.schemas import RawExample
from multimodal_context_reasoning_tpu.serving.scorer import ModCRScorer


class MicroBatcher:
    def __init__(self, scorer: ModCRScorer, *, max_wait_ms: float = 10.0):
        self.scorer = scorer
        self.max_wait = max_wait_ms / 1000.0
        self._q: "queue.Queue" = queue.Queue()
        self._closed = False
        # pairs the _closed check with the enqueue: a put under this lock
        # is guaranteed to land BEFORE close()'s sentinel, so every
        # accepted future is either dispatched or failed by the drain
        self._close_lock = threading.Lock()
        # device-call telemetry: one (batch_size,) entry per dispatch,
        # bounded so a long-lived server doesn't leak.  Guarded by
        # _stats_lock: iterating a deque while another thread appends
        # raises RuntimeError, so readers must go through telemetry()
        self._stats_lock = threading.Lock()
        self.dispatch_sizes: Deque[int] = collections.deque(maxlen=4096)
        self._thread = threading.Thread(
            target=self._loop, name="modcr-microbatcher", daemon=True
        )
        self._thread.start()

    # -- client side ------------------------------------------------------
    def score(self, examples: Sequence[RawExample]) -> List[Dict]:
        """Thread-safe: featurizes on the CALLING thread, then waits on the
        dispatcher's result futures."""
        if self._closed:
            raise RuntimeError("MicroBatcher is closed")
        futures = []
        for ex in examples:
            feat = self.scorer.featurize(ex)  # slow host work: outside lock
            f: Future = Future()
            with self._close_lock:
                if self._closed:
                    raise RuntimeError("MicroBatcher is closed")
                self._q.put((feat, ex.example_id, f))
            futures.append(f)
        return [f.result() for f in futures]

    def telemetry(self) -> List[int]:
        """Snapshot of recent device-dispatch batch sizes (thread-safe —
        the dispatcher appends concurrently)."""
        with self._stats_lock:
            return list(self.dispatch_sizes)

    def close(self) -> None:
        with self._close_lock:
            self._closed = True
            self._q.put(None)
        self._thread.join(timeout=5)

    # -- dispatcher side --------------------------------------------------
    def _loop(self) -> None:
        try:
            self._run()
        finally:
            # belt-and-braces: _close_lock orders every accepted put before
            # the sentinel, but if anything still lands behind it (or _run
            # dies early), fail those futures instead of hanging callers
            while True:
                try:
                    item = self._q.get_nowait()
                except queue.Empty:
                    break
                if item is not None:
                    item[2].set_exception(RuntimeError("MicroBatcher closed"))

    def _run(self) -> None:
        mb = self.scorer.micro_batch
        while True:
            item = self._q.get()
            if item is None:
                return
            items = [item]
            deadline = time.perf_counter() + self.max_wait
            while len(items) < mb:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    # deadline passed; still take anything already queued
                    try:
                        nxt = self._q.get_nowait()
                    except queue.Empty:
                        break
                else:
                    try:
                        nxt = self._q.get(timeout=remaining)
                    except queue.Empty:
                        break
                if nxt is None:
                    self._dispatch(items)
                    return
                items.append(nxt)
            self._dispatch(items)

    def _dispatch(self, items) -> None:
        with self._stats_lock:
            self.dispatch_sizes.append(len(items))
        try:
            results = self.scorer.score_featurized(
                [it[0] for it in items], [it[1] for it in items]
            )
            for (_, _, fut), res in zip(items, results):
                fut.set_result(res)
        except Exception as e:  # pragma: no cover - surfaced to callers
            for _, _, fut in items:
                if not fut.done():
                    fut.set_exception(e)
