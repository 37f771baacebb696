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

Back-pressure (round 4): the queue is **bounded** at
``max_queue_batches × micro_batch`` pending examples.  When clients
arrive faster than the device drains, new work is **shed immediately**
with :class:`Overloaded` (the server maps it to HTTP 429) instead of
growing the queue — and the latency of accepted requests — without
bound.  Requests may also carry a **deadline**: work still queued when
its deadline passes is dropped by the dispatcher
(:class:`DeadlineExceeded` → HTTP 503) rather than burning device time
on an answer nobody is waiting for.
"""

from __future__ import annotations

import collections
import queue
import threading
import time
from concurrent.futures import Future
from concurrent.futures import TimeoutError as FutureTimeout
from typing import Deque, Dict, List, Optional, Sequence

from multimodal_context_reasoning_tpu.data.schemas import RawExample
from multimodal_context_reasoning_tpu.serving.scorer import ModCRScorer


class Overloaded(RuntimeError):
    """Queue full — retriable; shed fast instead of queueing forever."""


class DeadlineExceeded(RuntimeError):
    """The request's deadline passed before (or while) it was served."""


class MicroBatcher:
    def __init__(
        self,
        scorer: ModCRScorer,
        *,
        max_wait_ms: float = 10.0,
        max_queue_batches: int = 8,
        default_deadline_ms: Optional[float] = None,
    ):
        self.scorer = scorer
        self.max_wait = max_wait_ms / 1000.0
        # bounded depth: beyond this many queued EXAMPLES new work sheds
        # with Overloaded.  Sized in device batches: depth N means a new
        # arrival waits at most ~N device calls — a knowable worst case.
        self.capacity = max(1, max_queue_batches) * max(
            1, getattr(scorer, "micro_batch", 1))
        self.default_deadline = (
            None if default_deadline_ms is None
            else default_deadline_ms / 1000.0)
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
        # shed telemetry (under _stats_lock): examples rejected at the door
        # (Overloaded) / dropped in-queue past their deadline
        self.rejected = 0
        self.expired = 0
        self._thread = threading.Thread(
            target=self._loop, name="modcr-microbatcher", daemon=True
        )
        self._thread.start()

    # -- client side ------------------------------------------------------
    def score(
        self,
        examples: Sequence[RawExample],
        *,
        deadline_ms: Optional[float] = None,
    ) -> List[Dict]:
        """Thread-safe: featurizes on the CALLING thread, then waits on the
        dispatcher's result futures.

        Raises :class:`Overloaded` (nothing enqueued — whole request shed)
        when the pending queue is at capacity, and :class:`DeadlineExceeded`
        when a deadline (per-call or the batcher default) passes before the
        results arrive.  The deadline clock starts BEFORE featurization —
        it bounds the request, not just the queue wait.
        """
        if self._closed:
            raise RuntimeError("MicroBatcher is closed")
        wait = (self.default_deadline if deadline_ms is None
                else deadline_ms / 1000.0)
        deadline = None if wait is None else time.monotonic() + wait
        # shed BEFORE featurizing: under overload the host featurization
        # CPU is better spent on requests that will actually run.
        # qsize() is approximate across threads; a transient overshoot of
        # a few items is fine — the invariant is O(capacity), not exact.
        # A request LARGER than the whole capacity is not rejected outright
        # (it would 429 forever, even on an idle server) — it admits only
        # when the queue has fully drained, overshooting once by its size.
        if self._q.qsize() + len(examples) > max(self.capacity, len(examples)):
            with self._stats_lock:
                self.rejected += len(examples)
            raise Overloaded(
                f"{self._q.qsize()} examples queued (capacity "
                f"{self.capacity}); retry later")
        futures = []
        for ex in examples:
            feat = self.scorer.featurize(ex)  # slow host work: outside lock
            f: Future = Future()
            with self._close_lock:
                if self._closed:
                    raise RuntimeError("MicroBatcher is closed")
                self._q.put((feat, ex.example_id, f, deadline))
            futures.append(f)
        out = []
        for f in futures:
            remaining = (None if deadline is None
                         else max(0.0, deadline - time.monotonic()))
            try:
                out.append(f.result(timeout=remaining))
            except FutureTimeout:
                raise DeadlineExceeded(
                    f"deadline ({wait * 1e3:.0f} ms) passed while waiting "
                    "for the device")
        return out

    def queue_depth(self) -> int:
        """Approximate pending-example count (for /stats and tests)."""
        return self._q.qsize()

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

    def _expired(self, item) -> bool:
        """Fail (and count) a queued item whose deadline already passed —
        device time is never spent on an answer nobody awaits."""
        dl = item[3]
        if dl is None or time.monotonic() <= dl:
            return False
        item[2].set_exception(DeadlineExceeded(
            "deadline passed while queued"))
        with self._stats_lock:
            self.expired += 1
        return True

    def _run(self) -> None:
        mb = self.scorer.micro_batch
        while True:
            item = self._q.get()
            if item is None:
                return
            if self._expired(item):
                continue
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
                if not self._expired(nxt):
                    items.append(nxt)
            self._dispatch(items)

    def _dispatch(self, items) -> None:
        with self._stats_lock:
            self.dispatch_sizes.append(len(items))
        try:
            results = self.scorer.score_featurized(
                [it[0] for it in items], [it[1] for it in items]
            )
            for (_, _, fut, _), res in zip(items, results):
                fut.set_result(res)
        except Exception as e:  # pragma: no cover - surfaced to callers
            for _, _, fut, _ in items:
                if not fut.done():
                    fut.set_exception(e)
