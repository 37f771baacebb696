"""Minimal HTTP scoring server (stdlib-only).

POST /score    — body: {"examples": [{"example_id", "img_id", "premise",
                 "answer_choices": [4 strings]}, ...]}
                 → {"results": [{"example_id", "prediction", "logits",
                 "probs"}, ...]}
POST /generate — same body, served by a :class:`RationaleGenerator`
                 (pass ``generator=`` to :func:`serve`) → results carry
                 "prediction"/"probs" plus "rationale_ids" (and
                 "rationale_text" when the GPT tokenizer can decode).
GET  /healthz  — liveness.
GET  /stats    — operational telemetry: request/example counts, recent
                 request-latency percentiles, the batcher's device-
                 dispatch sizes (mean batch ≈ batching efficiency), live
                 queue depth, and shed counters.

Back-pressure: the batcher's queue is bounded (``max_queue_batches``);
when it is full new requests get **429** with a Retry-After hint instead
of unbounded queueing, and a request whose ``deadline_ms`` (per-request
field or server default) expires gets **503** — overload degrades to
fast, retriable rejections, not ever-growing latency.

Requests are scored through the AOT-compiled :class:`ModCRScorer` via a
cross-request :class:`MicroBatcher` (serving/batcher.py): concurrent
clients' examples that arrive within ~10 ms are grouped into ONE device
call up to the compiled micro-batch, so N clients approach
``micro_batch × single-stream`` throughput instead of serializing on a
lock (the round-2 design, kept available with ``batching=False``).
"""

from __future__ import annotations

import collections
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from multimodal_context_reasoning_tpu.data.schemas import RawExample
from multimodal_context_reasoning_tpu.serving.batcher import (
    DeadlineExceeded,
    MicroBatcher,
    Overloaded,
)
from multimodal_context_reasoning_tpu.serving.scorer import ModCRScorer


class ServerStats:
    """Thread-safe request telemetry (bounded — no unbounded growth on a
    long-lived server)."""

    def __init__(
        self,
        batcher: Optional[MicroBatcher] = None,
        gen_batcher: Optional[MicroBatcher] = None,
    ):
        self._lock = threading.Lock()
        self._batcher = batcher
        self._gen_batcher = gen_batcher
        self.requests = 0
        self.examples = 0
        self.errors = 0
        # per-route latency windows: a /generate call (classify + N-step
        # decode) is ~10× a /score call, so pooling them would make the
        # percentiles meaningless on mixed workloads
        self._routes: dict = {}

    def _route(self, route: str) -> dict:
        r = self._routes.get(route)
        if r is None:
            r = self._routes[route] = {
                "requests": 0, "examples": 0,
                "lat": collections.deque(maxlen=4096),
            }
        return r

    def record(self, route: str, n_examples: int, seconds: float) -> None:
        with self._lock:
            self.requests += 1
            self.examples += n_examples
            r = self._route(route)
            r["requests"] += 1
            r["examples"] += n_examples
            r["lat"].append(seconds)

    def record_error(self) -> None:
        with self._lock:
            self.errors += 1

    @staticmethod
    def _lat_stats(lat) -> dict:
        lat = sorted(lat)
        return {
            "p50": round(1e3 * lat[len(lat) // 2], 1),
            "p90": round(1e3 * lat[int(len(lat) * 0.9)], 1),
            "max": round(1e3 * lat[-1], 1),
            "window": len(lat),
        }

    def snapshot(self) -> dict:
        with self._lock:
            out = {
                "requests": self.requests,
                "examples": self.examples,
                "errors": self.errors,
            }
            routes = {
                name: {"requests": r["requests"], "examples": r["examples"],
                       "latency_ms": self._lat_stats(r["lat"])}
                for name, r in self._routes.items() if r["lat"]
            }
        if routes:
            out["routes"] = routes
        for name, b in (("score", self._batcher),
                        ("generate", self._gen_batcher)):
            if b is None:
                continue
            route = out.setdefault("routes", {}).setdefault(name, {})
            route.update(
                queue_depth=b.queue_depth(),
                queue_capacity=b.capacity,
                shed_rejected=b.rejected,
                shed_expired=b.expired,
            )
            sizes = b.telemetry()
            if sizes:
                route.update(
                    device_dispatches=len(sizes),
                    mean_device_batch=round(sum(sizes) / len(sizes), 2),
                )
        return out


def _make_handler(score_fn, generate_fn=None, stats: Optional[ServerStats] = None):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _reply(self, code: int, payload: dict,
                   headers: Optional[dict] = None) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok"})
            elif self.path == "/stats" and stats is not None:
                self._reply(200, stats.snapshot())
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            if self.path == "/score":
                handler = score_fn
                route = "score"
            elif self.path == "/generate":
                route = "generate"
                if generate_fn is None:
                    self._reply(
                        404, {"error": "no generator configured"}
                    )
                    return
                handler = generate_fn
            else:
                self._reply(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
                raw = payload.get("examples", [])
                if not raw:
                    if stats is not None:
                        stats.record_error()
                    self._reply(400, {"error": "no examples"})
                    return
                examples = [
                    RawExample(
                        example_id=str(d.get("example_id", i)),
                        img_id=str(d["img_id"]),
                        premise=d["premise"],
                        answer_choices=list(d["answer_choices"]),
                        answer_label=None,
                    )
                    for i, d in enumerate(raw)
                ]
                deadline_ms = payload.get("deadline_ms")
                t0 = time.perf_counter()
                results = handler(examples, deadline_ms=deadline_ms)
                if stats is not None:
                    stats.record(route, len(examples),
                                 time.perf_counter() - t0)
                self._reply(200, {"results": results})
            except Overloaded as e:
                # shed fast and retriably: the queue is at capacity
                if stats is not None:
                    stats.record_error()
                self._reply(429, {"error": str(e), "retriable": True},
                            headers={"Retry-After": "1"})
            except DeadlineExceeded as e:
                if stats is not None:
                    stats.record_error()
                self._reply(503, {"error": str(e), "retriable": True},
                            headers={"Retry-After": "1"})
            except KeyError as e:
                if stats is not None:
                    stats.record_error()
                self._reply(400, {"error": f"missing field {e}"})
            except Exception as e:  # surface, don't crash the server
                if stats is not None:
                    stats.record_error()
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(
    scorer: ModCRScorer,
    host: str = "127.0.0.1",
    port: int = 8477,
    *,
    block: bool = True,
    batching: bool = True,
    max_wait_ms: float = 10.0,
    max_queue_batches: int = 8,
    default_deadline_ms: Optional[float] = None,
    generator=None,                 # optional serving.generator.RationaleGenerator
) -> Optional[ThreadingHTTPServer]:
    if batching:
        batcher = MicroBatcher(
            scorer, max_wait_ms=max_wait_ms,
            max_queue_batches=max_queue_batches,
            default_deadline_ms=default_deadline_ms)
        score_fn = batcher.score
    else:
        # legacy serialized path: one lock, full-request device calls
        # (back-pressure knobs are batcher features; this path's natural
        # limit is the HTTP server's thread-per-connection)
        lock = threading.Lock()

        def score_fn(examples, deadline_ms=None):
            with lock:
                return scorer.score(examples)

    generate_fn = None
    gen_batcher = None
    if generator is not None:
        if batching:
            # RationaleGenerator exposes the same featurize/
            # score_featurized protocol as the scorer, so the MicroBatcher
            # coalesces concurrent /generate requests too (up to the
            # generator's compiled micro_batch)
            gen_batcher = MicroBatcher(
                generator, max_wait_ms=max_wait_ms,
                max_queue_batches=max_queue_batches,
                default_deadline_ms=default_deadline_ms)
            generate_fn = gen_batcher.score
        else:
            gen_lock = threading.Lock()

            def generate_fn(examples, deadline_ms=None):
                with gen_lock:
                    return generator.generate(examples)

    stats = ServerStats(batcher if batching else None, gen_batcher)
    server = ThreadingHTTPServer(
        (host, port), _make_handler(score_fn, generate_fn, stats)
    )
    server.modcr_batcher = batcher if batching else None
    server.modcr_gen_batcher = gen_batcher
    server.modcr_stats = stats

    def _teardown():
        """Close the socket and drain/close the batcher dispatcher threads
        (shutdown() alone leaves them parked on their queues — harmless
        for a process exit, a leak for in-process restarts)."""
        server.server_close()
        for b in (server.modcr_batcher, server.modcr_gen_batcher):
            if b is not None:
                b.close()

    def modcr_close():
        server.shutdown()
        _teardown()

    server.modcr_close = modcr_close
    if block:
        try:
            server.serve_forever()
        finally:
            _teardown()
        return None
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server
