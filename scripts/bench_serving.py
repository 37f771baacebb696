"""Concurrent-client serving throughput: micro-batching vs serialized lock.

Starts the HTTP server twice over one warmed full-size ModCRScorer — once
with the round-3 cross-request MicroBatcher, once with the round-2 global
lock — and hammers each with N concurrent single-example clients.  Reports
requests/sec and per-request latency percentiles; the batching gain should
approach the compiled micro-batch size (VERDICT r2 weak #5).

Run on the TPU container:

    python scripts/bench_serving.py --clients 8 --requests 96 --micro_batch 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.error
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def hammer(port: int, n_clients: int, n_requests: int):
    """n_requests single-example POSTs spread over n_clients threads.
    Returns (wall_seconds, sorted latencies of COMPLETED requests, errors)."""
    lat = []
    errors = []
    lock = threading.Lock()
    work = list(range(n_requests))

    def client(cid: int):
        while True:
            with lock:
                if not work:
                    return
                i = work.pop()
            body = json.dumps({"examples": [{
                "example_id": f"r{i}", "img_id": f"img-{i % 8}",
                "premise": f"premise number {i} about the scene .",
                "answer_choices": [f"answer {i} option {j} ."
                                   for j in range(4)],
            }]}).encode()
            t0 = time.perf_counter()
            try:
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/score", data=body,
                    headers={"Content-Type": "application/json"})
                with urllib.request.urlopen(req, timeout=120) as r:
                    assert r.status == 200, r.status
                    json.loads(r.read())
            except Exception as e:  # count, don't die: a dead thread would
                with lock:          # silently inflate the reported rps
                    errors.append(f"r{i}: {e}")
                continue
            with lock:
                lat.append(time.perf_counter() - t0)

    threads = [threading.Thread(target=client, args=(c,))
               for c in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return time.perf_counter() - t0, sorted(lat), errors


def hammer_timed(port: int, n_clients: int, seconds: float):
    """n_clients closed-loop threads for a fixed window, NO retry on shed.
    Returns {"ok": sorted latencies, "shed_429": n, "expired_503": n,
    "errors": n, "wall": s, "max_depth": peak /stats queue depth}."""
    lat: list = []
    counts = {"shed_429": 0, "expired_503": 0, "errors": 0}
    lock = threading.Lock()
    stop = time.perf_counter() + seconds
    depth_peak = [0]

    def client(cid: int):
        i = 0
        while time.perf_counter() < stop:
            i += 1
            body = json.dumps({"examples": [{
                "example_id": f"c{cid}-{i}", "img_id": f"img-{i % 8}",
                "premise": f"premise {cid} {i} about the scene .",
                "answer_choices": [f"answer {i} option {j} ."
                                   for j in range(4)],
            }]}).encode()
            t0 = time.perf_counter()
            try:
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/score", data=body,
                    headers={"Content-Type": "application/json"})
                with urllib.request.urlopen(req, timeout=120) as r:
                    json.loads(r.read())
                with lock:
                    lat.append(time.perf_counter() - t0)
            except urllib.error.HTTPError as e:
                key = ("shed_429" if e.code == 429
                       else "expired_503" if e.code == 503 else "errors")
                e.read()
                with lock:
                    counts[key] += 1
            except Exception:
                with lock:
                    counts["errors"] += 1

    def depth_sampler():
        while time.perf_counter() < stop:
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/stats", timeout=5) as r:
                    st = json.loads(r.read())
                d = int(st.get("routes", {}).get("score", {})
                        .get("queue_depth", 0))
                depth_peak[0] = max(depth_peak[0], d)
            except Exception:
                pass
            time.sleep(0.05)

    threads = [threading.Thread(target=client, args=(c,))
               for c in range(n_clients)]
    sampler = threading.Thread(target=depth_sampler, daemon=True)
    t0 = time.perf_counter()
    sampler.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return {"ok": sorted(lat), "wall": time.perf_counter() - t0,
            "max_depth": depth_peak[0], **counts}


def run_overload(scorer, args) -> dict:
    """Saturation-knee measurement (VERDICT r3 #4): closed-loop client
    sweep against (a) the default bounded queue and (b) an effectively
    unbounded one, fixed wall-clock window each.  Overload must degrade to
    fast 429s with bounded accepted-latency, not to unbounded queueing."""
    from multimodal_context_reasoning_tpu.serving.server import serve

    out = {"window_s": args.seconds, "micro_batch": args.micro_batch,
           "sweep": []}
    for label, max_qb in (("bounded_q8", 8), ("unbounded", 100000)):
        for clients in args.client_sweep:
            server = serve(scorer, port=args.port, block=False,
                           batching=True, max_wait_ms=args.max_wait_ms,
                           max_queue_batches=max_qb)
            hammer(args.port, 1, 2)  # prime threads
            r = hammer_timed(args.port, clients, args.seconds)
            server.modcr_close()
            time.sleep(0.5)
            ok = r.pop("ok")
            row = {
                "mode": label, "clients": clients,
                "accepted_rps": round(len(ok) / r["wall"], 2),
                "p50_ms": round(1e3 * ok[len(ok) // 2], 1) if ok else None,
                "p90_ms": (round(1e3 * ok[int(len(ok) * 0.9)], 1)
                           if ok else None),
                "shed_429": r["shed_429"], "expired_503": r["expired_503"],
                "errors": r["errors"], "max_queue_depth": r["max_depth"],
            }
            out["sweep"].append(row)
            print(f"[serve-bench] overload {row}", file=sys.stderr,
                  flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--requests", type=int, default=96)
    p.add_argument("--micro_batch", type=int, default=8)
    p.add_argument("--max_wait_ms", type=float, default=10.0)
    p.add_argument("--port", type=int, default=8491)
    p.add_argument("--device_features", action="store_true",
                   help="HBM-resident feature table: requests ship int32 "
                        "ids, not [I, F] floats (data/device_table.py)")
    p.add_argument("--overload", action="store_true",
                   help="saturation-knee sweep: closed-loop clients, no "
                        "retry; reports accepted rps / shed rate / bounded "
                        "latency for bounded vs unbounded queue")
    p.add_argument("--seconds", type=float, default=15.0,
                   help="--overload: wall-clock window per sweep point")
    p.add_argument("--client_sweep", type=int, nargs="+",
                   default=[8, 16, 32],
                   help="--overload: concurrent closed-loop client counts")
    args = p.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/modcr_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from multimodal_context_reasoning_tpu.core.config import ModCRConfig
    from multimodal_context_reasoning_tpu.data.schemas import ImageFeatures
    from multimodal_context_reasoning_tpu.data.tokenization import (
        HashTokenizer,
        RobertaHashTokenizer,
    )
    from multimodal_context_reasoning_tpu.models.modcr import ModCRModel
    from multimodal_context_reasoning_tpu.serving.scorer import ModCRScorer
    from multimodal_context_reasoning_tpu.serving.server import serve

    cfg = ModCRConfig(compute_alignment=False).with_dtype("bfloat16")
    rng = np.random.default_rng(0)
    feats = {
        f"img-{i}": ImageFeatures(
            features=rng.normal(size=(
                12, cfg.global_encoder.img_feature_dim)).astype(np.float32),
            num_regions=12,
        ) for i in range(8)
    }
    bert = HashTokenizer(vocab_size=cfg.global_encoder.vocab_size)
    rob = RobertaHashTokenizer(vocab_size=cfg.roberta.vocab_size)

    print("[serve-bench] building + warming scorer...",
          file=sys.stderr, flush=True)
    import jax.numpy as jnp

    from multimodal_context_reasoning_tpu.data.collate import (
        BatchSpec,
        collate_candidates,
    )
    from multimodal_context_reasoning_tpu.data.pmr import PMRDataset
    from multimodal_context_reasoning_tpu.data.schemas import RawExample

    spec = BatchSpec(
        text_len=cfg.text_len, img_len=cfg.img_len,
        roberta_len=cfg.roberta_len,
        img_feature_dim=cfg.global_encoder.img_feature_dim,
    )
    ds = PMRDataset([], feats, bert, rob, spec=spec, max_chunks=cfg.max_chunks)
    ex = RawExample("w", "img-0", "warm .", ["a ."] * 4, 0)
    model = ModCRModel(cfg)
    sample = collate_candidates(
        [ds.featurize(ex)] * args.micro_batch,
        [ds.get_image(ex)] * args.micro_batch, spec)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), {k: jnp.asarray(v) for k, v in sample.items()})
    scorer = ModCRScorer(cfg, params, bert, rob, feats,
                         micro_batch=args.micro_batch, warm=True,
                         use_device_table=args.device_features)

    if args.overload:
        print(json.dumps(run_overload(scorer, args)))
        return

    results = {}
    for mode, batching in (("locked", False), ("batched", True)):
        server = serve(scorer, port=args.port, block=False,
                       batching=batching, max_wait_ms=args.max_wait_ms)
        # warm the path once (first batched call compiles nothing new —
        # scorer is warm — but primes threads)
        hammer(args.port, 1, 2)
        wall, lat, errors = hammer(args.port, args.clients, args.requests)
        if batching and getattr(server, "modcr_batcher", None):
            dispatch_sizes = server.modcr_batcher.telemetry()
        server.modcr_close()  # socket + batcher dispatcher threads
        time.sleep(0.5)
        if not lat:
            raise SystemExit(f"[serve-bench] every request failed: {errors[:3]}")
        stats = {
            "rps": round(len(lat) / wall, 2),  # COMPLETED requests only
            "errors": len(errors),
            "p50_ms": round(1e3 * lat[len(lat) // 2], 1),
            "p90_ms": round(1e3 * lat[int(len(lat) * 0.9)], 1),
            "wall_s": round(wall, 2),
        }
        if batching and getattr(server, "modcr_batcher", None):
            stats["mean_dispatch_size"] = round(
                float(np.mean(dispatch_sizes)), 2)
        results[mode] = stats
        print(f"[serve-bench] {mode}: {stats}", file=sys.stderr, flush=True)

    results["clients"] = args.clients
    results["micro_batch"] = args.micro_batch
    results["speedup"] = round(
        results["batched"]["rps"] / results["locked"]["rps"], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
