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
