"""Online rationale-generation latency/throughput on the real chip.

Times the serving ``/generate`` path end-to-end at FULL size (Oscar-base
global + ChunkAlign towers, GPT-2 124M decoder): a jitted classify pass
over the question's 4 candidate rows, then a jitted KV-cached greedy
decode of the ``<|b_rtnl|>``-prompted explanation.  Methodology per
BENCHMARKS.md: host readback every call; alternate-and-repeat.

    python scripts/bench_generate.py --questions 4 --max_len 32 --calls 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[bench-generate] {msg}", file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--questions", type=int, default=4,
                   help="micro_batch: questions per device call")
    p.add_argument("--max_len", type=int, default=32)
    p.add_argument("--calls", type=int, default=8)
    p.add_argument("--compute_dtype", default="bfloat16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/modcr_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    log(f"devices: {jax.devices()}")

    from multimodal_context_reasoning_tpu.core.config import (
        ChunkAlignConfig,
        EncoderConfig,
        GPT2Config,
    )
    from multimodal_context_reasoning_tpu.data.collate import BatchSpec
    from multimodal_context_reasoning_tpu.data.schemas import (
        ImageFeatures,
        RawExample,
    )
    from multimodal_context_reasoning_tpu.data.tokenization import HashTokenizer
    from multimodal_context_reasoning_tpu.models.rationale import (
        RationaleModel,
        rationale_init_batch,
    )
    from multimodal_context_reasoning_tpu.serving.generator import (
        RationaleGenerator,
    )

    dt = args.compute_dtype
    enc = EncoderConfig(dtype=dt)                 # Oscar-base geometry
    sched = ChunkAlignConfig()
    gpt = GPT2Config(dtype=dt)                    # GPT-2 124M geometry
    spec = BatchSpec(text_len=140, img_len=50, roberta_len=128,
                     img_feature_dim=enc.img_feature_dim)

    rng = np.random.default_rng(0)
    feats = {
        f"img-{i}": ImageFeatures(
            features=rng.normal(size=(50, enc.img_feature_dim)).astype(
                np.float32),
            num_regions=50,
        ) for i in range(8)
    }
    bert = HashTokenizer(vocab_size=enc.vocab_size)
    gpt_tok = HashTokenizer(vocab_size=gpt.vocab_size)

    # init a full-size rationale param tree ON DEVICE through one
    # representative batch (expl stream included so the decoder traces)
    log("initializing full-size rationale params (jitted)...")
    model = RationaleModel(enc, sched, gpt, max_chunks=40)
    # shared init recipe (models/rationale.py) — expl stream included so
    # the decoder branch traces
    init_batch = {
        k: jnp.asarray(v)
        for k, v in rationale_init_batch(enc, gpt, spec).items()
    }
    t0 = time.perf_counter()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), init_batch)
    jax.block_until_ready(params)
    log(f"params initialized ({time.perf_counter() - t0:.1f}s)")

    log("building + warming generator (classify + decode programs)...")
    t0 = time.perf_counter()
    gen = RationaleGenerator(
        enc, sched, gpt, params, bert, gpt_tok, feats,
        spec=spec, micro_batch=args.questions,
        max_rationale_len=args.max_len, warm=True,
    )
    log(f"warm ({time.perf_counter() - t0:.1f}s)")

    def request(i, n):
        return [
            RawExample(f"q{i}-{j}", f"img-{(i + j) % 8}",
                       f"premise number {i} {j} about the scene .",
                       [f"answer {i} {j} option {k} ." for k in range(4)],
                       None)
            for j in range(n)
        ]

    lat = []
    decoded_tokens = 0
    for i in range(args.calls):
        t0 = time.perf_counter()
        out = gen.generate(request(i, args.questions))
        lat.append(time.perf_counter() - t0)
        assert len(out) == args.questions
        decoded_tokens += sum(len(r["rationale_ids"]) for r in out)
    # a degenerate decode (immediate eos everywhere) must not publish a
    # healthy-looking tok/s — report ACTUAL decoded tokens
    assert decoded_tokens > 0, "all decodes were empty"
    lat.sort()
    p50 = lat[len(lat) // 2]
    qps = args.questions / np.mean(lat)
    tok_s = decoded_tokens / sum(lat)
    log(f"p50 {p50 * 1e3:.0f} ms/call ({args.questions} questions, "
        f"≤{args.max_len} new tokens each, "
        f"{decoded_tokens / (args.calls * args.questions):.1f} decoded avg)")
    print(json.dumps({
        "questions_per_call": args.questions,
        "max_new_tokens": args.max_len,
        "p50_ms": round(p50 * 1e3, 1),
        "mean_ms": round(float(np.mean(lat)) * 1e3, 1),
        "questions_per_sec": round(float(qps), 2),
        "decoded_tokens_per_sec": round(float(tok_s), 1),
    }))


if __name__ == "__main__":
    main()
