"""Measure the Pallas spec-kernel's documented win geometry.

PALLAS_NOTES.md round 2 left one claim unmeasured: at production L=190 the
kernel is 0.965x of XLA (per-head 190x64 matmuls under-fill the MXU and
the kernel pays layout transposes), but "sequences near lane multiples
(e.g. a 206-token config -> L=256) are where it should win".  This script
measures exactly that: full-model forward throughput with the kernel ON
vs OFF in the two image-text encoders (the towers the staged-mask kernel
serves; the RoBERTa reasoner stays on XLA -- its L=138 stream is the
under-fill case), alternated back-to-back and repeated, at

  - parity geometry: text_len=140  -> encoder L=190 (reproduces r2)
  - lane geometry:   text_len=206  -> encoder L=256

Run: python scripts/bench_pallas_geometry.py --examples 32 --iters 15
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(text_len: int, use_pallas: bool, n_examples: int):
    import jax

    from __graft_entry__ import _synthetic_batch
    from multimodal_context_reasoning_tpu.core.config import ModCRConfig
    from multimodal_context_reasoning_tpu.models.modcr import ModCRModel

    cfg = ModCRConfig(
        text_len=text_len,
        compute_alignment=False,   # attention probs force the einsum path;
                                   # drop them so BOTH arms run their best
    ).with_dtype("bfloat16")
    enc = dataclasses.replace(cfg.global_encoder, use_pallas=use_pallas)
    cfg = dataclasses.replace(cfg, global_encoder=enc, seq_encoder=enc)
    model = ModCRModel(cfg)
    batch = _synthetic_batch(cfg, n_examples=n_examples)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    fwd = jax.jit(lambda p, b: model.apply(p, b, deterministic=True).logits)
    np.asarray(fwd(params, batch))          # compile + warm
    return fwd, params, batch


def measure(fwd, params, batch, iters: int, n_examples: int) -> float:
    np.asarray(fwd(params, batch))
    t0 = time.perf_counter()
    prev = fwd(params, batch)
    for _ in range(iters - 1):
        cur = fwd(params, batch)
        np.asarray(prev)
        prev = cur
    np.asarray(prev)
    dt = time.perf_counter() - t0
    return n_examples * iters / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--examples", type=int, default=32)
    p.add_argument("--iters", type=int, default=15)
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--geometries", default="140,206")
    args = p.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/modcr_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    out = {}
    for tl in (int(t) for t in args.geometries.split(",")):
        L = tl + 50
        arms = {}
        print(f"[pallas-geom] building text_len={tl} (L={L})...",
              file=sys.stderr, flush=True)
        for name, up in (("xla", False), ("pallas", True)):
            arms[name] = build(tl, up, args.examples)
        res = {"xla": [], "pallas": []}
        for rep in range(args.repeats):
            for name in ("xla", "pallas"):       # alternate back-to-back
                fwd, params, batch = arms[name]
                v = measure(fwd, params, batch, args.iters, args.examples)
                res[name].append(round(v, 1))
                print(f"[pallas-geom] L={L} rep{rep} {name}: {v:.1f} ex/s",
                      file=sys.stderr, flush=True)
        ratio = (np.mean(res["pallas"]) / np.mean(res["xla"]))
        out[f"L{L}"] = {**res, "pallas_vs_xla": round(float(ratio), 3)}
        del arms
    print(json.dumps(out))


if __name__ == "__main__":
    main()
