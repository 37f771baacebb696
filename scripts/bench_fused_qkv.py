"""Measure fused QKV/KV projections at ModCR parity geometry (VERDICT r3
task 7 — the round-1 ledger sentence "further gains need int8 or
cross-tower scheduling" left projection structure unmeasured).

models/layers.py:115-122 issues three [D, D] projection matmuls per
attention layer (q on the token stream; k, v on the prefix-extended
stream).  Candidate rewrites:

- ``kv-fused``: one [D, 2D] matmul for k,v over the kv stream + q alone
  (always applicable, prefix or not);
- ``qkv-fused``: one [D, 3D] matmul (applicable when q and k/v share the
  input — every encoder layer without prefix/chunk rewrite);
- in-graph ``concat`` variant: params stay separate, kernels concatenated
  inside the jitted program (costs an HBM copy of the weights per step —
  measured so the ship decision is honest about it).

Timing: alternate variants in one tunnel window, fetch outputs to host
each step (CLAUDE.md tunnel rules), report ms/call over the full
24-layer-equivalent loop.

    python scripts/bench_fused_qkv.py --reps 3 --iters 20
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--rows", type=int, default=64,
                   help="candidate rows (16 examples x 4)")
    p.add_argument("--layers", type=int, default=24)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/modcr_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    # RoBERTa-large parity geometry: rows x (prefix 10 + 128 tokens) x 1024
    R, L, P, D = args.rows, 128, 10, 1024
    NL = args.layers
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    x = jnp.asarray(rng.normal(size=(R, L, D)), dt)          # token stream
    kv = jnp.asarray(rng.normal(size=(R, L + P, D)), dt)     # prefix-extended
    wq = [jnp.asarray(rng.normal(size=(D, D)) * 0.02, dt) for _ in range(NL)]
    wk = [jnp.asarray(rng.normal(size=(D, D)) * 0.02, dt) for _ in range(NL)]
    wv = [jnp.asarray(rng.normal(size=(D, D)) * 0.02, dt) for _ in range(NL)]
    wkv = [jnp.concatenate([a, b], axis=1) for a, b in zip(wk, wv)]
    wqkv = [jnp.concatenate([a, b, c], axis=1)
            for a, b, c in zip(wq, wk, wv)]

    def reduce_(qs, ks, vs):
        # cheap data-dependent reduction so nothing dead-code-eliminates
        return sum((q.sum() + k.sum() + v.sum()).astype(jnp.float32)
                   for q, k, v in zip(qs, ks, vs))

    @jax.jit
    def three(x, kv, wq, wk, wv):
        qs, ks, vs = [], [], []
        for i in range(NL):
            qs.append(x @ wq[i])
            ks.append(kv @ wk[i])
            vs.append(kv @ wv[i])
        return reduce_(qs, ks, vs)

    @jax.jit
    def kv_fused(x, kv, wq, wkv):
        qs, ks, vs = [], [], []
        for i in range(NL):
            qs.append(x @ wq[i])
            k, v = jnp.split(kv @ wkv[i], 2, axis=-1)
            ks.append(k)
            vs.append(v)
        return reduce_(qs, ks, vs)

    @jax.jit
    def kv_fused_concat_in_graph(x, kv, wq, wk, wv):
        qs, ks, vs = [], [], []
        for i in range(NL):
            qs.append(x @ wq[i])
            k, v = jnp.split(kv @ jnp.concatenate([wk[i], wv[i]], axis=1),
                             2, axis=-1)
            ks.append(k)
            vs.append(v)
        return reduce_(qs, ks, vs)

    @jax.jit
    def qkv_fused_noprefix(x, wqkv):
        qs, ks, vs = [], [], []
        for i in range(NL):
            q, k, v = jnp.split(x @ wqkv[i], 3, axis=-1)
            qs.append(q)
            ks.append(k)
            vs.append(v)
        return reduce_(qs, ks, vs)

    @jax.jit
    def three_noprefix(x, wq, wk, wv):
        qs, ks, vs = [], [], []
        for i in range(NL):
            qs.append(x @ wq[i])
            ks.append(x @ wk[i])
            vs.append(x @ wv[i])
        return reduce_(qs, ks, vs)

    variants = {
        "three": lambda: three(x, kv, wq, wk, wv),
        "kv_fused": lambda: kv_fused(x, kv, wq, wkv),
        "kv_fused_concat": lambda: kv_fused_concat_in_graph(x, kv, wq, wk, wv),
        "three_noprefix": lambda: three_noprefix(x, wq, wk, wv),
        "qkv_fused_noprefix": lambda: qkv_fused_noprefix(x, wqkv),
    }
    for name, fn in variants.items():
        np.asarray(fn())  # compile
        print(f"[qkv-bench] compiled {name}", file=sys.stderr, flush=True)

    results = {name: [] for name in variants}
    for rep in range(args.reps):
        for name, fn in variants.items():   # alternate within each rep
            t0 = time.perf_counter()
            for _ in range(args.iters):
                np.asarray(fn())            # fetch = real completion
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            results[name].append(round(ms, 3))
            print(f"[qkv-bench] rep{rep} {name}: {ms:.3f} ms",
                  file=sys.stderr, flush=True)

    summary = {name: {"ms_per_call": vals,
                      "best_ms": min(vals)} for name, vals in results.items()}
    summary["geometry"] = {"rows": R, "len": L, "prefix": P, "dim": D,
                           "layers": NL, "dtype": "bfloat16"}
    summary["speedup_kv_fused"] = round(
        min(results["three"]) / min(results["kv_fused"]), 3)
    summary["speedup_qkv_fused"] = round(
        min(results["three_noprefix"]) / min(results["qkv_fused_noprefix"]),
        3)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
