"""Compile-time scaling of fsm_beam_search: lax.scan vs unrolled.

The unrolled implementation traces (max_steps - 1) × S top_k lattice
blocks as straight-line HLO; the scan implementation traces the body
once.  This measures trace+compile wall time of the full
``fsm_decode_gpt2`` program (KV-cached GPT-2 steps inside the loop) at
production-ish lattice geometry: S=8 states (3 constraints), K=5 beams,
20 steps, full 50257-token vocab.

Usage:
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/bench_fsm_compile.py [--steps 20] [--layers 2]

Prints one JSON line per implementation on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--beams", type=int, default=5)
    p.add_argument("--layers", type=int, default=2,
                   help="decoder layers (compile cost of the loop BODY is "
                        "layer-proportional; the scan/unrolled ratio is not)")
    p.add_argument("--vocab", type=int, default=50257)
    p.add_argument("--implementations", default="scan,unrolled")
    args = p.parse_args()

    from multimodal_context_reasoning_tpu.core.config import GPT2Config
    from multimodal_context_reasoning_tpu.generation.fsm import (
        FiniteStateMachineBuilder,
        fsm_beam_search,
    )
    from multimodal_context_reasoning_tpu.models.gpt2 import (
        GPT2Decoder,
        KVCache,
    )

    cfg = GPT2Config(
        vocab_size=args.vocab, n_layer=args.layers, n_embd=256, n_head=4,
        add_cross_attention=False,
    )
    model = GPT2Decoder(cfg)
    B, Lp = 1, 4
    prompt = jnp.ones((B, Lp), jnp.int32)
    prompt_len = jnp.full((B,), Lp, jnp.int32)
    params = jax.jit(
        lambda rng: model.init(rng, prompt, cache=None, deterministic=True)
    )(jax.random.PRNGKey(0))

    builder = FiniteStateMachineBuilder(
        args.vocab, max_given_constraints=3, max_words_per_constraint=1)
    fsm = builder.build([[[5]], [[7]], [[9]]])   # S = 8 main states
    adjacency = jnp.asarray(fsm.adjacency[None])
    S, K = adjacency.shape[1], args.beams
    N = B * S * K
    L_total = Lp + args.steps

    for impl in args.implementations.split(","):
        def run(prompt, prompt_len, adjacency, impl=impl):
            rep = lambda x: jnp.repeat(x, S * K, axis=0)
            p_ids, p_len = rep(prompt), rep(prompt_len)
            cache = KVCache.zeros(cfg, N, L_total)
            pos = jnp.arange(L_total)[None, :]
            cache_valid = ((pos < p_len[:, None]) | (pos >= Lp)).astype(
                jnp.float32)
            logits, cache = model.apply(
                params, p_ids, cache=cache, cache_index=jnp.int32(0),
                cache_valid=cache_valid, deterministic=True)
            last = jnp.take_along_axis(
                logits, (p_len - 1)[:, None, None], axis=1)[:, 0]
            init_logp = jax.nn.log_softmax(
                last.reshape(B, S * K, -1)[:, 0].astype(jnp.float32), -1)

            def step_fn(tok, cache, t):
                logits, cache = model.apply(
                    params, tok[:, None], position_offset=p_len + t - 1,
                    cache=cache, cache_index=Lp + t - 1,
                    cache_valid=cache_valid, deterministic=True)
                return jax.nn.log_softmax(
                    logits[:, 0].astype(jnp.float32), -1), cache

            return fsm_beam_search(
                init_logp, step_fn, cache,
                lambda c, rows: KVCache(c.k[:, rows], c.v[:, rows]),
                adjacency, num_beams=K, max_steps=args.steps,
                eos_ids=(50256,), implementation=impl)

        t0 = time.time()
        lowered = jax.jit(run).lower(prompt, prompt_len, adjacency)
        t_trace = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        t_compile = time.time() - t0
        t0 = time.time()
        beams, lp = compiled(prompt, prompt_len, adjacency)
        np.asarray(beams)
        t_run = time.time() - t0
        print(json.dumps({
            "implementation": impl, "S": int(S), "K": K,
            "steps": args.steps, "vocab": args.vocab,
            "layers": args.layers, "backend": jax.default_backend(),
            "trace_s": round(t_trace, 2), "compile_s": round(t_compile, 2),
            "first_run_s": round(t_run, 2),
            "beams_checksum": int(np.asarray(beams).sum() % 100003),
        }))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
