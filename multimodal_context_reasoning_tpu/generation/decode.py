"""Greedy KV-cached decoding under jit.

Reference: the incremental greedy loop of ``ChunkAlign_CLS_dec5_4.evaluate``
(modeling_vcr_chunkalign_v10.py:1463-1493) — a per-example Python ``while``
appending one token at a time with dynamically growing ``past`` tuples.
Here: one ``lax.scan`` over ``max_len`` steps with a static KV cache, whole
batch at once, compiled once.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from multimodal_context_reasoning_tpu.models.gpt2 import GPT2Decoder, KVCache


def greedy_decode(
    model: GPT2Decoder,
    params,
    prompt_ids: jnp.ndarray,        # [B, Lp] right-padded prompt
    prompt_len: jnp.ndarray,        # [B] real prompt lengths
    *,
    memory: Optional[jnp.ndarray] = None,
    memory_mask: Optional[jnp.ndarray] = None,
    max_len: int = 50,
    eos_id: int = 50256,
    pad_id: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (tokens [B, max_len], lengths [B]).

    The prompt is consumed in one prefill pass (all positions in parallel —
    MXU-friendly); generation then scans one token per step reusing the
    cache.  Right-padding inside the prompt is masked out of attention.
    """
    B, Lp = prompt_ids.shape
    L_total = Lp + max_len
    cache = KVCache.zeros(model.config, B, L_total)

    prompt_mask = (
        jnp.arange(Lp)[None, :] < prompt_len[:, None]
    ).astype(jnp.float32)

    # Prefill: cache_index=0 writes positions [0, Lp).
    logits, cache = model.apply(
        params, prompt_ids,
        memory=memory, memory_mask=memory_mask,
        cache=cache, cache_index=jnp.int32(0),
        deterministic=True,
    )
    # Last real prompt token's logits seed the first generated token.
    last = jnp.take_along_axis(
        logits, (prompt_len - 1)[:, None, None], axis=1
    )[:, 0]                                                    # [B, V]
    # Padded prompt positions must not be attended later: they were written
    # into the cache, so mask them by position when decoding.  We instead
    # rely on the causal-by-position mask plus left-compaction: tokens are
    # written at position prompt positions; generated tokens start at Lp.
    first_tok = jnp.argmax(last, axis=-1).astype(jnp.int32)    # [B]

    def step(carry, t):
        cache, tok, done = carry
        logits, cache = model.apply(
            params, tok[:, None],
            position_offset=prompt_len,  # positions continue from real length
            memory=memory, memory_mask=memory_mask,
            cache=cache, cache_index=Lp + t,
            deterministic=True,
        )
        nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
        out_tok = jnp.where(done, pad_id, tok)
        done = done | (tok == eos_id)
        return (cache, nxt, done), out_tok

    done0 = jnp.zeros((B,), bool)
    (_, _, done), toks = jax.lax.scan(
        step, (cache, first_tok, done0), jnp.arange(max_len)
    )
    tokens = jnp.transpose(toks, (1, 0))                       # [B, max_len]
    lengths = jnp.sum((tokens != pad_id).astype(jnp.int32), axis=-1)
    return tokens, lengths
