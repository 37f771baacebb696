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

    # readable cache slots: real prompt tokens + everything generated
    # (right-padded prompt slots hold garbage K/V and must stay masked)
    pos = jnp.arange(L_total)[None, :]
    cache_valid = ((pos < prompt_len[:, None]) | (pos >= Lp)).astype(jnp.float32)

    # Prefill: cache_index=0 writes positions [0, Lp).
    logits, cache = model.apply(
        params, prompt_ids,
        memory=memory, memory_mask=memory_mask,
        cache=cache, cache_index=jnp.int32(0), cache_valid=cache_valid,
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
            position_offset=prompt_len + t,  # per-step positions continue
            # from each example's REAL length (reference feeds correct
            # incremental positions via its growing `past`, v10.py:1463-1493)
            memory=memory, memory_mask=memory_mask,
            cache=cache, cache_index=Lp + t, cache_valid=cache_valid,
            deterministic=True,
        )
        nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
        out_tok = jnp.where(done, pad_id, tok)
        active = ~done                      # this step emitted a real token
        done = done | (tok == eos_id)
        return (cache, nxt, done), (out_tok, active)

    done0 = jnp.zeros((B,), bool)
    (_, _, done), (toks, active) = jax.lax.scan(
        step, (cache, first_tok, done0), jnp.arange(max_len)
    )
    tokens = jnp.transpose(toks, (1, 0))                       # [B, max_len]
    # length = number of steps the row was still emitting (the eos itself
    # counts).  Positional, NOT `tokens != pad_id`: with GPT-2 pad_token_id
    # 50256 == <|endoftext|> a mid-sequence endoftext is a REAL emitted
    # token and must not shrink the reported length.
    lengths = jnp.sum(jnp.transpose(active, (1, 0)).astype(jnp.int32), axis=-1)
    return tokens, lengths


def top_k_top_p_filter(
    logits: jnp.ndarray, top_k: int = 0, top_p: float = 1.0,
    use_top_p: Optional[bool] = None,
) -> jnp.ndarray:
    """HF ``top_k_top_p_filtering`` semantics (reference
    modeling/modeling_utils.py:1046-1090): keep the top-k logits and/or the
    smallest prefix of the sorted distribution whose cumulative probability
    exceeds ``top_p``; everything else → -inf.  Static-shape, jit-safe.

    ``top_p`` may be a TRACED scalar (generation/api.py traces it so
    distinct floats reuse one program); then the branch can't be elided
    from the value, so callers pass ``use_top_p`` (a STATIC bool derived
    host-side) to skip the per-step vocab sort + cumsum when top_p >= 1.0
    — at which the masking formula is the identity up to fp32 cumsum
    rounding (which could otherwise clip real tail tokens)."""
    neg = jnp.asarray(-1e9, logits.dtype)
    if top_k > 0 and top_k < logits.shape[-1]:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, neg, logits)
    if use_top_p is None:
        use_top_p = not (isinstance(top_p, (int, float)) and top_p >= 1.0)
    if use_top_p:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        # keep tokens until cumulative prob exceeds top_p (always keep #1)
        cutoff_mask = cum - jax.nn.softmax(sorted_logits, axis=-1) > top_p
        cutoff = jnp.where(cutoff_mask, neg, sorted_logits)
        threshold = jnp.min(
            jnp.where(cutoff_mask, jnp.asarray(jnp.inf, logits.dtype), sorted_logits),
            axis=-1, keepdims=True,
        )
        logits = jnp.where(logits < threshold, neg, logits)
    return logits


def sample_decode(
    model: GPT2Decoder,
    params,
    prompt_ids: jnp.ndarray,
    prompt_len: jnp.ndarray,
    *,
    rng: jax.Array,
    memory: Optional[jnp.ndarray] = None,
    memory_mask: Optional[jnp.ndarray] = None,
    max_len: int = 50,
    eos_id: int = 50256,
    pad_id: int = 0,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    use_top_p: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ancestral sampling with temperature + top-k/top-p warps — the
    no-beam-search sampling branch of the legacy caption engine
    (modeling/modeling_utils.py:263-589).  ``use_top_p``: static gate for
    a traced ``top_p`` (see top_k_top_p_filter)."""
    B, Lp = prompt_ids.shape
    L_total = Lp + max_len
    cache = KVCache.zeros(model.config, B, L_total)
    pos = jnp.arange(L_total)[None, :]
    cache_valid = ((pos < prompt_len[:, None]) | (pos >= Lp)).astype(jnp.float32)
    logits, cache = model.apply(
        params, prompt_ids, memory=memory, memory_mask=memory_mask,
        cache=cache, cache_index=jnp.int32(0), cache_valid=cache_valid,
        deterministic=True,
    )
    last = jnp.take_along_axis(logits, (prompt_len - 1)[:, None, None], axis=1)[:, 0]

    # temperature may be traced (see top_k_top_p_filter note) — jnp.maximum
    # instead of python max
    temp = jnp.maximum(jnp.asarray(temperature, jnp.float32), 1e-6)

    def pick(rng, lg):
        lg = lg.astype(jnp.float32) / temp
        lg = top_k_top_p_filter(lg, top_k, top_p, use_top_p=use_top_p)
        return jax.random.categorical(rng, lg, axis=-1).astype(jnp.int32)

    rng, sub = jax.random.split(rng)
    first_tok = pick(sub, last)

    def step(carry, t):
        cache, tok, done, rng = carry
        logits, cache = model.apply(
            params, tok[:, None],
            position_offset=prompt_len + t,
            memory=memory, memory_mask=memory_mask,
            cache=cache, cache_index=Lp + t, cache_valid=cache_valid,
            deterministic=True,
        )
        rng, sub = jax.random.split(rng)
        nxt = pick(sub, logits[:, 0])
        out_tok = jnp.where(done, pad_id, tok)
        active = ~done
        done = done | (tok == eos_id)
        return (cache, nxt, done, rng), (out_tok, active)

    (_, _, _, _), (toks, active) = jax.lax.scan(
        step, (cache, first_tok, jnp.zeros((B,), bool), rng), jnp.arange(max_len)
    )
    tokens = jnp.transpose(toks, (1, 0))
    # positional length (see greedy_decode) — robust to an emittable pad id
    lengths = jnp.sum(jnp.transpose(active, (1, 0)).astype(jnp.int32), axis=-1)
    return tokens, lengths
