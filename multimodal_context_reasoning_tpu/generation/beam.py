"""Constrained beam sampling, fully vectorized under jit.

Reference semantics (modeling_vcr_chunkalign_v10.py:2194-2320 ``beam_sample``
+ ``BeamSearchScorer_constrained.process`` :1892-1966 + ``BeamHypotheses``
:1794-1839):

per step, for every open beam —
1. log-softmax the next-token logits;
2. repetition penalty on tokens already generated (HF semantics:
   ``s<0 ? s*p : s/p``);
3. add the running beam scores, top-k warp;
4. sample ``2·K`` candidates *without replacement* from the softmax over
   the flattened ``[K·V]`` score matrix (torch.multinomial → Gumbel top-k
   here), then sort them by score descending;
5. walk the candidates in order: an EOS candidate ranked in the top K
   finalizes a hypothesis scored ``sum_logprobs / len^length_penalty``;
   a non-EOS candidate fills the next open beam slot, with its score
   multiplied by ``constrained`` when the token is in ``add_score_ids``
   (the boost compounds into all following steps, :1943-1944);
6. stop when every batch is done (worst kept hypothesis can no longer be
   beaten) or ``max_steps`` is reached.

The per-example Python walk of step 5 becomes a masked top-k: EOS
candidates are split off into the finished pool, the rest keep their sorted
order — identical selection, no host loop.  Static shapes throughout:
sequences live in a ``[B, K, L_total]`` buffer, the KV cache is prefilled
once over the prompt and gathered by beam origin each step.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from multimodal_context_reasoning_tpu.models.gpt2 import GPT2Decoder, KVCache

NEG = -1.0e9


def apply_repetition_penalty(
    logp: jnp.ndarray,        # [N, V]
    seqs: jnp.ndarray,        # [N, L] generated-so-far (pad elsewhere)
    valid: jnp.ndarray,       # [N, L] bool, True where seqs holds a real token
    penalty: float,
) -> jnp.ndarray:
    """HF RepetitionPenaltyLogitsProcessor: s<0 → s·p, else s/p, for every
    token id present in the sequence."""
    if penalty == 1.0:
        return logp
    N, V = logp.shape
    present = jnp.zeros((N, V), bool)
    one = jnp.ones(seqs.shape, bool) & valid
    present = present.at[jnp.arange(N)[:, None], seqs].max(one)
    penalized = jnp.where(logp < 0, logp * penalty, logp / penalty)
    return jnp.where(present, penalized, logp)


def top_k_warp(scores: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep the top-k per row, everything else → -inf (TopKLogitsWarper)."""
    if k <= 0 or k >= scores.shape[-1]:
        return scores
    kth = jnp.sort(scores, axis=-1)[..., -k][..., None]
    return jnp.where(scores < kth, NEG, scores)


class BeamState(NamedTuple):
    seqs: jnp.ndarray          # [B, K, L_total] int32
    beam_scores: jnp.ndarray   # [B, K] f32 running sum of logprobs (boosted)
    cache: KVCache             # rows = B·K
    cur_len: jnp.ndarray       # scalar int32: tokens generated so far
    fin_seqs: jnp.ndarray      # [B, K, L_total]
    fin_scores: jnp.ndarray    # [B, K] length-penalized, -inf if empty
    fin_count: jnp.ndarray     # [B] int32
    done: jnp.ndarray          # [B] bool
    rng: jax.Array
    fin_lens: jnp.ndarray      # [B, K] int32 generated length at finalize
                               # (tracked positionally — `seq != pad_id`
                               # would miscount when pad is an emittable
                               # token, e.g. GPT-2's 50256)


class BeamContext(NamedTuple):
    """Static per-run inputs of one beam-advance (factored out of
    constrained_beam_sample so tests can drive :func:`beam_select_step`
    directly against a transcription of the reference scorer)."""

    p_ids: jnp.ndarray          # [N, Lp] beam-expanded prompt ids
    prompt_valid: jnp.ndarray   # [N, Lp] real-prompt-token mask
    prompt_len: jnp.ndarray     # [B] per-example real prompt length
    cmask: jnp.ndarray          # [B, V] constraint-token mask
    eos_id: int
    num_beams: int
    constraint_factor: float
    repetition_penalty: float
    top_k: int
    length_penalty: float


def beam_select_step(state: BeamState, logp_raw: jnp.ndarray,
                     ctx: BeamContext) -> BeamState:
    """One beam-advance given next-token log-probs [N, V].

    Selection semantics transcribe ``BeamSearchScorer_constrained.process``
    + ``BeamHypotheses.add/is_done`` (v10.py:1794-1966), vectorized:

    - candidates are 2K Gumbel-top-k samples (torch.multinomial without
      replacement) sorted by raw score desc (beam_sample, v10.py:2194-2320);
    - an EOS candidate ranked in the top K finalizes a hypothesis scored
      ``sum_logprobs / (prompt_len + t) ** length_penalty`` — the reference
      normalizes by the FULL input_ids length, prompt included
      (BeamHypotheses.add, :1817);
    - non-EOS candidates fill beam slots in order; a constraint token's
      score is multiplied by ``constraint_factor`` AFTER selection
      (:1943-1944), compounding into later steps;
    - a batch is done when K hypotheses exist and the worst kept score
      beats the step's RAW best candidate score normalized at the current
      length (is_done, :1826-1839 — pre-boost, pre-selection max).
    """
    K = ctx.num_beams
    B, V = ctx.cmask.shape
    N = B * K
    L_total = state.seqs.shape[-1]
    t = state.cur_len

    gen = state.seqs.reshape(N, L_total)
    gen_valid = jnp.broadcast_to(
        jnp.arange(L_total)[None, :] < t, (N, L_total)
    )
    full_seq = jnp.concatenate([ctx.p_ids, gen], axis=1)
    full_valid = jnp.concatenate([ctx.prompt_valid, gen_valid], axis=1)
    logp = apply_repetition_penalty(
        logp_raw, full_seq, full_valid, ctx.repetition_penalty
    )
    scores = logp + state.beam_scores.reshape(N)[:, None]        # [N, V]
    scores = top_k_warp(scores, ctx.top_k)
    flat = scores.reshape(B, K * V)

    # Sample 2K without replacement: Gumbel perturb, take top-2K by the
    # perturbed value, then order the winners by raw score desc.
    rng, sub = jax.random.split(state.rng)
    g = jax.random.gumbel(sub, flat.shape, flat.dtype)
    _, idx = jax.lax.top_k(flat + g, 2 * K)                      # [B, 2K]
    cand_scores = jnp.take_along_axis(flat, idx, axis=1)
    order = jnp.argsort(-cand_scores, axis=1)
    idx = jnp.take_along_axis(idx, order, axis=1)
    cand_scores = jnp.take_along_axis(cand_scores, order, axis=1)
    origin = idx // V                                            # [B, 2K]
    token = idx % V

    is_eos = token == ctx.eos_id
    rank = jnp.broadcast_to(jnp.arange(2 * K)[None], (B, 2 * K))

    # Reference length base: prompt + generated-so-far (input_ids.shape[-1]
    # at process() time — the EOS itself is never appended).
    hyp_len = jnp.maximum(
        ctx.prompt_len.astype(jnp.float32) + t.astype(jnp.float32), 1.0
    )[:, None]                                                   # [B, 1]

    # ---- Finished pool: EOS candidates ranked in the top K
    # (process(): worse-than-top-K EOS is dropped, :1934-1937).
    eos_scores = jnp.where(
        is_eos & (rank < K),
        cand_scores / (hyp_len ** ctx.length_penalty),
        NEG,
    )                                                            # [B, 2K]
    cand_seqs = jnp.take_along_axis(
        state.seqs, origin[..., None], axis=1
    )                                                            # [B, 2K, L]
    pool_scores = jnp.concatenate([state.fin_scores, eos_scores], axis=1)
    pool_seqs = jnp.concatenate([state.fin_seqs, cand_seqs], axis=1)
    # a hypothesis finalized now holds t generated tokens (the EOS is never
    # appended — BeamHypotheses.add receives input_ids pre-EOS, :1817)
    pool_lens = jnp.concatenate(
        [state.fin_lens, jnp.broadcast_to(t, (B, 2 * K)).astype(jnp.int32)],
        axis=1,
    )
    top_scores, top_idx = jax.lax.top_k(pool_scores, K)
    new_fin_seqs = jnp.take_along_axis(pool_seqs, top_idx[..., None], axis=1)
    new_fin_lens = jnp.take_along_axis(pool_lens, top_idx, axis=1)
    new_fin_count = jnp.minimum(
        state.fin_count + jnp.sum(eos_scores > NEG, axis=1), K
    )
    # frozen batches keep their pool untouched
    keep = state.done[:, None]
    new_fin_scores = jnp.where(keep, state.fin_scores, top_scores)
    new_fin_seqs = jnp.where(keep[..., None], state.fin_seqs, new_fin_seqs)
    new_fin_lens = jnp.where(keep, state.fin_lens, new_fin_lens)
    new_fin_count = jnp.where(state.done, state.fin_count, new_fin_count)

    # ---- Next beams: first K non-EOS candidates in sorted order.
    open_scores = jnp.where(is_eos, NEG, cand_scores)
    k_scores, k_idx = jax.lax.top_k(open_scores, K)              # [B, K]
    k_token = jnp.take_along_axis(token, k_idx, axis=1)
    k_origin = jnp.take_along_axis(origin, k_idx, axis=1)
    # constraint boost AFTER selection (reference boosts the score it
    # writes into next_beam_scores, :1943-1944)
    boosted = jnp.take_along_axis(ctx.cmask, k_token, axis=1)
    k_scores = jnp.where(boosted, k_scores * ctx.constraint_factor, k_scores)

    # reorder sequences + append token (frozen batches: no-op)
    new_seqs = jnp.take_along_axis(state.seqs, k_origin[..., None], axis=1)
    new_seqs = jax.lax.dynamic_update_slice(
        new_seqs, k_token[..., None], (0, 0, t)
    )
    new_seqs = jnp.where(keep[..., None], state.seqs, new_seqs)
    new_scores = jnp.where(keep, state.beam_scores, k_scores)

    # reorder the KV cache by beam origin (global row ids)
    rows = (jnp.arange(B)[:, None] * K + k_origin).reshape(N)
    new_cache = KVCache(state.cache.k[:, rows], state.cache.v[:, rows])

    # done test (is_done, early_stopping=False, :1826-1839): K hypotheses
    # kept and the worst can no longer be beaten by the step's RAW best
    # candidate score (pre-boost, pre-selection) at the CURRENT length.
    cur_score = cand_scores[:, 0] / (hyp_len[:, 0] ** ctx.length_penalty)
    worst_kept = jnp.min(new_fin_scores, axis=1)
    newly_done = (new_fin_count >= K) & (worst_kept >= cur_score)

    return BeamState(
        seqs=new_seqs,
        beam_scores=new_scores,
        cache=new_cache,
        cur_len=t + 1,
        fin_seqs=new_fin_seqs,
        fin_scores=new_fin_scores,
        fin_count=new_fin_count,
        done=state.done | newly_done,
        rng=rng,
        fin_lens=new_fin_lens,
    )


def constrained_beam_sample(
    model: GPT2Decoder,
    params,
    prompt_ids: jnp.ndarray,           # [B, Lp] right-padded
    prompt_len: jnp.ndarray,           # [B]
    *,
    memory: Optional[jnp.ndarray] = None,        # [B, M, D]
    memory_mask: Optional[jnp.ndarray] = None,   # [B, M]
    num_beams: int = 5,
    max_steps: int = 50,
    eos_id: int,
    pad_id: int = 0,
    rng: jax.Array,
    constraint_mask: Optional[jnp.ndarray] = None,  # [B, V] bool: add_score_ids
    constraint_factor: float = 0.8,
    repetition_penalty: float = 1.0,
    top_k: int = 50,
    length_penalty: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (best_tokens [B, max_steps], best_len [B])."""
    B, Lp = prompt_ids.shape
    K = num_beams
    V = model.config.vocab_size
    L_total = Lp + max_steps
    N = B * K

    # --- Expand prompt/memory over beams and prefill the cache.
    rep = lambda x: jnp.repeat(x, K, axis=0) if x is not None else None
    p_ids = rep(prompt_ids)
    p_len = rep(prompt_len)
    mem = rep(memory)
    mem_mask = rep(memory_mask)

    cache = KVCache.zeros(model.config, N, L_total)
    pos = jnp.arange(L_total)[None, :]
    cache_valid = ((pos < p_len[:, None]) | (pos >= Lp)).astype(jnp.float32)
    logits, cache = model.apply(
        params, p_ids,
        memory=mem, memory_mask=mem_mask,
        cache=cache, cache_index=jnp.int32(0), cache_valid=cache_valid,
        deterministic=True,
    )
    last_logits = jnp.take_along_axis(
        logits, (p_len - 1)[:, None, None], axis=1
    )[:, 0]                                                     # [N, V]

    state = BeamState(
        seqs=jnp.full((B, K, L_total), pad_id, jnp.int32),
        beam_scores=jnp.zeros((B, K), jnp.float32),
        cache=cache,
        cur_len=jnp.int32(0),
        fin_seqs=jnp.full((B, K, L_total), pad_id, jnp.int32),
        fin_scores=jnp.full((B, K), NEG, jnp.float32),
        fin_count=jnp.zeros((B,), jnp.int32),
        done=jnp.zeros((B,), bool),
        rng=rng,
        fin_lens=jnp.zeros((B, K), jnp.int32),
    )

    cmask = constraint_mask if constraint_mask is not None else jnp.zeros((B, V), bool)

    # repetition penalty covers the PROMPT too (the reference penalizes over
    # the full input_ids, prompt included — beam_sample feeds input_ids to
    # the logits_processor, v10.py:2255)
    prompt_valid = jnp.arange(Lp)[None, :] < p_len[:, None]      # [N, Lp]

    ctx = BeamContext(
        p_ids=p_ids, prompt_valid=prompt_valid, prompt_len=prompt_len,
        cmask=cmask, eos_id=eos_id, num_beams=K,
        constraint_factor=constraint_factor,
        repetition_penalty=repetition_penalty,
        top_k=top_k, length_penalty=length_penalty,
    )
    select = lambda state, logp: beam_select_step(state, logp, ctx)

    # first advance uses the prefill logits
    state = select(state, jax.nn.log_softmax(last_logits.astype(jnp.float32)))

    def cond(state: BeamState):
        return (state.cur_len < max_steps) & ~jnp.all(state.done)

    def body(state: BeamState):
        tok = state.seqs.reshape(N, L_total)[
            jnp.arange(N), state.cur_len - 1
        ]                                                        # last token
        logits, cache = model.apply(
            params, tok[:, None],
            position_offset=p_len + state.cur_len - 1,
            memory=mem, memory_mask=mem_mask,
            cache=state.cache, cache_index=Lp + state.cur_len - 1,
            cache_valid=cache_valid,
            deterministic=True,
        )
        state = state._replace(cache=cache)
        return select(state, jax.nn.log_softmax(logits[:, 0].astype(jnp.float32)))

    state = jax.lax.while_loop(cond, body, state)

    # ---- Finalize: open beams fill remaining pool slots (scorer.finalize,
    # v10.py:1975+) — scored at the reference's prompt-inclusive length.
    final_len = jnp.maximum(
        prompt_len.astype(jnp.float32) + state.cur_len.astype(jnp.float32), 1.0
    )[:, None]
    final_open = state.beam_scores / (final_len ** length_penalty)
    pool_scores = jnp.concatenate([state.fin_scores, final_open], axis=1)
    pool_seqs = jnp.concatenate([state.fin_seqs, state.seqs], axis=1)
    # open beams hold cur_len generated tokens; finished ones carry their
    # recorded length (positional — robust to an emittable pad id)
    pool_lens = jnp.concatenate(
        [state.fin_lens,
         jnp.broadcast_to(state.cur_len, state.fin_lens.shape).astype(jnp.int32)],
        axis=1,
    )
    best = jnp.argmax(pool_scores, axis=1)                       # [B]
    best_seqs = jnp.take_along_axis(
        pool_seqs, best[:, None, None], axis=1
    )[:, 0]                                                      # [B, L_total]
    best_tokens = best_seqs[:, :max_steps]
    lengths = jnp.minimum(
        jnp.take_along_axis(pool_lens, best[:, None], axis=1)[:, 0],
        max_steps,
    )
    return best_tokens, lengths
