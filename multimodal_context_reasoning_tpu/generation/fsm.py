"""FSM-constrained beam search (the utils/cbs.py capability, TPU-native).

Rebuilds the reference's second constrained-decoding flavor — beam search
over a finite-state-machine lattice ("Guided Open Vocabulary Image
Captioning with Constrained Beam Search") — as a jit-compiled program:

- :class:`FiniteStateMachineBuilder` — host-side numpy construction of the
  per-example adjacency tensor, transcribing the reference's state layout
  and wiring exactly (utils/cbs.py:631-857): ``2**k`` main states whose bit
  patterns count satisfied constraints, sub-states for multi-word
  constraints that reset to their origin block on a mismatch, and the
  reference's quirk that a later single-word constraint's ``_connect``
  RESTORES self-loops an earlier constraint removed (making the machine
  nondeterministic — which the adjacency representation handles naturally).
  The builder consumes token ids directly instead of the reference's Open
  Images TSV files (:434-441); wordforms are lists of interchangeable ids.

- :func:`fsm_beam_search` — the search core (utils/cbs.py:54-364) as one
  traced program: a static python loop over ``max_steps`` timesteps, each
  advancing a ``[B, S, K]`` lattice of beams with ``lax.top_k`` selection
  per target state and in-loop backpointer reordering of the sequence
  buffer and the caller's decode carry (KV cache) — replacing the
  reference's per-step host tensors and final backpointer reconstruction
  loop (:305-333).  Selection equivalence with the reference's
  per-node-topk-then-global-topk is exact for the default
  ``per_node_beam_size == beam_size`` (any global top-K contains at most K
  items per (state, beam) row).

- :func:`select_best_beam_with_constraints` — length-normalized best-beam
  pick over constraint-satisfying main states (utils/cbs.py:366-431),
  vectorized (popcount via bit tricks instead of ``bin(s).count``).
"""

from __future__ import annotations

from typing import Callable, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e20


class FSM(NamedTuple):
    """One example's finite state machine.

    ``adjacency[s_from, s_to, v] = 1`` ⇔ decoding token ``v`` in ``s_from``
    may move to ``s_to`` (utils/cbs.py:648-652 representation).
    """

    adjacency: np.ndarray       # [S, S, V] uint8
    num_main_states: int        # 2 ** max_given_constraints
    substate_end: int           # first unused sub-state index


class FiniteStateMachineBuilder:
    """Builds per-example FSMs from tokenized constraints.

    ``constraints`` for :meth:`build` is a list (≤ ``max_given_constraints``)
    of constraints; each constraint is a list of words (multi-word classes
    like "fire hydrant"); each word is a list of interchangeable token ids
    (wordforms — singular/plural etc.).
    """

    def __init__(
        self,
        vocab_size: int,
        max_given_constraints: int = 3,
        max_words_per_constraint: int = 3,
    ):
        self.vocab_size = vocab_size
        self.max_given_constraints = max_given_constraints
        self.max_words_per_constraint = max_words_per_constraint
        self.num_main_states = 2 ** max_given_constraints
        self.num_total_states = self.num_main_states * max_words_per_constraint

    def build(self, constraints: Sequence[Sequence[Sequence[int]]]) -> FSM:
        assert len(constraints) <= self.max_given_constraints
        S, V = self.num_total_states, self.vocab_size
        fsm = np.zeros((S, S, V), np.uint8)
        # self-loops for all words on main states (cbs.py:736-739)
        for s in range(self.num_main_states):
            fsm[s, s, :] = 1

        substate_idx = self.num_main_states
        for n, constraint in enumerate(constraints, start=1):
            words = list(constraint)[: self.max_words_per_constraint]
            substate_idx = self._add_nth_constraint(fsm, n, substate_idx, words)
        return FSM(fsm, self.num_main_states, substate_idx)

    def _add_nth_constraint(self, fsm, n: int, substate_idx: int,
                            words: Sequence[Sequence[int]]) -> int:
        """cbs.py:749-807: connect every main state whose bit ``n-1`` is
        unset to its partner with the bit set, via sub-states for
        multi-word constraints."""
        stride = 2 ** (n - 1)
        from_state = 0
        while from_state < self.num_main_states:
            for _ in range(stride):
                word_from = from_state
                for i, wordforms in enumerate(words):
                    if i != len(words) - 1:
                        self._connect(fsm, word_from, substate_idx,
                                      wordforms, reset_state=from_state)
                        word_from = substate_idx
                        substate_idx += 1
                    else:
                        self._connect(fsm, word_from, from_state + stride,
                                      wordforms, reset_state=from_state)
                from_state += 1
            from_state += stride
        return substate_idx

    @staticmethod
    def _connect(fsm, from_state: int, to_state: int,
                 wordform_ids: Sequence[int], reset_state: int) -> None:
        """cbs.py:809-857 including its reset quirk: the reset block runs
        unconditionally (the reference always passes ``reset_state``), so a
        single-word constraint's origin row gets its self-loops REWRITTEN —
        restoring self-loops earlier constraints removed and leaving both
        transitions live (a nondeterministic edge the lattice search
        handles; removing this line would "fix" the reference's behavior,
        which parity forbids)."""
        for w in wordform_ids:
            fsm[from_state, to_state, w] = 1
            fsm[from_state, from_state, w] = 0
        # reset for non-matching words (sub-states), or the quirky self-loop
        # rewrite (main states, where reset_state == from_state)
        fsm[from_state, from_state, :] = 0
        fsm[from_state, reset_state, :] = 1
        for w in wordform_ids:
            fsm[from_state, reset_state, w] = 0


def fsm_beam_search(
    init_logp: jnp.ndarray,                 # [B, V] first-step log-probs
    step_fn: Callable,                      # (tok [N], carry, t) -> (logp [N,V], carry)
    carry,                                  # decode state over N = B*S*K rows
    reorder_fn: Callable,                   # (carry, rows [N]) -> carry
    adjacency: jnp.ndarray,                 # [B, S, S, V] {0,1}
    *,
    num_beams: int,
    max_steps: int,
    eos_ids: Sequence[int],
    pad_id: Optional[int] = None,
    implementation: str = "scan",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (beams [B, S, K, max_steps], log_probs [B, S, K]).

    Faithful to ConstrainedBeamSearch.search (utils/cbs.py:54-364,
    ``use_hypo=False``): ``max_steps - 1`` tokens are decoded (the reference
    loops ``max_steps - 2`` times after the first step) and the tail is
    padded with ``eos_ids[0]``; finished rows continue with probability-1
    EOS (log_probs_after_end, :153-156), which also reproduces the
    reference's early-break-then-pad behavior without leaving the traced
    program.

    ``implementation="scan"`` (default) traces the shape-invariant timestep
    body ONCE under ``lax.scan`` with all S target-state selections batched
    into a single ``top_k`` — trace/compile cost is O(1) in ``max_steps``
    instead of O(max_steps × S) unrolled lattice blocks (the before/after
    compile table lives in BENCHMARKS.md).  ``implementation="unrolled"``
    is the straight-line Python loop over the same body, kept for the
    token-identity test (tests/test_fsm.py).
    """
    B, S, _, V = adjacency.shape
    K = num_beams
    N = B * S * K
    eos_ids = tuple(eos_ids)
    pad_tok = eos_ids[0] if pad_id is None else pad_id
    n_steps = max_steps - 1

    adjacency = adjacency.astype(bool)
    eos_arr = jnp.asarray(eos_ids)
    after_end = jnp.full((V,), -jnp.inf, jnp.float32).at[eos_arr].set(0.0)
    # [B, S_to, S_from, V] — the lattice viewed from the target state, so
    # one reshaped top_k serves all S states at once
    adj_t = adjacency.transpose(0, 2, 1, 3)

    # ---- first step: from state 0 only (cbs.py:134-151)
    seqs = jnp.full((B, S, K, n_steps), pad_tok, jnp.int32)
    start = jnp.where(adjacency[:, 0][:, :, :],                # [B, S_to, V]
                      init_logp[:, None, :], -jnp.inf)
    last_logp, tok0 = jax.lax.top_k(start, K)                  # [B, S, K]
    seqs = seqs.at[:, :, :, 0].set(tok0)

    def advance(state, t):
        seqs, last_logp, carry = state
        last_tok = jax.lax.dynamic_index_in_dim(
            seqs, t - 1, axis=3, keepdims=False).reshape(N)
        logp, carry = step_fn(last_tok, carry, t)
        logp = logp.astype(jnp.float32)
        finished = jnp.isin(last_tok, eos_arr)
        cleaned = jnp.where(finished[:, None], after_end[None, :], logp)
        cleaned = cleaned.reshape(B, S, K, V)

        # mask BEFORE adding running scores (cbs.py:221-225), for all S
        # target states in one [B, S_to, S_from, K, V] tensor
        masked = jnp.where(adj_t[:, :, :, None, :], cleaned[:, None], NEG)
        scores = masked + last_logp[:, None, :, :, None]
        flat = scores.reshape(B, S, S * K * V)
        last_logp, idx = jax.lax.top_k(flat, K)                # [B, S, K]
        new_tok = idx % V
        backptr = idx // V                                     # flat (s*K+k)

        # reorder sequences by backpointer, append the new token
        flat_seqs = seqs.reshape(B, S * K, n_steps)
        seqs = jnp.take_along_axis(
            flat_seqs, backptr.reshape(B, S * K)[..., None], axis=1
        ).reshape(B, S, K, n_steps)
        seqs = jax.lax.dynamic_update_slice_in_dim(
            seqs, new_tok[..., None], t, axis=3)
        # reorder the caller's decode carry (KV cache) by global row ids
        rows = (jnp.arange(B)[:, None] * (S * K)
                + backptr.reshape(B, S * K)).reshape(N)
        carry = reorder_fn(carry, rows)
        return (seqs, last_logp, carry), None

    state = (seqs, last_logp, carry)
    if implementation == "scan":
        state, _ = jax.lax.scan(
            advance, state, jnp.arange(1, n_steps, dtype=jnp.int32))
    elif implementation == "unrolled":
        for t in range(1, n_steps):
            state, _ = advance(state, t)
    else:
        raise ValueError(f"unknown implementation: {implementation}")
    seqs, last_logp, carry = state

    beams = jnp.concatenate(
        [seqs, jnp.full((B, S, K, max_steps - n_steps), eos_ids[0],
                        jnp.int32)], axis=-1,
    )
    return beams, last_logp


def select_best_beam_with_constraints(
    beams: jnp.ndarray,                 # [B, S, K, T]
    beam_log_probabilities: jnp.ndarray,  # [B, S, K]
    given_constraints: jnp.ndarray,     # [B] int
    min_constraints_to_satisfy: int,
    eos_ids: Sequence[int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cbs.py:366-431, vectorized: among MAIN states reachable under the
    given constraint count whose popcount meets the requirement, pick the
    top beam with the highest length-normalized log-probability."""
    B, S, K, T = beams.shape
    states = jnp.arange(S)
    pop = jax.vmap(lambda s: jnp.sum(
        (s >> jnp.arange(16)) & 1))(states)                    # popcount [S]
    need = jnp.minimum(given_constraints, min_constraints_to_satisfy)  # [B]
    valid = (
        (states[None, :] < (1 << given_constraints)[:, None])  # reachable
        & (pop[None, :] >= need[:, None])
    )                                                          # [B, S]

    top = beams[:, :, 0, :]                                    # [B, S, T]
    notend = jnp.ones((B, S, T), jnp.int32)
    for e in eos_ids:
        notend = notend * (top != e).astype(jnp.int32)
    length = jnp.sum(notend, axis=-1) + 1                      # [B, S]
    norm_lp = beam_log_probabilities[:, :, 0] / length
    norm_lp = jnp.where(valid, norm_lp, -jnp.inf)
    best_state = jnp.argmax(norm_lp, axis=-1)                  # [B]
    best = jnp.take_along_axis(top, best_state[:, None, None], axis=1)[:, 0]
    best_lp = jnp.take_along_axis(norm_lp, best_state[:, None], axis=1)[:, 0]
    return best, best_lp


def fsm_decode_gpt2(
    model,
    params,
    prompt_ids: jnp.ndarray,            # [B, Lp] right-padded
    prompt_len: jnp.ndarray,            # [B]
    adjacency: jnp.ndarray,             # [B, S, S, V]
    *,
    memory: Optional[jnp.ndarray] = None,
    memory_mask: Optional[jnp.ndarray] = None,
    num_beams: int = 5,
    max_steps: int = 20,
    eos_ids: Sequence[int] = (50256,),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FSM-constrained decoding with the framework's KV-cached GPT-2: the
    prompt is prefilled once over B·S·K expanded rows, then
    :func:`fsm_beam_search` drives single-token cached steps, reordering
    the cache by lattice backpointers each step."""
    from multimodal_context_reasoning_tpu.models.gpt2 import KVCache

    B, Lp = prompt_ids.shape
    S = adjacency.shape[1]
    K = num_beams
    N = B * S * K
    L_total = Lp + max_steps

    rep = lambda x: (jnp.repeat(x, S * K, axis=0) if x is not None else None)
    p_ids, p_len = rep(prompt_ids), rep(prompt_len)
    mem, mem_mask = rep(memory), rep(memory_mask)

    cache = KVCache.zeros(model.config, N, L_total)
    pos = jnp.arange(L_total)[None, :]
    cache_valid = ((pos < p_len[:, None]) | (pos >= Lp)).astype(jnp.float32)
    logits, cache = model.apply(
        params, p_ids, memory=mem, memory_mask=mem_mask,
        cache=cache, cache_index=jnp.int32(0), cache_valid=cache_valid,
        deterministic=True,
    )
    last = jnp.take_along_axis(logits, (p_len - 1)[:, None, None], axis=1)[:, 0]
    init_logp = jax.nn.log_softmax(
        last.reshape(B, S * K, -1)[:, 0].astype(jnp.float32), axis=-1)

    def step_fn(tok, cache, t):
        logits, cache = model.apply(
            params, tok[:, None],
            position_offset=p_len + t - 1,
            memory=mem, memory_mask=mem_mask,
            cache=cache, cache_index=Lp + t - 1, cache_valid=cache_valid,
            deterministic=True,
        )
        return jax.nn.log_softmax(logits[:, 0].astype(jnp.float32), -1), cache

    def reorder_fn(cache, rows):
        return KVCache(cache.k[:, rows], cache.v[:, rows])

    return fsm_beam_search(
        init_logp, step_fn, cache, reorder_fn, adjacency,
        num_beams=K, max_steps=max_steps, eos_ids=eos_ids,
    )
