"""Unified generation front-end.

Capability parity with the legacy caption engine's ``generate`` dispatcher
(modeling/modeling_utils.py:44-242: greedy / sampling / beam branches plus
the ``use_cbs`` FSM-constrained branch, :126-147) over the framework's
jitted decoders.

``generate`` compiles the selected decoder into ONE XLA program (jax.jit
with the shape-static knobs marked static; the flax module is a hashable
static arg, so the compilation caches across calls).  Calling the
underlying ``greedy_decode``/``sample_decode``/... directly instead runs
them eagerly — one device dispatch per op, which on a tunneled TPU turns a
~350 ms decode into ~6 s.  Use ``generate`` (or wrap in jax.jit yourself).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from multimodal_context_reasoning_tpu.generation.beam import (
    constrained_beam_sample,
)
from multimodal_context_reasoning_tpu.generation.decode import (
    greedy_decode,
    sample_decode,
)
from multimodal_context_reasoning_tpu.models.gpt2 import GPT2Decoder

# Jitted entry per decoder: arg 0 (the flax module) and every knob that
# changes the traced program are static; compiled programs cache on
# (module, static knobs, input shapes).
_greedy = jax.jit(
    greedy_decode, static_argnums=(0,),
    static_argnames=("max_len", "eos_id", "pad_id"),
)
_sample = jax.jit(
    sample_decode, static_argnums=(0,),
    # temperature/top_p are TRACED scalars (they only enter as values;
    # distinct floats reuse one compiled program); top_k stays static —
    # it changes the program shape (the kth-logit gather in
    # top_k_top_p_filter) — and use_top_p is the static on/off gate so
    # top_p=1.0 pays no per-step vocab sort (recompile only on toggle).
    static_argnames=("max_len", "eos_id", "pad_id", "top_k", "use_top_p"),
)
_beam = jax.jit(
    constrained_beam_sample, static_argnums=(0,),
    static_argnames=("num_beams", "max_steps", "eos_id", "pad_id",
                     "constraint_factor", "repetition_penalty", "top_k",
                     "length_penalty"),
)


def _cbs(model, params, prompt_ids, prompt_len, adjacency, *,
         memory, memory_mask, num_beams, max_steps, eos_ids):
    from multimodal_context_reasoning_tpu.generation.fsm import (
        fsm_decode_gpt2,
    )

    return fsm_decode_gpt2(
        model, params, prompt_ids, prompt_len, adjacency,
        memory=memory, memory_mask=memory_mask,
        num_beams=num_beams, max_steps=max_steps, eos_ids=eos_ids,
    )


_cbs_jit = jax.jit(
    _cbs, static_argnums=(0,),
    static_argnames=("num_beams", "max_steps", "eos_ids"),
)


def _cbs_select(beams, logp, num_constraints, min_satisfy, eos_id):
    from multimodal_context_reasoning_tpu.generation.fsm import (
        select_best_beam_with_constraints,
    )

    tokens, _ = select_best_beam_with_constraints(
        beams, logp, num_constraints, min_satisfy, (eos_id,)
    )
    # length convention shared with decode.py: count up to AND INCLUDING
    # the first eos (the lattice pads the tail with eos, so this equals the
    # other modes' active-step count; a beam that never emitted eos keeps
    # max_len)
    T = tokens.shape[-1]
    before = jnp.sum(
        jnp.cumprod((tokens != eos_id).astype(jnp.int32), axis=-1), axis=-1
    )
    lengths = jnp.minimum(before + 1, T)
    return tokens, lengths


_cbs_select_jit = jax.jit(
    _cbs_select, static_argnames=("min_satisfy", "eos_id")
)


def generate(
    model: GPT2Decoder,
    params,
    prompt_ids: jnp.ndarray,
    prompt_len: jnp.ndarray,
    *,
    mode: str = "greedy",            # greedy | sample | beam | cbs
    memory: Optional[jnp.ndarray] = None,
    memory_mask: Optional[jnp.ndarray] = None,
    max_len: int = 50,
    eos_id: int = 50256,
    pad_id: int = 0,
    rng: Optional[jax.Array] = None,
    # sampling
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    # beam
    num_beams: int = 5,
    constraint_mask: Optional[jnp.ndarray] = None,
    constraint_factor: float = 0.8,
    repetition_penalty: float = 1.0,
    length_penalty: float = 1.0,
    # cbs (FSM lattice, generation/fsm.py — utils/cbs.py flavor)
    fsm_adjacency: Optional[jnp.ndarray] = None,   # [B, S, S, V]
    num_constraints: Optional[jnp.ndarray] = None,  # [B] int
    min_constraints_to_satisfy: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (tokens [B, max_len], lengths [B])."""
    common = dict(
        memory=memory, memory_mask=memory_mask,
        max_len=max_len, eos_id=eos_id, pad_id=pad_id,
    )
    if mode == "greedy":
        return _greedy(model, params, prompt_ids, prompt_len, **common)
    if mode == "sample":
        if rng is None:
            raise ValueError("mode='sample' requires rng")
        # the static filter gate needs a host-side truth value; when the
        # caller wrapped generate() in an outer jit and traced top_p, the
        # value is unknowable — run the filter (the pre-gate behavior)
        use_top_p = (
            True if isinstance(top_p, jax.core.Tracer)
            else bool(top_p < 1.0)
        )
        return _sample(
            model, params, prompt_ids, prompt_len, rng=rng,
            temperature=temperature, top_k=top_k, top_p=top_p,
            use_top_p=use_top_p, **common,
        )
    if mode == "beam":
        if rng is None:
            raise ValueError("mode='beam' requires rng (beam *sampling*)")
        common.pop("max_len")
        return _beam(
            model, params, prompt_ids, prompt_len, rng=rng,
            num_beams=num_beams, max_steps=max_len,
            constraint_mask=constraint_mask,
            constraint_factor=constraint_factor,
            repetition_penalty=repetition_penalty, top_k=top_k or 50,
            length_penalty=length_penalty, **common,
        )
    if mode == "cbs":
        # the reference's use_cbs branch (modeling_bert.py:1018-1034:
        # ConstrainedBeamSearch.search over the FSM lattice, then
        # select_best_beam_with_constraints picks the top
        # length-normalized beam among constraint-satisfying states)
        if fsm_adjacency is None:
            raise ValueError(
                "mode='cbs' requires fsm_adjacency "
                "(generation.fsm.FiniteStateMachineBuilder.build)"
            )
        if num_constraints is None:
            raise ValueError(
                "mode='cbs' requires num_constraints ([B] ints — the "
                "reference passes it alongside fsm, modeling_bert.py:1028)"
            )
        beams, logp = _cbs_jit(
            model, params, prompt_ids, prompt_len, fsm_adjacency,
            memory=memory, memory_mask=memory_mask,
            num_beams=num_beams, max_steps=max_len, eos_ids=(eos_id,),
        )
        return _cbs_select_jit(
            beams, logp, jnp.asarray(num_constraints, jnp.int32),
            min_satisfy=min_constraints_to_satisfy, eos_id=eos_id,
        )
    raise ValueError(f"unknown mode {mode!r}")
