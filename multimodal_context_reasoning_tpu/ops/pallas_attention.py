"""Fused attention kernel (Pallas/TPU) for the ModCR sequence regime.

ModCR attends over short streams — ≤140 text + ≤50 region tokens
(SURVEY.md §5: no long-context machinery exists or is needed).  At these
lengths the whole K/V block of one (batch·head) fits comfortably in VMEM
(L≤256, Dh≤64 → 64 KB per operand), so instead of a streaming
flash-attention with online softmax we run a *single-pass* fused kernel:

    out[q_blk] = softmax(q_blk · Kᵀ · scale + bias) · V

One HBM read per operand, no [L, L] score matrix ever leaves VMEM, softmax
in fp32 on the VPU, both matmuls on the MXU.  Replaces the reference's
eager chain (modeling_vcr_chunkalign_v10.py:83-100: matmul → add mask →
softmax → dropout → matmul, each materialized in HBM by torch).

Bias handling: the additive bias carries everything — padding, the staged
ChunkAlign schedule, prefix slots (ops/masks.py).  It is shared across
heads, so the kernel grid is (B, H, q-blocks) and the bias BlockSpec maps
on the *batch* coordinate only: each [Lq, Lk] bias plane is fetched once
per batch, never duplicated per head (a per-head broadcast would add H×
HBM traffic and makes the kernel lose to XLA's own fusion).

Measured on TPU v5e (full ModCR forward, 32 candidate rows, bf16): see
ops/PALLAS_NOTES.md for the running comparison against the XLA einsum
path that guides the `use_pallas` default.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too (needed for interpret-mode tests)
    from jax.experimental.pallas import tpu as pltpu

    _MEMORY_SPACE = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _MEMORY_SPACE = None

BLOCK_Q = 128
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    """One (batch, head, q-block) tile: fused QKᵀ + bias + softmax + PV."""
    q = q_ref[0, 0]                                # [BQ, Dh]
    k = k_ref[0, 0]                                # [Lk, Dh]
    v = v_ref[0, 0]                                # [Lk, Dh]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                      # [BQ, Lk] fp32
    s = s + bias_ref[0].astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom
    o_ref[0, 0] = jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(
    q: jnp.ndarray,            # [B, Lq, H, Dh]
    k: jnp.ndarray,            # [B, Lk, H, Dh]
    v: jnp.ndarray,            # [B, Lk, H, Dh]
    bias: jnp.ndarray,         # [B or 1, 1, Lq or 1, Lk] additive
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns [B, Lq, H, Dh]; numerics match ops.attention
    (1/sqrt(Dh) scale, fp32 softmax).  ``bias`` must be head-shared
    (dim 1 == 1) — true for every mask in this framework."""
    B, Lq, H, Dh = q.shape
    Lk = k.shape[1]
    scale = 1.0 / (Dh ** 0.5)

    Lqp = _round_up(Lq, BLOCK_Q)
    Lkp = _round_up(Lk, LANE)
    Dhp = _round_up(Dh, LANE)

    if bias.shape[1] != 1:
        raise ValueError("fused_attention requires head-shared bias")
    # materialize per-batch [Lq, Lk] planes once (no head broadcast)
    bias = jnp.broadcast_to(bias[:, 0], (B, Lq, Lk)).astype(jnp.float32)

    # [B, L, H, D] → [B, H, L, D]: the head dim cannot tile in the minor-two
    # positions (Mosaic block constraint), so heads become a grid/major dim.
    qp = jnp.pad(q, ((0, 0), (0, Lqp - Lq), (0, 0), (0, Dhp - Dh))).transpose(0, 2, 1, 3)
    kp = jnp.pad(k, ((0, 0), (0, Lkp - Lk), (0, 0), (0, Dhp - Dh))).transpose(0, 2, 1, 3)
    vp = jnp.pad(v, ((0, 0), (0, Lkp - Lk), (0, 0), (0, Dhp - Dh))).transpose(0, 2, 1, 3)
    bp = jnp.pad(
        bias, ((0, 0), (0, Lqp - Lq), (0, Lkp - Lk)), constant_values=-1e9
    )

    n_q = Lqp // BLOCK_Q
    grid = (B, H, n_q)
    kwargs = dict(memory_space=_MEMORY_SPACE) if _MEMORY_SPACE else {}

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, H, Lqp, Dhp), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, BLOCK_Q, Dhp), lambda b, h, i: (b, h, i, 0), **kwargs),
            pl.BlockSpec((1, 1, Lkp, Dhp), lambda b, h, i: (b, h, 0, 0), **kwargs),
            pl.BlockSpec((1, 1, Lkp, Dhp), lambda b, h, i: (b, h, 0, 0), **kwargs),
            # bias indexed on batch only — one [Lq, Lk] plane per batch,
            # shared by all H head programs (no broadcast in HBM)
            pl.BlockSpec((1, BLOCK_Q, Lkp), lambda b, h, i: (b, i, 0), **kwargs),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, BLOCK_Q, Dhp), lambda b, h, i: (b, h, i, 0), **kwargs
        ),
        interpret=interpret,
    )(qp, kp, vp, bp)

    return out.transpose(0, 2, 1, 3)[:, :Lq, :, :Dh]


def _spec_kernel(q_ref, k_ref, v_ref, validk_ref, gik_ref, giq_ref, rowq_ref,
                 o_ref, *, scale: float, stage: str, text_len: int):
    """One (batch, head) tile over the FULL sequence with the stage mask
    computed on the VPU from O(L) per-token vectors — neither a [Lq, Lk]
    bias plane nor padded Q/K/V copies ever touch HBM (blocks use the real
    array dims; Mosaic pads to hardware tiles inside VMEM only).  Mask
    semantics bit-match ops/masks.py:build_stage_biases (asserted in
    tests/test_pallas.py)."""
    q_all = q_ref[0]                               # [H, Lq, Dh]
    k_all = k_ref[0]                               # [H, Lk, Dh]
    v_all = v_ref[0]
    n_heads, lq, _ = q_all.shape
    lk = k_all.shape[1]
    posq = jax.lax.broadcasted_iota(jnp.int32, (lq, 1), 0)
    posk = jax.lax.broadcasted_iota(jnp.int32, (1, lk), 1)
    # All mask algebra runs in f32 on the VPU (Mosaic cannot lower wide
    # boolean selects — i8→i1 truncation is unsupported), with OR as
    # saturating add and the final mask applied additively.
    validf = validk_ref[0].astype(jnp.float32)     # [1, Lk] {0,1}

    if stage == "full":
        visf = jnp.broadcast_to(validf, (lq, lk))
    else:
        gik = gik_ref[0]                           # [1, Lk]
        giq = giq_ref[0].reshape(lq, 1)            # [Lq, 1]
        rowqf = rowq_ref[0].reshape(lq, 1).astype(jnp.float32)
        imgkf = (posk >= text_len).astype(jnp.float32)
        imgqf = (posq >= text_len).astype(jnp.float32)
        samef = ((giq == gik) & (giq >= 0)).astype(jnp.float32)
        eyef = (posq == posk).astype(jnp.float32)
        text_in = jnp.minimum(samef + eyef + rowqf, 1.0)
        text_rows = ((1.0 - imgkf) * text_in + imgkf) * validf
        if stage == "chunk":
            img_rows = imgkf * validf
        else:  # cross: image rows see only themselves, padding included
            img_rows = eyef
        visf = imgqf * img_rows + (1.0 - imgqf) * text_rows

    neg = (1.0 - visf) * 1e9                       # one mask for all heads
    for h in range(n_heads):                       # unrolled: H 2-D matmuls
        s = jax.lax.dot_general(
            q_all[h], k_all[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale - neg                            # [Lq, Lk] fp32
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, h] = jnp.dot(
            p.astype(v_all.dtype), v_all[h],
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("stage", "text_len", "interpret")
)
def fused_attention_spec(
    q: jnp.ndarray,            # [B, Lq, H, Dh]
    k: jnp.ndarray,            # [B, Lk, H, Dh]  (Lk may exceed Lq: prefix)
    v: jnp.ndarray,
    valid: jnp.ndarray,        # [B, Lk] {0,1}
    gi: jnp.ndarray,           # [B, Lk] int32 (-1 outside chunks)
    rowfull: jnp.ndarray,      # [B, Lk] {0,1}
    *,
    stage: str,
    text_len: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention with the stage mask computed in-kernel.

    vs the dense-bias kernel: HBM mask traffic per program drops from one
    [BLOCK_Q, Lk] fp32 plane to three [Lk] vectors; vs both earlier kernel
    revisions: NO host-side padding — blocks span the real (Lq, Dh) array
    dims so no 2× padded Q/K/V copies are materialized in HBM; one program
    owns a whole batch element (all heads), K/V are fetched exactly once
    and the mask is computed once and reused across heads.  (A native
    [B, L, H, Dh] layout without the surrounding transposes does not lower:
    Mosaic rejects the strided per-head slice — "unsupported shape cast".)"""
    B, Lq, H, Dh = q.shape
    Lk = k.shape[1]
    scale = 1.0 / (Dh ** 0.5)

    qp = q.transpose(0, 2, 1, 3)
    kp = k.transpose(0, 2, 1, 3)
    vp = v.transpose(0, 2, 1, 3)
    validp = valid.astype(jnp.float32)[:, None]    # [B, 1, Lk]
    gip = gi.astype(jnp.int32)[:, None]
    giq = gi.astype(jnp.int32)[:, :Lq][:, None]    # q-side slice
    rowq = rowfull.astype(jnp.float32)[:, :Lq][:, None]

    grid = (B,)
    kwargs = dict(memory_space=_MEMORY_SPACE) if _MEMORY_SPACE else {}

    out = pl.pallas_call(
        functools.partial(
            _spec_kernel, scale=scale, stage=stage, text_len=text_len,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Lq, Dh), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, Lq, Dh), lambda b: (b, 0, 0, 0), **kwargs),
            pl.BlockSpec((1, H, Lk, Dh), lambda b: (b, 0, 0, 0), **kwargs),
            pl.BlockSpec((1, H, Lk, Dh), lambda b: (b, 0, 0, 0), **kwargs),
            pl.BlockSpec((1, 1, Lk), lambda b: (b, 0, 0), **kwargs),
            pl.BlockSpec((1, 1, Lk), lambda b: (b, 0, 0), **kwargs),
            pl.BlockSpec((1, 1, Lq), lambda b: (b, 0, 0), **kwargs),
            pl.BlockSpec((1, 1, Lq), lambda b: (b, 0, 0), **kwargs),
        ],
        out_specs=pl.BlockSpec(
            (1, H, Lq, Dh), lambda b: (b, 0, 0, 0), **kwargs
        ),
        interpret=interpret,
    )(qp, kp, vp, validp, gip, giq, rowq)

    return out.transpose(0, 2, 1, 3)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    *,
    use_pallas: bool = True,
    interpret: bool = False,
):
    """Dispatch: fused Pallas kernel on TPU, einsum fallback elsewhere,
    when attention probabilities are required, or when the bias is
    per-head (never the case in this framework's masks)."""
    head_shared = bias is None or bias.shape[1] == 1
    if use_pallas and head_shared and (interpret or jax.default_backend() != "cpu"):
        b = bias
        if b is None:
            b = jnp.zeros((1, 1, 1, k.shape[1]), jnp.float32)
        return fused_attention(q, k, v, b, interpret=interpret)
    from multimodal_context_reasoning_tpu.ops.attention import (
        dot_product_attention,
    )

    out, _ = dot_product_attention(q, k, v, bias)
    return out
