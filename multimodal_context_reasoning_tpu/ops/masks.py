"""Attention-mask program for the ChunkAlign staged schedule.

The reference builds dense additive masks imperatively, mutating a
``[B, 1, L, L]`` tensor per layer group inside the encoder loop
(modeling_vcr_chunkalign_v10.py:177-206).  Here the whole schedule is a pure
function producing three additive bias tensors — one per stage — computed once
per forward and reused across the layers of each stage.  Everything is
branch-free and static-shape so XLA fuses the bias add into the attention
matmul.

Mask convention follows the reference exactly: additive bias, ``0.0`` for
visible and ``-10000.0`` for masked (``(1.0 - m) * -10000.0``,
modeling_transfomres.py:641).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

NEG_INF = -10000.0


class MaskSpec(NamedTuple):
    """Compact encoding of one stage's attention mask.

    The dense ``[B, 1, L, L]`` stage biases cost O(L²) HBM per example and —
    on the Pallas path — one [BLOCK_Q, L] plane fetch per (batch, head,
    q-block) program.  Every mask in the ChunkAlign schedule is however a
    pure function of three per-token vectors, so the fused kernel
    (ops/pallas_attention.py:fused_attention_spec) rebuilds the bias on the
    VPU from O(L) inputs instead:

    - ``valid``  [B, L]: real-token mask over the joint text‖image stream
      (column visibility);
    - ``gi``     [B, L]: phrase-chunk id per text position, -1 outside
      chunks and everywhere in the image block;
    - ``rowfull``[B, L]: all-visible rows — CLS (position 0) and the final
      real text position (the builder's row-only rule,
      utils/GetChunk_v4_vcr.py:112,141).

    ``stage`` ("chunk" | "full" | "cross") and ``text_len`` are static.
    """

    stage: str
    valid: jnp.ndarray
    gi: jnp.ndarray
    rowfull: jnp.ndarray
    text_len: int


def stage_mask_specs(
    text_mask: jnp.ndarray,     # [B, T]
    img_mask: jnp.ndarray,      # [B, I]
    gather_index: jnp.ndarray,  # [B, T] chunk ids, -1 outside
):
    """(spec_chunk, spec_full, spec_cross) — vector form of
    :func:`build_stage_biases` for gather-index-derived chunk masks.
    Parity with the dense biases is asserted in tests/test_pallas.py."""
    B, T = text_mask.shape
    I = img_mask.shape[1]
    valid = jnp.concatenate(
        [text_mask.astype(jnp.float32), img_mask.astype(jnp.float32)], axis=-1
    )
    gi = jnp.concatenate(
        [gather_index.astype(jnp.int32),
         jnp.full((B, I), -1, jnp.int32)], axis=-1
    )
    pos = jnp.arange(T, dtype=jnp.int32)[None]
    lengths = jnp.sum(text_mask.astype(jnp.int32), axis=1)
    row_t = ((pos == 0) | (pos == (lengths - 1)[:, None]))
    rowfull = jnp.concatenate(
        [row_t.astype(jnp.float32), jnp.zeros((B, I), jnp.float32)], axis=-1
    )
    return (
        MaskSpec("chunk", valid, gi, rowfull, T),
        MaskSpec("full", valid, gi, rowfull, T),
        MaskSpec("cross", valid, gi, rowfull, T),
    )


def padding_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[B, L] {0,1} keep-mask -> [B, 1, 1, L] additive bias.

    Reference: modeling_transfomres.py:628-641 (extended_attention_mask).
    """
    return ((1.0 - mask.astype(dtype)) * NEG_INF)[:, None, None, :]


def build_stage_biases(
    text_mask: jnp.ndarray,   # [B, T] {0,1} real-token mask (CLS..SEP + pad)
    img_mask: jnp.ndarray,    # [B, I] {0,1} real-region mask
    chunk_mask: jnp.ndarray,  # [B, T, T] {0,1} phrase-chunk block mask
    dtype=jnp.float32,
):
    """Build the three stage biases of the ChunkAlign schedule.

    Returns ``(bias_chunk, bias_full, bias_cross)``, each ``[B, 1, L, L]``
    (bias_full is ``[B, 1, 1, L]``, broadcastable), ``L = T + I``:

    - **bias_chunk** (layers 0..2): text rows see chunk-internal text and all
      real image regions; image rows see only real image regions (no text).
      Reference: v10.py:177-183 — the base mask is the padded-column mask
      repeated over rows, the text-text block is overwritten with the chunk
      mask, and image→text is hard-masked.
    - **bias_full** (layers 3..8): plain padding mask, everything real is
      mutually visible.  Reference: v10.py:190-191.
    - **bias_cross** (layers 9..11): text rows as in stage one; image rows see
      *only themselves* (identity over the image block — including padded
      regions, matching the reference's unconditional ``torch.eye``).
      Reference: v10.py:196-206.
    """
    B, T = text_mask.shape
    I = img_mask.shape[1]
    text_mask = text_mask.astype(dtype)
    img_mask = img_mask.astype(dtype)
    chunk_mask = chunk_mask.astype(dtype)

    img_col = ((1.0 - img_mask) * NEG_INF)[:, None, :]          # [B, 1, I]
    chunk_bias = (1.0 - chunk_mask) * NEG_INF                    # [B, T, T]

    # Text rows: [B, T, T+I] = [chunk-internal | image-visible-if-real]
    text_rows = jnp.concatenate(
        [chunk_bias, jnp.broadcast_to(img_col, (B, T, I))], axis=-1
    )

    # Stage-one image rows: text hard-masked, real image visible.
    img_rows_chunk = jnp.concatenate(
        [jnp.full((B, I, T), NEG_INF, dtype), jnp.broadcast_to(img_col, (B, I, I))],
        axis=-1,
    )
    bias_chunk = jnp.concatenate([text_rows, img_rows_chunk], axis=1)[:, None]

    # Stage-two: broadcastable padded-column bias.
    full_mask = jnp.concatenate([text_mask, img_mask], axis=-1)  # [B, L]
    bias_full = ((1.0 - full_mask) * NEG_INF)[:, None, None, :]

    # Stage-three image rows: identity over the image block regardless of
    # padding (reference builds torch.eye(img_len) unconditionally, v10.py:199).
    eye_bias = (1.0 - jnp.eye(I, dtype=dtype)) * NEG_INF          # [I, I]
    img_rows_cross = jnp.concatenate(
        [jnp.full((B, I, T), NEG_INF, dtype),
         jnp.broadcast_to(eye_bias[None], (B, I, I))],
        axis=-1,
    )
    bias_cross = jnp.concatenate([text_rows, img_rows_cross], axis=1)[:, None]

    return bias_chunk, bias_full, bias_cross
