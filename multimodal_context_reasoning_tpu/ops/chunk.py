"""Vectorized chunk-mean query rewrite.

The reference's hottest host-sync loop (modeling_vcr_chunkalign_v10.py:66-78)
iterates over the batch in Python, `index_add`-ing token queries into chunk
buckets and gathering the bucket means back to token positions so every text
token's attention *query* becomes its phrase-chunk mean.

TPU-native formulation: the scatter/gather pair is two small matmuls against a
one-hot chunk-assignment matrix — MXU work, fully batched, no host sync:

    M      = onehot(gather_index)          # [B, T, C]
    mean_c = (Mᵀ q) / (Mᵀ 1)               # [B, C, D]
    q'     = M mean_c  (where assigned)     # [B, T, D]

``gather_index[b, t]`` is the chunk id of text position ``t`` (0-based over
the *full* text stream including CLS), or ``-1`` for positions not covered by
any chunk (CLS, trailing SEP, padding).  This differs from the reference's
per-example ragged ``gather_index`` (which covers positions 1..sent_len) only
in encoding; semantics are identical and positions with id ``-1`` keep their
original query (the reference loop never touches position 0 or positions past
``sent_len``).
"""

from __future__ import annotations

import jax.numpy as jnp


def chunk_mean_scatter(
    x: jnp.ndarray,             # [B, T, D] per-token vectors (queries)
    gather_index: jnp.ndarray,  # [B, T] int32 chunk ids, -1 = not in a chunk
    num_chunks: int,
) -> jnp.ndarray:
    """Replace each in-chunk token vector with its chunk mean.

    Tokens with ``gather_index < 0`` are returned unchanged.
    """
    assigned = gather_index >= 0                                  # [B, T]
    # One-hot over chunk ids; -1 rows become all-zero.
    onehot = (
        (gather_index[..., None] == jnp.arange(num_chunks, dtype=gather_index.dtype))
        & assigned[..., None]
    ).astype(x.dtype)                                             # [B, T, C]

    counts = jnp.sum(onehot, axis=1)                              # [B, C]
    sums = jnp.einsum("btc,btd->bcd", onehot, x)                  # [B, C, D]
    means = sums / jnp.maximum(counts, 1.0)[..., None]            # [B, C, D]
    gathered = jnp.einsum("btc,bcd->btd", onehot, means)          # [B, T, D]
    return jnp.where(assigned[..., None], gathered, x)


def chunk_mask_from_gather_index(
    gather_index: jnp.ndarray,  # [B, T] int32 chunk ids, -1 outside chunks
    text_mask: jnp.ndarray,     # [B, T] {0,1} real-token mask
) -> jnp.ndarray:
    """Build the [B, T, T] chunk-block attention mask from chunk assignments.

    Reproduces the offline builder's exact structure
    (utils/GetChunk_v4_vcr.py:104-148):

    - tokens in the same chunk see each other (symmetric blocks);
    - every real token sees itself (``torch.eye`` base);
    - the CLS **row** (position 0) and the final-SEP **row** (last real
      position) are all-visible — *rows only*: the builder sets
      ``total_mask[0, :] = 1`` and ``total_mask[len-1, :] = 1`` but never
      the columns, so interior tokens do NOT see CLS/SEP in the chunk
      stages;
    - tokens outside any chunk (the builder's O-singletons; our ``-1``)
      see only themselves.

    This lets the data pipeline ship only ``gather_index`` and synthesize
    the dense mask on device instead of storing [T, T] pickles per
    candidate.
    """
    B, T = gather_index.shape
    same_chunk = (
        (gather_index[:, :, None] == gather_index[:, None, :])
        & (gather_index[:, :, None] >= 0)
    )
    eye = jnp.eye(T, dtype=bool)[None]
    pos = jnp.arange(T)[None, :]
    lengths = jnp.sum(text_mask > 0, axis=1)                     # [B]
    cls_or_sep = (pos == 0) | (pos == (lengths - 1)[:, None])    # [B, T]
    full_rows = cls_or_sep[:, :, None]                            # rows only
    real = (text_mask[:, :, None] > 0) & (text_mask[:, None, :] > 0)
    return ((same_chunk | full_rows | eye) & real).astype(jnp.float32)
