"""Multi-head attention core shared by every encoder in the framework.

One implementation serves the Oscar global encoder, the ChunkAlign sequence
encoder, the prefix-RoBERTa reasoner, and GPT-2 cross-attention; the
callers differ only in how they produce q/k/v and the additive bias.

Two execution paths:

- ``dot_product_attention``: plain jnp einsum formulation. XLA already fuses
  the bias add and softmax into the matmuls; this is the fallback and the
  path used whenever attention probabilities must be returned (alignment
  loss, constraint extraction).
- A fused Pallas kernel (ops/pallas_attention.py) for the hot no-probs path
  on TPU, selected by the caller via ``use_pallas``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def dot_product_attention(
    q: jnp.ndarray,            # [B, Lq, H, Dh]
    k: jnp.ndarray,            # [B, Lk, H, Dh]
    v: jnp.ndarray,            # [B, Lk, H, Dh]
    bias: Optional[jnp.ndarray] = None,   # broadcastable to [B, H, Lq, Lk]
    *,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    return_probs: bool = False,
    probs_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Scaled dot-product attention with additive bias.

    Matches the reference numerics (modeling_vcr_chunkalign_v10.py:83-100):
    scores scaled by 1/sqrt(head_dim), bias added pre-softmax, softmax in
    fp32, dropout on the probabilities.
    """
    head_dim = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, dtype=jnp.float32))
    # [B, H, Lq, Lk]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(probs_dtype) * scale
    if bias is not None:
        scores = scores + bias.astype(probs_dtype)
    probs = jax.nn.softmax(scores, axis=-1)

    attn = probs
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        attn = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)

    out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(v.dtype), v)
    return out, (probs if return_probs else None)
