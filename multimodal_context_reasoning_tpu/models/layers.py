"""Shared transformer building blocks (Flax linen).

One layer implementation serves all four model families in the framework
(Oscar global encoder, ChunkAlign sequence encoder, prefix-RoBERTa, and the
CALeC fusion stack), parameterised by the features the reference implements
as separate near-duplicate classes:

- ``prefix_kv``: extra hidden vectors prepended to the key/value stream only
  (queries stay on real tokens).  This is the vendored BERT's
  ``history_state`` mechanism (a_transformers/modeling_bert.py
  BertSelfAttention: ``x_states = cat([history_state, hidden]); key/value
  from x_states, query from hidden``) and the reconstruction of the missing
  prefix-RoBERTa blob's ``prompt_embeddings=`` contract
  (modeling_ensemble.py:501-502).
- ``chunk_query_index``: chunk-mean query rewrite in cross-modal layers
  (modeling_vcr_chunkalign_v10.py:66-78), vectorised in ops/chunk.py.
- ``return_probs``: surfaces attention probabilities for the alignment loss
  (v10.py:981-987) and beam-constraint extraction (v10.py:2107-2133).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_context_reasoning_tpu.core.config import EncoderConfig
from multimodal_context_reasoning_tpu.ops.attention import dot_product_attention
from multimodal_context_reasoning_tpu.ops.chunk import chunk_mean_scatter
from multimodal_context_reasoning_tpu.ops.masks import MaskSpec

ACT = {
    "gelu": nn.gelu,
    "relu": nn.relu,
    "tanh": nn.tanh,
    # HF "gelu_new" == tanh-approximated gelu
    "gelu_new": lambda x: nn.gelu(x, approximate=True),
}


def _dense(c: EncoderConfig, features: int, name: str):
    """nn.Dense, or its param-compatible int8 twin when c.quantize="int8"
    (ops/quant.py — dynamic W8A8, 2× MXU peak on v5e, inference-only)."""
    if c.quantize == "int8":
        from multimodal_context_reasoning_tpu.ops.quant import QuantDense

        return QuantDense(features, dtype=c.jnp_dtype, name=name)
    return nn.Dense(features, dtype=c.jnp_dtype, name=name)


class BertEmbeddings(nn.Module):
    """Word + position + token-type embeddings, LayerNorm, dropout.

    Reference semantics: a_transformers/modeling_bert.py:166-210.  RoBERTa's
    position-id offset (positions start at pad_token_id+1 and skip padding)
    is handled by the caller passing explicit ``position_ids``.
    """

    config: EncoderConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,                 # [B, T] int32
        token_type_ids: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        c = self.config
        B, T = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros((B, T), dtype=jnp.int32)
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))

        init = nn.initializers.normal(stddev=c.initializer_range)
        dt = c.jnp_dtype
        word = nn.Embed(c.vocab_size, c.hidden_size, embedding_init=init,
                        dtype=dt, name="word_embeddings")(input_ids)
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size, embedding_init=init,
                       dtype=dt, name="position_embeddings")(position_ids)
        typ = nn.Embed(c.type_vocab_size, c.hidden_size, embedding_init=init,
                       dtype=dt, name="token_type_embeddings")(token_type_ids)
        x = word + typ + pos
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=dt, name="layer_norm")(x)
        x = nn.Dropout(c.hidden_dropout_prob)(x, deterministic=deterministic)
        return x


class SelfAttention(nn.Module):
    """Post-LN BERT self-attention with prefix-KV and chunk-mean-query hooks."""

    config: EncoderConfig

    @nn.compact
    def __call__(
        self,
        hidden: jnp.ndarray,                       # [B, L, D]
        bias: Optional[jnp.ndarray],               # broadcastable [B, H, L, P+L]
        *,
        prefix_kv: Optional[jnp.ndarray] = None,   # [B, P, D] raw hidden vectors
        chunk_query_index: Optional[jnp.ndarray] = None,  # [B, L] ids, -1 = keep
        num_chunks: int = 0,
        mask_spec: Optional[MaskSpec] = None,      # compact mask (pallas path)
        deterministic: bool = True,
        return_probs: bool = False,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        c = self.config
        H, Dh = c.num_attention_heads, c.head_dim

        dt = c.jnp_dtype
        q = _dense(c, c.hidden_size, "query")(hidden)
        kv_src = hidden
        if prefix_kv is not None:
            # KV-prepend of raw prefix states, projected through this layer's
            # own K/V weights — the history_state mechanism.
            kv_src = jnp.concatenate([prefix_kv.astype(hidden.dtype), hidden], axis=1)
        k = _dense(c, c.hidden_size, "key")(kv_src)
        v = _dense(c, c.hidden_size, "value")(kv_src)

        if chunk_query_index is not None:
            # Chunk-mean query rewrite (applied to the projected queries,
            # before head split — matching v10.py:66-78 which averages
            # mixed_query_layer).
            q = chunk_mean_scatter(q, chunk_query_index, num_chunks)

        B, L, _ = hidden.shape
        Lk = kv_src.shape[1]
        q = q.reshape(B, L, H, Dh)
        k = k.reshape(B, Lk, H, Dh)
        v = v.reshape(B, Lk, H, Dh)

        needs_dropout = not deterministic and c.attention_probs_dropout_prob > 0.0
        if (c.use_pallas and mask_spec is not None and not return_probs
                and not needs_dropout and jax.default_backend() != "cpu"):
            # Fully fused kernel: the stage mask is rebuilt on the VPU from
            # O(L) vectors — neither the [L, L] bias nor the [L, L] scores
            # ever touch HBM (ops/pallas_attention.py:fused_attention_spec).
            # Any dense `bias` also passed is dead code XLA eliminates.
            from multimodal_context_reasoning_tpu.ops.pallas_attention import (
                fused_attention_spec,
            )

            out = fused_attention_spec(
                q, k, v, mask_spec.valid, mask_spec.gi, mask_spec.rowfull,
                stage=mask_spec.stage, text_len=mask_spec.text_len,
            )
            probs = None
        elif c.use_pallas and not return_probs and not needs_dropout:
            # Fused Pallas kernel (dense bias): no [L, L] scores in HBM.
            # Falls back to the einsum path automatically on CPU
            # (ops/pallas_attention.py).
            from multimodal_context_reasoning_tpu.ops.pallas_attention import (
                attention as fused,
            )

            out = fused(q, k, v, bias)
            probs = None
        elif c.mem_efficient_attention and not return_probs:
            # Flash-style recompute-in-backward (ops/flash.py): identical
            # forward numerics (same einsum/softmax/bernoulli sequence and
            # rng draw), but the [B, H, Lq, Lk] fp32 temporaries are not
            # training residuals — they are recomputed per layer in the
            # backward. Unlocks batch ≥48 on a 16 GB v5e.
            from multimodal_context_reasoning_tpu.ops.flash import (
                mem_efficient_attention,
            )

            rng = self.make_rng("dropout") if needs_dropout else None
            out = mem_efficient_attention(
                q, k, v, bias,
                dropout_rate=c.attention_probs_dropout_prob,
                dropout_rng=rng,
                deterministic=deterministic,
            )
            probs = None
        else:
            rng = self.make_rng("dropout") if needs_dropout else None
            out, probs = dot_product_attention(
                q, k, v, bias,
                dropout_rate=c.attention_probs_dropout_prob,
                dropout_rng=rng,
                deterministic=deterministic,
                return_probs=return_probs,
            )
        out = out.reshape(B, L, c.hidden_size)

        # BertSelfOutput: dense + dropout + residual + LN.
        out = _dense(c, c.hidden_size, "out")(out)
        out = nn.Dropout(c.hidden_dropout_prob)(out, deterministic=deterministic)
        out = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=dt,
                           name="out_layer_norm")(out + hidden)
        return out, probs


class FeedForward(nn.Module):
    """BertIntermediate + BertOutput: dense-act-dense, dropout, residual, LN."""

    config: EncoderConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        c = self.config
        dt = c.jnp_dtype
        h = _dense(c, c.intermediate_size, "intermediate")(x)
        h = ACT[c.hidden_act](h)
        h = _dense(c, c.hidden_size, "output")(h)
        h = nn.Dropout(c.hidden_dropout_prob)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=dt,
                            name="output_layer_norm")(h + x)


class TransformerLayer(nn.Module):
    """One post-LN encoder layer (CaptionBertLayer, v10.py:129-150)."""

    config: EncoderConfig

    @nn.compact
    def __call__(
        self,
        hidden: jnp.ndarray,
        bias: Optional[jnp.ndarray],
        *,
        prefix_kv: Optional[jnp.ndarray] = None,
        chunk_query_index: Optional[jnp.ndarray] = None,
        num_chunks: int = 0,
        mask_spec: Optional[MaskSpec] = None,
        deterministic: bool = True,
        return_probs: bool = False,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        attn_out, probs = SelfAttention(self.config, name="attention")(
            hidden, bias,
            prefix_kv=prefix_kv,
            chunk_query_index=chunk_query_index,
            num_chunks=num_chunks,
            mask_spec=mask_spec,
            deterministic=deterministic,
            return_probs=return_probs,
        )
        out = FeedForward(self.config, name="ffn")(attn_out, deterministic=deterministic)
        return out, probs


class Pooler(nn.Module):
    """tanh(dense(h[:, 0])) — BertPooler."""

    hidden_size: int
    dtype: object = None

    @nn.compact
    def __call__(self, hidden: jnp.ndarray) -> jnp.ndarray:
        return nn.tanh(
            nn.Dense(self.hidden_size, dtype=self.dtype, name="dense")(hidden[:, 0])
        )
