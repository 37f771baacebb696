"""The two vision-language encoders of ModCR.

- :class:`GlobalImageEncoder` — the Oscar-base "global" encoder
  (``BertImgModel``, modeling/modeling_transfomres.py:564-694): BERT over
  ``[CLS] premise [SEP] answer [SEP]`` tokens concatenated with linearly
  projected Faster-RCNN region features, full attention under a padding mask.

- :class:`ChunkAlignEncoder` — the ChunkAlign "seq" encoder
  (``SeqBertImgModel`` + ``CaptionBertEncoder``,
  modeling/modeling_vcr_chunkalign_v10.py:153-360): same input contract, but
  with the staged attention-mask schedule (chunk-internal → full →
  cross-modal) and chunk-mean queries in the cross-modal phase.

Both are pure static-shape Flax modules; the mask schedule is precomputed as
three bias tensors by ops/masks.py instead of being mutated per layer.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from multimodal_context_reasoning_tpu.core.config import ChunkAlignConfig, EncoderConfig
from multimodal_context_reasoning_tpu.models.layers import (
    BertEmbeddings,
    Pooler,
    TransformerLayer,
)
from multimodal_context_reasoning_tpu.ops.masks import (
    MaskSpec,
    build_stage_biases,
    padding_bias,
    stage_mask_specs,
)


class ImageTextEmbeddings(nn.Module):
    """Token embeddings ++ projected image-region features.

    Reference: BertImgModel.forward (modeling_transfomres.py:659-684) —
    ``img_embedding: Linear(img_feature_dim, hidden)`` (+ optional LayerNorm)
    + dropout, concatenated after the token stream.
    """

    config: EncoderConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,         # [B, T]
        img_feats: jnp.ndarray,         # [B, I, img_feature_dim]
        token_type_ids: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        c = self.config
        text = BertEmbeddings(c, name="embeddings")(
            input_ids, token_type_ids, position_ids, deterministic=deterministic
        )
        img = nn.Dense(c.hidden_size, dtype=c.jnp_dtype,
                       name="img_embedding")(img_feats)
        if c.use_img_layernorm:
            img = nn.LayerNorm(epsilon=c.img_layer_norm_eps, dtype=c.jnp_dtype,
                               name="img_layer_norm")(img)
        img = nn.Dropout(c.hidden_dropout_prob)(img, deterministic=deterministic)
        return jnp.concatenate([text, img], axis=1)


class EncoderOutput(NamedTuple):
    sequence: jnp.ndarray                 # [B, L, D]
    pooled: jnp.ndarray                   # [B, D]
    # [B, layers, H, L, L] attention probs of the requested tail layers
    attn_probs: Optional[jnp.ndarray] = None
    # ChunkAlign only: hidden states saved at entry of the cross-modal phase
    chunk_hidden: Optional[jnp.ndarray] = None


class GlobalImageEncoder(nn.Module):
    """Oscar-base global encoder (BertImgModel)."""

    config: EncoderConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,          # [B, T]
        img_feats: jnp.ndarray,          # [B, I, F]
        attention_mask: jnp.ndarray,     # [B, T+I] {0,1} over text++img
        token_type_ids: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
        output_attentions: bool = False,
    ) -> EncoderOutput:
        c = self.config
        h = ImageTextEmbeddings(c, name="img_text_embeddings")(
            input_ids, img_feats, token_type_ids, position_ids,
            deterministic=deterministic,
        )
        bias = padding_bias(attention_mask)
        # Compact mask for the fused Pallas path (dead code unless
        # config.use_pallas routes attention through fused_attention_spec).
        B, L = attention_mask.shape
        spec = MaskSpec(
            "full", attention_mask.astype(jnp.float32),
            jnp.full((B, L), -1, jnp.int32), jnp.zeros((B, L), jnp.float32),
            int(input_ids.shape[1]),
        )
        probs_all = []
        for i in range(c.num_hidden_layers):
            h, probs = TransformerLayer(c, name=f"layer_{i}")(
                h, bias, mask_spec=spec,
                deterministic=deterministic, return_probs=output_attentions
            )
            if output_attentions:
                probs_all.append(probs)
        pooled = Pooler(c.hidden_size, dtype=c.jnp_dtype, name="pooler")(h)
        attn = jnp.stack(probs_all, axis=1) if output_attentions else None
        return EncoderOutput(sequence=h, pooled=pooled, attn_probs=attn)


class ChunkAlignEncoder(nn.Module):
    """ChunkAlign sequence encoder (SeqBertImgModel + staged schedule).

    The layer schedule (v10.py:166-168, 184-217):

    - layers ``[0, chunk_layers_end)``: stage-one bias (chunk-internal text +
      image-visible; image sees image only),
    - layers ``[chunk_layers_end, full_layers_end)``: full padding bias,
    - layers ``[full_layers_end, num_layers)``: cross-modal bias (image rows
      identity), chunk-mean queries, optional per-layer local residual;
      hidden states at entry of the first cross-modal layer are saved as
      ``chunk_hidden`` (v10.py:197).

    Attention probabilities of the cross-modal layers are always returned —
    the CALeC alignment loss consumes the last three layers' maps
    (v10.py:981-987).
    """

    config: EncoderConfig
    schedule: ChunkAlignConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,        # [B, T]
        img_feats: jnp.ndarray,        # [B, I, F]
        text_mask: jnp.ndarray,        # [B, T] {0,1}
        img_mask: jnp.ndarray,         # [B, I] {0,1}
        chunk_mask: jnp.ndarray,       # [B, T, T] {0,1}
        gather_index: jnp.ndarray,     # [B, T] chunk ids, -1 outside chunks
        num_chunks: int,
        token_type_ids: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
        output_attentions: bool = True,
    ) -> EncoderOutput:
        c = self.config
        s = self.schedule
        B, T = input_ids.shape
        I = img_feats.shape[1]

        h = ImageTextEmbeddings(c, name="img_text_embeddings")(
            input_ids, img_feats, token_type_ids, position_ids,
            deterministic=deterministic,
        )
        # The reference also constructs an `edge_dense` embedding on
        # SeqBertImgModel (v10.py:259) but never uses it in forward; we keep a
        # parameter for checkpoint compatibility.
        edge = self.param(
            "edge_dense", nn.initializers.normal(c.initializer_range), (1, c.hidden_size)
        )
        del edge

        bias_chunk, bias_full, bias_cross = build_stage_biases(
            text_mask, img_mask, chunk_mask
        )
        # Compact per-stage specs for the fused Pallas path.  These derive
        # from gather_index; the data pipeline's dense chunk_mask is always
        # gather-derived too (bit-equality proven in
        # tests/test_chunker_parity.py), so both mask forms agree.  XLA
        # eliminates whichever form the dispatch does not use.
        spec_chunk, spec_full, spec_cross = stage_mask_specs(
            text_mask, img_mask, gather_index
        )
        # Pad the text-only gather_index over the image positions (-1 = keep).
        full_gather = jnp.concatenate(
            [gather_index, jnp.full((B, I), -1, dtype=gather_index.dtype)], axis=1
        )

        chunk_hidden = None
        probs_cross = []
        for i in range(c.num_hidden_layers):
            if i < s.chunk_layers_end:
                bias, cq, spec = bias_chunk, None, spec_chunk
            elif i < s.full_layers_end:
                bias, cq, spec = bias_full, None, spec_full
            else:
                bias, cq, spec = bias_cross, full_gather, spec_cross
                if i == s.full_layers_end:
                    chunk_hidden = h
            is_cross = i >= s.full_layers_end
            out, probs = TransformerLayer(c, name=f"layer_{i}")(
                h, bias,
                chunk_query_index=cq,
                num_chunks=num_chunks,
                mask_spec=spec,
                deterministic=deterministic,
                return_probs=is_cross and output_attentions,
            )
            if is_cross:
                if probs is not None:
                    probs_cross.append(probs)
                if s.add_local_residual:
                    # v10.py:212-215 — extra residual in the cross phase.
                    out = out + h
            h = out

        if s.add_residual:
            h = h + chunk_hidden  # v10.py:221-223

        pooled = Pooler(c.hidden_size, dtype=c.jnp_dtype, name="pooler")(h)
        return EncoderOutput(
            sequence=h,
            pooled=pooled,
            attn_probs=jnp.stack(probs_cross, axis=1) if probs_cross else None,
            chunk_hidden=chunk_hidden,
        )
