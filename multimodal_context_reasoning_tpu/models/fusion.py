"""CALeC fusion: multi-view CLS reasoning over the chunk-aligned memory.

Rebuilds ``ChunkAlign_CLS_enc4_align_ensemble``
(modeling/modeling_vcr_chunkalign_v10.py:872-997) minus encoder ownership
(the composite model owns the encoders so the global encoder's parameters can
be shared with the vision-prefix pass):

- fuse the two encoders' CLS vectors through ``cls_ensemble_1``
  (Linear(2D → D), v10.py:877,912);
- build the 3×(T-1) "self_chunk_align" memory
  ``[global_hypo ‖ chunk_align ‖ chunk_hidden]`` (v10.py:913);
- run ``cls_layer_num`` ClsLayerLyx reasoning layers: single-query 8-head
  cross-attention of the fused CLS over the memory + BERT FFN (v10.py:840-870,
  976-977);
- alignment loss: the last three cross-modal layers' text→image attention
  maps, summed over layers and heads, re-softmaxed and scored against the
  ``<|det#|>`` region labels (v10.py:981-987).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_context_reasoning_tpu.core.config import ChunkAlignConfig, EncoderConfig
from multimodal_context_reasoning_tpu.models.layers import FeedForward
from multimodal_context_reasoning_tpu.ops.attention import dot_product_attention
from multimodal_context_reasoning_tpu.ops.masks import NEG_INF


class ClsLayerLyx(nn.Module):
    """Single-query multi-head cross-attention + FFN (ClsLayer_lyx, v10.py:840-870).

    The attention core is ``cross_attention_lyx`` (v10.py:660-797) with
    ``tau=1.0, neg_type=False, prior_score=None`` as called in the production
    path (v10.py:857).
    """

    config: EncoderConfig
    num_heads: int = 8
    # cross_attention_lyx's exotic knobs (v10.py:732-760): softmax
    # temperature, inverted attention (1 − softmax), additive prior on the
    # probabilities.  Production path uses the defaults (v10.py:857).
    tau: float = 1.0
    neg_type: bool = False

    @nn.compact
    def __call__(
        self,
        memory: jnp.ndarray,                   # [B, M, D]
        cls: jnp.ndarray,                      # [B, D]
        memory_bias: Optional[jnp.ndarray],    # [B, 1, 1, M] additive or None
        prior_score: Optional[jnp.ndarray] = None,   # [B, 1, M] added to probs
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        c = self.config
        D = c.hidden_size
        Dh = D // self.num_heads
        B, M, _ = memory.shape

        dt = c.jnp_dtype
        q = nn.Dense(D, dtype=dt, name="q_proj")(cls[:, None, :])
        k = nn.Dense(D, dtype=dt, name="k_proj")(memory)
        v = nn.Dense(D, dtype=dt, name="v_proj")(memory)
        rng = None
        # cross_attention_lyx(dropout=0.1) at v10.py:848 — the reference
        # hardcodes 0.1, which equals its configs' attention dropout; we
        # thread the config knob so it stays tunable (VERDICT r1 #8).
        attn_drop = c.attention_probs_dropout_prob
        if not deterministic:
            rng = self.make_rng("dropout")
        if self.tau != 1.0 or self.neg_type or prior_score is not None:
            # explicit path for the exotic options
            qh = q.reshape(B, 1, self.num_heads, Dh)
            kh = k.reshape(B, M, self.num_heads, Dh)
            vh = v.reshape(B, M, self.num_heads, Dh)
            scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh).astype(jnp.float32)
            scores = scores / (Dh ** 0.5)
            if memory_bias is not None:
                scores = scores + memory_bias.astype(jnp.float32)
            probs = jax.nn.softmax(scores / self.tau, axis=-1)
            if self.neg_type:
                probs = 1.0 - probs                       # v10.py:753-755
            if prior_score is not None:
                probs = probs + prior_score[:, None].astype(jnp.float32)
            if not deterministic and attn_drop > 0:
                keep = jax.random.bernoulli(rng, 1.0 - attn_drop, probs.shape)
                probs = jnp.where(keep, probs / (1.0 - attn_drop), 0.0)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(vh.dtype), vh)
        else:
            out, _ = dot_product_attention(
                q.reshape(B, 1, self.num_heads, Dh),
                k.reshape(B, M, self.num_heads, Dh),
                v.reshape(B, M, self.num_heads, Dh),
                memory_bias,
                dropout_rate=attn_drop,
                dropout_rng=rng,
                deterministic=deterministic,
            )
        out = nn.Dense(D, dtype=dt, name="out_proj")(out.reshape(B, 1, D))[:, 0]

        out = nn.Dropout(c.hidden_dropout_prob)(out, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=dt, name="layer_norm")(out + cls)
        return FeedForward(c, name="ffn")(h[:, None, :], deterministic=deterministic)[:, 0]


def alignment_loss_from_probs(
    seq_attn_probs: jnp.ndarray,            # [B, 3+, H, L, L] cross-modal maps
    text_len: int,
    align_pos: Optional[jnp.ndarray],       # [B, T] {0,1}
    total_label: Optional[jnp.ndarray],     # [B, T] region indices
):
    """Attention-alignment CE (v10.py:981-987 / :1073-1078): sum the LAST
    THREE cross-modal layers' attention maps over layers and heads, take
    the text→image block, re-mask exact zeros (padded image columns
    underflow to 0.0 in the fp32 softmax), softmax — then treat the
    softmaxed map as *logits* for a second log-softmax inside the CE,
    exactly as the reference's CrossEntropyLoss does — at the ``<|det#|>``
    positions.  Shared by the production fusion (ChunkAlignFusion) and the
    stage-1 pretrain classifier (models/chunkalign_cls.py).

    Returns ``(align_loss scalar fp32, align_logits [B, T, I])``.
    """
    T = text_len
    attn_sum = jnp.sum(seq_attn_probs[:, -3:], axis=(1, 2))      # [B, L, L]
    attn_ti = attn_sum[:, :T, T:]                                 # [B, T, I]
    attn_ti = jnp.where(attn_ti == 0.0, -1e5, attn_ti)
    align_logits = jax.nn.softmax(attn_ti, axis=-1)

    align_loss = jnp.asarray(0.0, dtype=jnp.float32)
    if align_pos is not None and total_label is not None:
        logp = jax.nn.log_softmax(align_logits, axis=-1)          # [B, T, I]
        tgt = jnp.clip(total_label, 0, attn_ti.shape[-1] - 1)
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        w = align_pos.astype(jnp.float32)
        align_loss = jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)
    return align_loss, align_logits


class FusionOutput(NamedTuple):
    cls_ensem: jnp.ndarray                  # [B, D] fused multi-view CLS
    align_loss: jnp.ndarray                 # scalar
    align_logits: jnp.ndarray               # [B, T, I] for eval/diagnostics


class ChunkAlignFusion(nn.Module):
    config: EncoderConfig
    schedule: ChunkAlignConfig

    @nn.compact
    def __call__(
        self,
        global_seq: jnp.ndarray,        # [B, T+I, D] global-encoder sequence
        global_cls: jnp.ndarray,        # [B, D] global pooled CLS
        seq_seq: jnp.ndarray,           # [B, T+I, D] chunk-align sequence
        seq_cls: jnp.ndarray,           # [B, D] chunk-align pooled CLS
        chunk_hidden: jnp.ndarray,      # [B, T+I, D] pre-cross-modal hiddens
        seq_attn_probs: Optional[jnp.ndarray],  # [B, 3, H, L, L] or None
                                        # (None skips the alignment loss —
                                        # the 3 full attention maps are the
                                        # single largest HBM tensor in the
                                        # forward; see ModCRConfig.compute_alignment)
        text_mask: jnp.ndarray,         # [B, T]
        text_len: int,
        align_pos: Optional[jnp.ndarray] = None,   # [B, T] {0,1}
        total_label: Optional[jnp.ndarray] = None,  # [B, T] region indices
        *,
        deterministic: bool = True,
    ) -> FusionOutput:
        c = self.config
        T = text_len

        # Fused CLS (v10.py:912).
        cls_ensem = nn.Dense(c.hidden_size, dtype=c.jnp_dtype, name="cls_ensemble_1")(
            jnp.concatenate([global_cls, seq_cls], axis=-1)
        )

        # 3×(T-1) memory: positions 1..T-1 of each view (v10.py:909-913).
        memory = jnp.concatenate(
            [global_seq[:, 1:T], seq_seq[:, 1:T], chunk_hidden[:, 1:T]], axis=1
        )

        # The reference builds word_mask (v10.py:943-945) and passes it into
        # cls_layer_lyx (:976-977) — but ClsLayer_lyx.forward drops it on the
        # floor: its cross_attention call passes no attention_mask
        # (v10.py:857-858), so padded memory positions ARE attended there
        # and results depend on batch padding.  We mask by default
        # (schedule.mask_fusion_memory=True) for static-shape invariance;
        # set False to replicate the reference bug bit-for-bit.
        memory_bias = None
        if self.schedule.mask_fusion_memory:
            word = text_mask[:, 1:T].astype(jnp.float32)
            tri = jnp.concatenate([word, word, word], axis=-1)
            memory_bias = ((1.0 - tri) * NEG_INF)[:, None, None, :]

        for i in range(self.schedule.cls_layer_num):
            cls_ensem = ClsLayerLyx(
                c, self.schedule.cls_num_heads, name=f"cls_layer_{i}"
            )(memory, cls_ensem, memory_bias, deterministic=deterministic)

        if seq_attn_probs is None:
            B = global_seq.shape[0]
            I = global_seq.shape[1] - T
            return FusionOutput(
                cls_ensem,
                jnp.asarray(0.0, jnp.float32),
                jnp.zeros((B, T, I), jnp.float32),
            )

        # Alignment loss (v10.py:981-987) — shared helper above.
        align_loss, align_logits = alignment_loss_from_probs(
            seq_attn_probs, T, align_pos, total_label
        )
        return FusionOutput(cls_ensem, align_loss, align_logits)
