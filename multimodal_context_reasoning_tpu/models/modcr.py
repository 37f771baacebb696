"""The ModCR composite model (Abstract_Specific, modeling_ensemble.py:424-539).

Forward dataflow (one jitted graph, no host sync):

1. **Vision prefix** — frozen global-encoder pass over ``[CLS]`` + image
   regions only; the CLS sequence output feeds ``mapping_network_vision``
   (Dropout→Linear(D→5D)→Tanh→Dropout→Linear(5D→5·1024)) reshaped to a
   ``[B, 5, 1024]`` prefix (modeling_ensemble.py:466-475).
2. **Alignment prefix** — frozen global + ChunkAlign passes fused by the
   CALeC reasoning stack; the fused CLS feeds ``mapping_network_alignment``
   to a second ``[B, 5, 1024]`` prefix (modeling_ensemble.py:484-494).
3. **Reasoning** — prefix-RoBERTa consumes the concatenated 10-vector prefix
   through its KV path; the pooled output is scored by
   ``abst_confidence_scorer: Linear(1024, 1)`` and reshaped to 4-way logits
   (modeling_ensemble.py:497-528).
4. **Losses** — soft-target cross-entropy over the 4 candidates
   (modeling_ensemble.py:533-537; targets are float multi-hot to support
   PMR's multi-label ``answer_label`` lists, Data/VCRChunkAlign.py:672-681)
   plus the CALeC attention-alignment loss.

Freezing: the reference runs both encoders under ``torch.no_grad()``
(modeling_ensemble.py:466, v10.py:895-911). Here the same is expressed with
``jax.lax.stop_gradient`` on the encoder outputs, so XLA prunes the whole
encoder backward graph.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_context_reasoning_tpu.core.config import ModCRConfig
from multimodal_context_reasoning_tpu.models.encoders import (
    ChunkAlignEncoder,
    GlobalImageEncoder,
)
from multimodal_context_reasoning_tpu.models.fusion import ChunkAlignFusion
from multimodal_context_reasoning_tpu.models.roberta import PrefixRoberta


class MappingNetwork(nn.Module):
    """Dropout→Linear(in→5·in)→Tanh→Dropout→Linear(5·in→prefix_len·out).

    modeling_ensemble.py:439-457 (both mapping networks share this shape).
    """

    hidden_size: int        # encoder hidden (768)
    out_size: int           # reasoner hidden (1024)
    prefix_len: int         # 5
    dropout: float = 0.1
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        B = x.shape[0]
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.hidden_size * self.prefix_len, dtype=self.dtype,
                     name="dense0")(x)
        x = nn.tanh(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.out_size * self.prefix_len, dtype=self.dtype,
                     name="dense1")(x)
        return x.reshape(B, self.prefix_len, self.out_size)


class ModCROutput(NamedTuple):
    loss: jnp.ndarray            # scalar: 4-way soft CE (cls loss)
    logits: jnp.ndarray          # [B, num_labels]
    align_loss: jnp.ndarray      # scalar CALeC alignment loss
    abstract_loss: jnp.ndarray   # scalar (== loss in prod path, kept for parity
                                 # with the reference's aux tuple, ensemble:537)


def soft_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """torch CrossEntropyLoss with float class-probability targets.

    loss_i = -Σ_c targets[i,c]·log_softmax(logits)[i,c], mean over rows.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(targets.astype(jnp.float32) * logp, axis=-1))


class ModCRModel(nn.Module):
    config: ModCRConfig
    freeze_encoders: bool = True

    @nn.compact
    def __call__(
        self,
        batch: Dict[str, jnp.ndarray],
        *,
        deterministic: bool = True,
    ) -> ModCROutput:
        c = self.config
        stop = jax.lax.stop_gradient if self.freeze_encoders else (lambda x: x)

        input_ids = batch["input_ids"]          # [N, T] (N = examples×4)
        text_mask = batch["text_mask"]          # [N, T]
        img_feat = batch["img_feat"]            # [N, I, F]
        img_mask = batch["img_mask"]            # [N, I]
        N, T = input_ids.shape

        global_enc = GlobalImageEncoder(c.global_encoder, name="global_enc")
        seq_enc = ChunkAlignEncoder(c.seq_encoder, c.chunkalign, name="seq_enc")
        fusion = ChunkAlignFusion(c.global_encoder, c.chunkalign, name="fusion")
        roberta = PrefixRoberta(c.roberta, name="roberta")

        # --- 1. Vision prefix: CLS token + image only (ensemble:466-475).
        # The K candidate rows of one example share [CLS] + image exactly,
        # so whenever the vision pass itself is dropout-free it runs once
        # per example — same math, (K-1)/K fewer FLOPs (core/config.py
        # dedup_vision_prefix).  That holds on the deterministic path
        # always, and on the TRAIN path iff the global encoder's dropout
        # probs are 0 (flax Dropout(rate=0) is an RNG-free no-op) — the
        # recipe real from-scratch runs use (BENCHMARKS.md dropout finding).
        K = c.num_labels
        vision_pass_stochastic = not deterministic and (
            c.global_encoder.hidden_dropout_prob > 0.0
            or c.global_encoder.attention_probs_dropout_prob > 0.0
        )
        dedup = (
            c.dedup_vision_prefix
            and not vision_pass_stochastic
            and N % K == 0
            and N > K
        )
        v_ids = input_ids[::K] if dedup else input_ids
        v_tmask = text_mask[::K] if dedup else text_mask
        v_feat = img_feat[::K] if dedup else img_feat
        v_imask = img_mask[::K] if dedup else img_mask
        vis_mask = jnp.concatenate([v_tmask[:, :1], v_imask], axis=-1)
        vis_out = global_enc(
            v_ids[:, :1], v_feat, vis_mask,
            token_type_ids=None, deterministic=deterministic,
        )
        vis_cls = stop(vis_out.sequence[:, 0])
        if dedup and not deterministic:
            # train time: repeat BEFORE the mapping network so its dropout
            # stays independent per candidate row (the reference draws one
            # mask per row, ensemble:470); deterministic path repeats the
            # finished prefix instead (fewer mapping FLOPs, same values).
            vis_cls = jnp.repeat(vis_cls, K, axis=0)
        prefix_vision = MappingNetwork(
            c.global_encoder.hidden_size, c.roberta.hidden_size, c.prefix_len,
            c.mapping_dropout, dtype=c.global_encoder.jnp_dtype,
            name="mapping_network_vision",
        )(vis_cls, deterministic=deterministic)
        if dedup and deterministic:
            prefix_vision = jnp.repeat(prefix_vision, K, axis=0)

        # --- 2. Alignment prefix: global + seq encoders + CALeC fusion.
        full_mask = jnp.concatenate([text_mask, img_mask], axis=-1)
        g_out = global_enc(
            input_ids, img_feat, full_mask,
            token_type_ids=batch.get("token_type_ids"),
            deterministic=deterministic,
        )
        # Dense chunk mask: taken from the batch when a parity run ships the
        # reference's pickled [T, T] masks, synthesized on device from the
        # flat gather_index otherwise (ops/chunk.py — nothing quadratic is
        # stored or transferred).
        chunk_mask = batch.get("chunk_mask")
        if chunk_mask is None:
            from multimodal_context_reasoning_tpu.ops.chunk import (
                chunk_mask_from_gather_index,
            )

            chunk_mask = chunk_mask_from_gather_index(
                batch["gather_index"], text_mask
            )
        if c.use_seq_encoder:
            s_out = seq_enc(
                input_ids, img_feat, text_mask, img_mask,
                chunk_mask, batch["gather_index"], c.max_chunks,
                token_type_ids=batch.get("token_type_ids"),
                deterministic=deterministic,
                output_attentions=c.compute_alignment,
            )
            seq_views = (s_out.sequence, s_out.pooled, s_out.chunk_hidden,
                         s_out.attn_probs)
            align_inputs = dict(
                align_pos=batch.get("align_pos"),
                total_label=batch.get("total_label"),
            )
        else:
            # "_wo_chual" ablation: the global encoder stands in for every
            # chunk-align view; no alignment supervision exists.
            seq_views = (g_out.sequence, g_out.pooled, g_out.sequence, None)
            align_inputs = dict(align_pos=None, total_label=None)
        fused = fusion(
            stop(g_out.sequence), stop(g_out.pooled),
            stop(seq_views[0]), stop(seq_views[1]),
            stop(seq_views[2]), stop(seq_views[3]),
            text_mask, T,
            deterministic=deterministic,
            **align_inputs,
        )
        prefix_align = MappingNetwork(
            c.global_encoder.hidden_size, c.roberta.hidden_size, c.prefix_len,
            c.mapping_dropout, dtype=c.global_encoder.jnp_dtype,
            name="mapping_network_alignment",
        )(fused.cls_ensem, deterministic=deterministic)

        # --- 3. Prefix-RoBERTa reasoning (ensemble:497-503).
        if c.prefix_mode == "promptfuse":
            # "PromptFuse" ablation: a learnable 2-vector prefix replaces the
            # mapped vision/alignment vectors (constructed at ensemble:458,
            # usage sketched in the commented block :477-481).
            pf = self.param(
                "promptfuse",
                nn.initializers.normal(0.02),
                (2, c.roberta.hidden_size),
            )
            prefix_emb = jnp.broadcast_to(pf[None], (N, 2, c.roberta.hidden_size))
            prompt_mask = jnp.ones((N, 2), dtype=jnp.float32)
        else:
            prefix_emb = jnp.concatenate([prefix_vision, prefix_align], axis=1)
            prompt_mask = jnp.ones((N, 2 * c.prefix_len), dtype=jnp.float32)
        r_out = roberta(
            batch["r_input_ids"], batch["r_attention_mask"],
            token_type_ids=batch.get("r_token_type_ids"),
            prompt_embeddings=prefix_emb, prompt_mask=prompt_mask,
            deterministic=deterministic,
        )

        # --- 4. Score + losses (ensemble:511-537).
        abst_logit = nn.Dense(1, dtype=c.roberta.jnp_dtype,
                              name="abst_confidence_scorer")(r_out.pooled)
        logits = abst_logit.reshape(-1, c.num_labels)

        loss = jnp.asarray(0.0, jnp.float32)
        abstract_loss = jnp.asarray(0.0, jnp.float32)
        if "label" in batch and batch["label"] is not None:
            targets = batch["label"].reshape(-1, c.num_labels)
            loss = soft_cross_entropy(logits, targets)
            abstract_loss = loss
        return ModCROutput(
            loss=loss, logits=logits,
            align_loss=fused.align_loss, abstract_loss=abstract_loss,
        )
