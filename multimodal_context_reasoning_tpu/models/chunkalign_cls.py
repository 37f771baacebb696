"""Stage-1 ChunkAlign pretrain classifier.

Rebuilds ``ChunkAlign_CLS_enc4_align``
(modeling/modeling_vcr_chunkalign_v10.py:1016-1165) — the regime that
produces the reference's ChunkAlign pretrain checkpoint
(``checkpoint-6-2625-acc-0.8164``, run_PMR_ModCR.py:555) whose ``seq_enc.``
weights seed the production composite (:752-763):

- BOTH encoders are **trainable** (no ``torch.no_grad`` — unlike the
  production composite where they are frozen, v10.py:895-911);
- fused CLS via ``cls_ensemble: Linear(2D, D)`` (:1021-1022);
- THREE ``ClsLayer2`` reasoning layers (:1024-1025) — the single-head
  :class:`ClsReasonLayer`, not the multi-head ``ClsLayer_lyx`` the
  production fusion uses;
- binary ``classifier: Linear(D, 2)`` per candidate row + CE (:1026,1065),
  4-way decision via :func:`binary_to_mp` (:1066);
- the attention-alignment CE over the last three cross-modal layers'
  maps (:1073-1078, shared helper ``fusion.alignment_loss_from_probs``).

The reference returns the two losses separately (:1084) and its (absent)
stage-1 trainer combines them; ``align_weight`` makes that recipe knob
explicit here.  The two-stage driver (scripts/train_two_stage.py) trains
this model, exports it in the reference's checkpoint layout
(interop/export.py), and seeds the composite through the same
``interop/assemble.py`` surgery the reference applies.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_context_reasoning_tpu.core.config import (
    ChunkAlignConfig,
    EncoderConfig,
)
from multimodal_context_reasoning_tpu.models.encoders import (
    ChunkAlignEncoder,
    GlobalImageEncoder,
)
from multimodal_context_reasoning_tpu.models.fusion import (
    alignment_loss_from_probs,
)
from multimodal_context_reasoning_tpu.models.rationale import (
    ClsReasonLayer,
    binary_to_mp,
)
from multimodal_context_reasoning_tpu.ops.masks import NEG_INF


class ChunkAlignClassifierOutput(NamedTuple):
    loss: jnp.ndarray          # cls_loss + align_weight · align_loss
    cls_loss: jnp.ndarray      # scalar binary CE (fp32)
    align_loss: jnp.ndarray    # scalar alignment CE (fp32)
    logits: jnp.ndarray        # [Q, num_labels] choice P(true) (binary_to_mp);
                               # probabilities, but argmax-equivalent to the
                               # reference's `matched` decision (v10.py:1066) —
                               # named `logits` to satisfy the shared train-step
                               # metric contract (train/step.py::_metrics)
    binary_logits: jnp.ndarray  # [B, 2] per-candidate-row binary logits


class ChunkAlignClassifier(nn.Module):
    config: EncoderConfig
    schedule: ChunkAlignConfig
    num_labels: int = 4
    cls_layer_num: int = 3     # v10.py:1024
    max_chunks: int = 40
    align_weight: float = 1.0

    @nn.compact
    def __call__(
        self,
        batch: Dict[str, jnp.ndarray],
        *,
        deterministic: bool = True,
    ) -> ChunkAlignClassifierOutput:
        c = self.config
        input_ids = batch["input_ids"]       # [B, T] (B = Q·num_labels)
        text_mask = batch["text_mask"]
        img_feat = batch["img_feat"]
        img_mask = batch["img_mask"]
        B, T = input_ids.shape

        global_enc = GlobalImageEncoder(c, name="global_enc")
        seq_enc = ChunkAlignEncoder(c, self.schedule, name="seq_enc")

        full_mask = jnp.concatenate([text_mask, img_mask], axis=-1)
        g = global_enc(
            input_ids, img_feat, full_mask,
            token_type_ids=batch.get("token_type_ids"),
            deterministic=deterministic,
        )
        chunk_mask = batch.get("chunk_mask")
        if chunk_mask is None:
            from multimodal_context_reasoning_tpu.ops.chunk import (
                chunk_mask_from_gather_index,
            )

            chunk_mask = chunk_mask_from_gather_index(
                batch["gather_index"], text_mask
            )
        s = seq_enc(
            input_ids, img_feat, text_mask, img_mask,
            chunk_mask, batch["gather_index"], self.max_chunks,
            token_type_ids=batch.get("token_type_ids"),
            deterministic=deterministic,
            output_attentions=True,          # the align loss needs the maps
        )

        cls = nn.Dense(c.hidden_size, dtype=c.jnp_dtype,
                       name="cls_ensemble")(
            jnp.concatenate([g.pooled, s.pooled], axis=-1))  # :1040

        # [global ‖ seq ‖ chunk_hidden] over positions 1..T-1 (:1042-1045)
        memory = jnp.concatenate(
            [g.sequence[:, 1:T], s.sequence[:, 1:T], s.chunk_hidden[:, 1:T]],
            axis=1,
        )
        word = text_mask[:, 1:T].astype(jnp.float32)
        tri = jnp.concatenate([word, word, word], axis=-1)
        memory_bias = ((1.0 - tri) * NEG_INF)[:, None, None, :]  # :1047-1049

        for i in range(self.cls_layer_num):
            cls, _ = ClsReasonLayer(c, name=f"cls_layer_{i}")(
                memory, cls, memory_bias, deterministic=deterministic
            )

        logits = nn.Dense(2, dtype=c.jnp_dtype, name="classifier")(cls)

        cls_loss = jnp.asarray(0.0, jnp.float32)
        label = batch.get("label")
        if label is not None:
            lbl = label.reshape(-1).astype(jnp.int32)            # :1065
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            cls_loss = -jnp.mean(
                jnp.take_along_axis(logp, lbl[:, None], axis=1))
        mp_probs = binary_to_mp(logits, self.num_labels)

        align_loss, _ = alignment_loss_from_probs(
            s.attn_probs, T,
            batch.get("align_pos"), batch.get("total_label"),
        )
        loss = cls_loss + self.align_weight * align_loss
        return ChunkAlignClassifierOutput(
            loss=loss, cls_loss=cls_loss, align_loss=align_loss,
            logits=mp_probs, binary_logits=logits,
        )
