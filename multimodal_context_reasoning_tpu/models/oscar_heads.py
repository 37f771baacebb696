"""Oscar-lineage task heads over the image-text encoder.

Capability parity with modeling/modeling_bert.py's legacy heads (none are
reachable from the reference's entry scripts, but they define the Oscar API
surface a user might port):

- :class:`SequenceClassificationHead` — ``ImageBertForSequenceClassification``
  (:424-491): pooled CLS → dropout → classifier; CE for classification,
  MSE when ``num_labels == 1`` (regression branch :478-483).
- :class:`MultipleChoiceHead` — ``ImageBertForMultipleChoice`` /
  ``OscarForMultipleChoice`` (:492-573): per-choice pooled CLS → Linear(1)
  → reshape (−1, num_choices) → CE.
- :class:`CaptioningLoss` — ``BertCaptioningLoss`` (:715-743): label
  smoothing + drop-worst fraction.
- :class:`MaskedCaptionHead` — the MLM-style masked-caption scorer used by
  ``BertForImageCaptioning`` (:744-1054): transform (dense+act+LN) then a
  decoder tied to the word embeddings.
- :class:`PretrainingHeads` — ``BertImgForPreTraining`` (:2045-2140): MLM
  head + image-text-matching / relationship binary head.

All are thin Flax modules over :class:`GlobalImageEncoder` outputs; the
composition (encoder → head) is the caller's, matching the reference's
``self.bert = BertImgModel(...)`` pattern.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_context_reasoning_tpu.core.config import EncoderConfig
from multimodal_context_reasoning_tpu.models.layers import ACT


class SequenceClassificationHead(nn.Module):
    config: EncoderConfig
    num_labels: int

    @nn.compact
    def __call__(self, pooled: jnp.ndarray, labels: Optional[jnp.ndarray] = None,
                 *, deterministic: bool = True):
        x = nn.Dropout(self.config.hidden_dropout_prob)(
            pooled, deterministic=deterministic
        )
        logits = nn.Dense(self.num_labels, name="classifier")(x)
        loss = None
        if labels is not None:
            if self.num_labels == 1:  # regression (modeling_bert.py:478-480)
                loss = jnp.mean((logits[..., 0] - labels) ** 2)
            else:
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                loss = -jnp.mean(
                    jnp.take_along_axis(logp, labels[:, None], axis=-1)
                )
        return loss, logits


class MultipleChoiceHead(nn.Module):
    config: EncoderConfig
    num_choices: int = 4

    @nn.compact
    def __call__(self, pooled: jnp.ndarray, labels: Optional[jnp.ndarray] = None,
                 *, deterministic: bool = True):
        """``pooled``: [B·num_choices, D] per-choice CLS vectors."""
        x = nn.Dropout(self.config.hidden_dropout_prob)(
            pooled, deterministic=deterministic
        )
        logits = nn.Dense(1, name="classifier")(x).reshape(-1, self.num_choices)
        loss = None
        if labels is not None:
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            loss = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))
        return loss, logits


class CaptioningLoss(nn.Module):
    """Label-smoothed CE with drop-worst (modeling_bert.py:715-743)."""

    label_smoothing: float = 0.1
    drop_worst_ratio: float = 0.0

    def __call__(self, logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
        """``logits``: [N, V]; ``targets``: [N] int. Returns scalar loss."""
        V = logits.shape[-1]
        eps = self.label_smoothing
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
        smooth = -jnp.mean(logp, axis=-1)
        loss = (1.0 - eps) * nll + eps * smooth
        if self.drop_worst_ratio > 0.0:
            keep = loss.shape[0] - int(loss.shape[0] * self.drop_worst_ratio)
            loss = -jax.lax.top_k(-loss, keep)[0]  # keep the smallest losses
        return jnp.mean(loss)


class MaskedCaptionHead(nn.Module):
    """Transform + tied decoder over masked positions (BertForImageCaptioning's
    cls head; the tied embedding table is passed in)."""

    config: EncoderConfig

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, word_embedding: jnp.ndarray):
        c = self.config
        x = nn.Dense(c.hidden_size, name="transform")(hidden)
        x = ACT[c.hidden_act](x)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="transform_layer_norm")(x)
        bias = self.param("decoder_bias", nn.initializers.zeros,
                          (word_embedding.shape[0],))
        return x @ word_embedding.T + bias


class PretrainOutput(NamedTuple):
    loss: Optional[jnp.ndarray]
    mlm_logits: jnp.ndarray
    itm_logits: jnp.ndarray


class PretrainingHeads(nn.Module):
    """MLM + image-text-matching heads (BertImgForPreTraining,
    modeling_bert.py:2045-2140)."""

    config: EncoderConfig
    num_seq_relations: int = 2

    @nn.compact
    def __call__(
        self,
        sequence: jnp.ndarray,               # [B, L, D]
        pooled: jnp.ndarray,                 # [B, D]
        word_embedding: jnp.ndarray,         # [V, D] tied table
        mlm_labels: Optional[jnp.ndarray] = None,   # [B, L], -100 = ignore
        itm_labels: Optional[jnp.ndarray] = None,   # [B]
    ) -> PretrainOutput:
        mlm_logits = MaskedCaptionHead(self.config, name="predictions")(
            sequence, word_embedding
        )
        itm_logits = nn.Dense(self.num_seq_relations, name="seq_relationship")(
            pooled
        )
        loss = None
        if mlm_labels is not None and itm_labels is not None:
            logp = jax.nn.log_softmax(mlm_logits.astype(jnp.float32), axis=-1)
            tgt = jnp.clip(mlm_labels, 0, None)
            nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
            keep = (mlm_labels >= 0).astype(jnp.float32)
            mlm_loss = jnp.sum(nll * keep) / jnp.maximum(jnp.sum(keep), 1.0)
            ilogp = jax.nn.log_softmax(itm_logits.astype(jnp.float32), axis=-1)
            itm_loss = -jnp.mean(
                jnp.take_along_axis(ilogp, itm_labels[:, None], axis=-1)
            )
            loss = mlm_loss + itm_loss
        return PretrainOutput(loss, mlm_logits, itm_logits)
