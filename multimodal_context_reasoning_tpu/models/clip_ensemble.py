"""CLIP-gated ensemble ablations over precomputed CLIP embeddings.

The reference loads a live frozen CLIP ViT-B/16 at import time
(run_PMR_ModCR.py:450) but only its ablation classes consume it — the
production ``Abstract_Specific`` forward has the CLIP block commented out
(modeling_ensemble.py:513-527).  TPU-first disposition: CLIP is frozen, so
its image/text embeddings are **precomputed features** (exactly like the
Faster-RCNN region features) and these modules take the ``[Q, 512]`` image
and ``[Q, K, 512]`` candidate-text embeddings as inputs; nothing here runs
a vision tower on the accelerator hot path.

Rebuilt variants (modeling_ensemble.py):

- :func:`clip_similarity` + :func:`clip_top2_gate` — normalized cosine
  similarity and the top-2 gating vector of ``ensemble_model_t1``
  (:568-587): the two best-matching candidates' positions carry the MEAN
  of the top-2 scores, every other position gates by 1.0;
- :class:`ClipGatedEnsemble` — ``ensemble_model_t1`` (:543-602): the gate
  scales the concatenated [CALeC ‖ RoBERTa] CLS feature before a
  ``Linear(1792, 1)`` scorer;
- :class:`ClipSimilarityFusion` — ``dual_ensemble_model_clip`` (:290-352):
  ``(logits + cosine_similarity) / 2``;
- :class:`ClipOnlyModel` — ``clip_model`` (:793-822, raw concat through
  ``easy_fusion``) and ``clip_model_r`` (:824-858, normalized elementwise
  product ×1000) behind ``variant=``.

Feeding embeddings: store per-image CLIP vectors in the same indexed mmap
pack as the region features (``data/feature_store.py`` /
``cli/pack_features.py`` handle any fixed dim — use dim=512) and batch the
per-candidate text embeddings host-side; there is deliberately no live
CLIP tower in the framework (the reference's CLIP data hooks are
commented-out dead code, run_PMR_ModCR.py:791-793).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_context_reasoning_tpu.models.modcr import soft_cross_entropy


class ClipEnsembleOutput(NamedTuple):
    loss: Optional[jnp.ndarray]
    logits: jnp.ndarray              # [Q, K]


def clip_similarity(image_emb: jnp.ndarray,       # [Q, D_clip]
                    text_emb: jnp.ndarray         # [Q, K, D_clip]
                    ) -> jnp.ndarray:
    """L2-normalized cosine similarity [Q, K] (ensemble:568-573)."""
    img = image_emb / jnp.linalg.norm(image_emb, axis=-1, keepdims=True)
    txt = text_emb / jnp.linalg.norm(text_emb, axis=-1, keepdims=True)
    return jnp.einsum("qkd,qd->qk", txt, img)


def clip_top2_gate(similarity: jnp.ndarray) -> jnp.ndarray:
    """ensemble_model_t1's gate (:576-587): positions of the top-2
    candidates carry mean(top-2 scores); the rest carry 1.0."""
    score, position = jax.lax.top_k(similarity, 2)            # [Q, 2]
    mean2 = jnp.mean(score, axis=-1, keepdims=True)           # [Q, 1]
    K = similarity.shape[-1]
    onehot = jnp.sum(
        jax.nn.one_hot(position, K, dtype=similarity.dtype), axis=1
    )                                                          # [Q, K]
    return onehot * mean2 + (1.0 - onehot)


class ClipGatedEnsemble(nn.Module):
    """ensemble_model_t1: gate × concat(CALeC CLS, RoBERTa pooled) →
    Linear(D_calec + D_roberta, 1) → [Q, K] logits + CE."""

    num_labels: int = 4

    @nn.compact
    def __call__(
        self,
        calec_cls: jnp.ndarray,      # [Q*K, D_calec]
        roberta_pooled: jnp.ndarray,  # [Q*K, D_roberta]
        image_emb: jnp.ndarray,      # [Q, D_clip]
        text_emb: jnp.ndarray,       # [Q, K, D_clip]
        label: Optional[jnp.ndarray] = None,   # [Q*K] multi-hot
    ) -> ClipEnsembleOutput:
        K = self.num_labels
        gate = clip_top2_gate(clip_similarity(image_emb, text_emb))
        feat = jnp.concatenate([calec_cls, roberta_pooled], axis=-1)
        feat = gate.reshape(-1, 1) * feat                      # :589-591
        logits = nn.Dense(1, name="classifier")(feat).reshape(-1, K)
        loss = None
        if label is not None:
            loss = soft_cross_entropy(logits, label.reshape(-1, K))
        return ClipEnsembleOutput(loss=loss, logits=logits)


class ClipSimilarityFusion(nn.Module):
    """dual_ensemble_model_clip (:290-352): average the upstream model's
    choice logits with the CLIP cosine similarity."""

    num_labels: int = 4

    @nn.compact
    def __call__(
        self,
        model_logits: jnp.ndarray,   # [Q, K]
        image_emb: jnp.ndarray,      # [Q, D_clip]
        text_emb: jnp.ndarray,       # [Q, K, D_clip]
        label: Optional[jnp.ndarray] = None,
    ) -> ClipEnsembleOutput:
        sim = clip_similarity(image_emb, text_emb)
        scores = (model_logits + sim) / 2.0                    # :335
        loss = None
        if label is not None:
            loss = soft_cross_entropy(
                scores, label.reshape(scores.shape)
            )
        return ClipEnsembleOutput(loss=loss, logits=scores)


class ClipOnlyModel(nn.Module):
    """clip_model / clip_model_r: score candidates from CLIP embeddings
    alone.

    - ``variant="fusion"`` (clip_model, :793-822): concat the RAW (not
      normalized) image and text embeddings → ``easy_fusion``
      Linear(2·D→D) → Linear(D, 1);
    - ``variant="product"`` (clip_model_r, :824-858): normalized
      elementwise product scaled ×1000 → Linear(D, 1).
    """

    num_labels: int = 4
    variant: str = "fusion"          # "fusion" | "product"
    clip_dim: int = 512

    @nn.compact
    def __call__(
        self,
        image_emb: jnp.ndarray,      # [Q, D_clip]
        text_emb: jnp.ndarray,       # [Q, K, D_clip]
        label: Optional[jnp.ndarray] = None,
    ) -> ClipEnsembleOutput:
        K = self.num_labels
        Q = image_emb.shape[0]
        if self.variant == "fusion":
            img = jnp.broadcast_to(image_emb[:, None], text_emb.shape)
            feat = jnp.concatenate([img, text_emb], axis=-1)   # raw, :810
            feat = nn.Dense(self.clip_dim, name="easy_fusion")(feat)
        elif self.variant == "product":
            img = image_emb / jnp.linalg.norm(image_emb, axis=-1,
                                              keepdims=True)
            txt = text_emb / jnp.linalg.norm(text_emb, axis=-1,
                                             keepdims=True)
            feat = img[:, None] * txt * 1000.0                 # :843-845
        else:
            raise ValueError(f"unknown variant {self.variant}")
        logits = nn.Dense(1, name="classifier")(feat)[..., 0]  # [Q, K]
        loss = None
        if label is not None:
            loss = soft_cross_entropy(logits, label.reshape(Q, K))
        return ClipEnsembleOutput(loss=loss, logits=logits)
