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

Feeding embeddings, two in-framework paths:

- **precomputed** (production): per-image CLIP vectors live in the same
  indexed mmap pack as the region features (``data/feature_store.py`` /
  ``cli/pack_features.py`` handle any fixed dim — use dim=512), produced
  once by ``cli/precompute_clip.py`` with the Flax tower;
- **live** (reference semantics): :class:`ClipEndToEnd` runs the Flax
  CLIP ViT-B/16 towers (models/clip.py) inside the forward, exactly like
  ``clip_model``/``clip_model_r`` call ``encode_image``/``encode_text``
  per step (modeling_ensemble.py:804-806,833-835) — including the
  reference's features→fp32 cast point (:810-811, :846-847), reproduced
  in the heads below.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_context_reasoning_tpu.core.config import CLIPConfig
from multimodal_context_reasoning_tpu.models.clip import CLIP
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
            # the reference casts the (fp16) fused feature to fp32 before
            # the heads (:810-811 ``.type(torch.FloatTensor)``)
            feat = feat.astype(jnp.float32)
            feat = nn.Dense(self.clip_dim, name="easy_fusion")(feat)
        elif self.variant == "product":
            img = image_emb / jnp.linalg.norm(image_emb, axis=-1,
                                              keepdims=True)
            txt = text_emb / jnp.linalg.norm(text_emb, axis=-1,
                                             keepdims=True)
            feat = img[:, None] * txt * 1000.0                 # :843-845
            feat = feat.astype(jnp.float32)                    # :846-847
        else:
            raise ValueError(f"unknown variant {self.variant}")
        logits = nn.Dense(1, name="classifier")(feat)[..., 0]  # [Q, K]
        loss = None
        if label is not None:
            loss = soft_cross_entropy(logits, label.reshape(Q, K))
        return ClipEnsembleOutput(loss=loss, logits=logits)


class ClipEndToEnd(nn.Module):
    """``clip_model`` / ``clip_model_r`` from PIXELS — the reference's
    literal forward shape (modeling_ensemble.py:793-858): run the frozen
    CLIP towers on the image and the K candidate texts inside the step,
    then score with :class:`ClipOnlyModel`.

    Inputs: ``pixels`` [Q, S, S, 3] (data/clip_preprocess.py), ``text_ids``
    [Q·K, T] CLIP token ids (data/clip_tokenizer.py).  The reference's
    ``text.squeeze(1)`` flattens its [Q, 1, 77] per-candidate rows the same
    way (:805).  One jitted program: both towers + head fuse into a single
    XLA computation, so per-step tower invocation costs no dispatch — but
    for the frozen production path precompute embeddings instead
    (cli/precompute_clip.py).
    """

    config: CLIPConfig
    num_labels: int = 4
    variant: str = "fusion"          # "fusion" (clip_model) | "product" (_r)

    @nn.compact
    def __call__(
        self,
        pixels: jnp.ndarray,         # [Q, S, S, 3]
        text_ids: jnp.ndarray,       # [Q*K, T]
        label: Optional[jnp.ndarray] = None,
    ) -> ClipEnsembleOutput:
        K = self.num_labels
        clip = CLIP(self.config, name="clip")
        image_emb = clip.encode_image(pixels)                  # [Q, E]
        text_emb = clip.encode_text(text_ids).reshape(
            pixels.shape[0], K, -1)                            # [Q, K, E]
        return ClipOnlyModel(
            num_labels=K, variant=self.variant,
            clip_dim=self.config.embed_dim, name="head",
        )(image_emb, text_emb, label)
