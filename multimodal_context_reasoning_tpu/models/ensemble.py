"""Ablation ensemble family — one configurable model instead of 14 classes.

The reference keeps fourteen near-duplicate ensembles
(modeling/modeling_ensemble.py:45-869: ``dual_ensemble_model``, ``_add``,
``_pairwise``, ``_doubleloss``, ``_gpt``, ``_clip``, ``ensemble_model_t``,
``_t1``..``_t4``, ``clip_model``, ``clip_model_r``, ``model_vote``).  They
all share one computation — score each candidate from a CALeC view and a
text-LM view, combine, cross-entropy over 4 — and differ only in the
combine rule and the loss.  Here those degrees of freedom are a config:

- ``fusion``:
    * ``concat``      — Linear(Dc+Dr → 1) on concatenated CLS vectors
                        (dual_ensemble_model :45-80)
    * ``add``         — two per-view Linear(·→1) heads, logits summed
                        (dual_ensemble_model_add :82-122)
    * ``logit_add``   — plain sum of externally-computed per-view logits
                        (ensemble_model_t2 :603-661)
    * ``learned_add`` — per-view learnable scalar gates on the logits
                        (ensemble_model_t3 "learned adder" :663-726)
- ``loss``:
    * ``ce``          — CrossEntropy over the 4-way logits (all variants)
    * ``hinge``       — pairwise margin loss: relu(m + p_i − p_gold) summed
                        (dual_ensemble_model_pairwise :124-181)
    * ``ce+hinge``    — both (dual_ensemble_model_doubleloss :183-247,
                        margin 0.5)

``VoteEnsemble`` covers ``model_vote`` (:859-869): a Linear over the
stacked per-model choice logits.  The CLIP-gated variants (_t1, _clip,
clip_model*, dual_ensemble_model_clip) live in models/clip_ensemble.py,
rebuilt over precomputed CLIP embeddings.  ``DualEnsembleModel`` with
``text_view="gpt2"`` is ``dual_ensemble_model_gpt`` (:249-287).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_context_reasoning_tpu.models.modcr import soft_cross_entropy


class EnsembleOutput(NamedTuple):
    loss: Optional[jnp.ndarray]
    logits: jnp.ndarray          # [Q, num_labels]


def pairwise_hinge_loss(
    logits: jnp.ndarray,      # [Q, K]
    targets: jnp.ndarray,     # [Q, K] multi-hot
    margin: float = 0.5,
    *,
    use_probs: bool = False,
) -> jnp.ndarray:
    """relu(margin + s_i − s_gold) summed over all (i, gold) pairs.

    ``use_probs=False`` (default) applies the margin to RAW logits — the
    pure-hinge ablation ``dual_ensemble_model_pairwise``
    (modeling_ensemble.py:161-176).  ``use_probs=True`` softmaxes first —
    the ``dual_ensemble_model_doubleloss`` variant (:218-238)."""
    scores = logits.astype(jnp.float32)
    if use_probs:
        scores = jax.nn.softmax(scores, axis=-1)
    gold = jnp.sum(scores * targets, axis=-1, keepdims=True) / jnp.maximum(
        jnp.sum(targets, axis=-1, keepdims=True), 1.0
    )
    return jnp.sum(jax.nn.relu(margin + scores - gold))


class CandidateEnsemble(nn.Module):
    """Combine per-candidate view vectors (or logits) into 4-way logits."""

    num_labels: int = 4
    fusion: str = "concat"          # concat | add | logit_add | learned_add
    loss: str = "ce"                # ce | hinge | ce+hinge
    margin: float = 0.5

    @nn.compact
    def __call__(
        self,
        views: Dict[str, jnp.ndarray],
        label: Optional[jnp.ndarray] = None,   # [Q*K] multi-hot targets
    ) -> EnsembleOutput:
        """``views``: for concat/add — {name: [Q*K, D_name] CLS vectors};
        for logit_add/learned_add — {name: [Q*K, 1] or [Q, K] logits}."""
        K = self.num_labels
        if self.fusion == "concat":
            x = jnp.concatenate(list(views.values()), axis=-1)
            logits = nn.Dense(1, name="classifier")(x).reshape(-1, K)
        elif self.fusion == "add":
            per = [
                nn.Dense(1, name=f"classifier_{k}")(v) for k, v in views.items()
            ]
            logits = sum(per).reshape(-1, K)
        elif self.fusion == "logit_add":
            logits = sum(v.reshape(-1, K) for v in views.values())
        elif self.fusion == "learned_add":
            gates = self.param(
                "view_gates", nn.initializers.ones, (len(views),)
            )
            logits = sum(
                g * v.reshape(-1, K) for g, v in zip(gates, views.values())
            )
        else:
            raise ValueError(f"unknown fusion {self.fusion}")

        loss = None
        if label is not None:
            targets = label.reshape(-1, K)
            loss = jnp.asarray(0.0, jnp.float32)
            if "ce" in self.loss:
                loss = loss + soft_cross_entropy(logits, targets)
            if "hinge" in self.loss:
                # pure 'hinge' = pairwise ablation (raw logits);
                # 'ce+hinge' = doubleloss ablation (softmaxed probs)
                loss = loss + pairwise_hinge_loss(
                    logits, targets, self.margin,
                    use_probs=("ce" in self.loss),
                )
        return EnsembleOutput(loss=loss, logits=logits)


class VoteEnsemble(nn.Module):
    """model_vote (modeling_ensemble.py:859-869): learned vote over the
    choice logits of N upstream models."""

    num_labels: int = 4

    @nn.compact
    def __call__(
        self,
        model_logits: jnp.ndarray,            # [N_models, Q, K]
        label: Optional[jnp.ndarray] = None,  # [Q, K] multi-hot
    ) -> EnsembleOutput:
        N, Q, K = model_logits.shape
        x = jnp.transpose(model_logits, (1, 2, 0))       # [Q, K, N]
        logits = nn.Dense(1, name="vote")(x)[..., 0]     # [Q, K]
        loss = None
        if label is not None:
            loss = soft_cross_entropy(logits, label.reshape(Q, K))
        return EnsembleOutput(loss=loss, logits=logits)


class DualEnsembleModel(nn.Module):
    """Runnable CALeC + RoBERTa ensemble (dual_ensemble_model family,
    modeling_ensemble.py:45-247).

    Unlike the production :class:`~multimodal_context_reasoning_tpu.models.
    modcr.ModCRModel`, the reasoner here sees NO prefix — the two views are
    fused only at the CLS level through :class:`CandidateEnsemble`.  The
    batch schema is the same candidate-expanded dict.
    """

    config: "ModCRConfig"  # forward ref: core.config.ModCRConfig
    fusion: str = "concat"
    loss: str = "ce"
    # "roberta" (dual_ensemble_model :45) or "gpt2"
    # (dual_ensemble_model_gpt, modeling_ensemble.py:249-287): the text view
    # comes from a GPT-2 tower over the gpt-tokenized candidate stream.
    # The reference also forwards token_type_ids into its GPT-2 (ensemble
    # :268-269), but the _ensemble_gpt dataset emits all-zero segments
    # (Data/VCRChunkAlign.py:425-427) — a constant wte(0) shift on every
    # position — so the framework's GPT-2 (which takes no token types, like
    # modern HF GPT-2) drops it.
    text_view: str = "roberta"
    # Pooling for the gpt2 view. The reference takes gpt_output[:, 0, :]
    # (:273) — under GPT-2's CAUSAL attention that hidden state attends only
    # to the <bos> token, so the reference's text view is degenerate
    # (identical across candidates). "first" reproduces that exactly;
    # "last_real" (last non-pad position, the standard causal pooling) is
    # the non-degenerate choice.
    gpt_pool: str = "first"
    gpt2_config: Optional[object] = None  # core.config.GPT2Config override

    @nn.compact
    def __call__(self, batch, *, deterministic: bool = True):
        import jax.numpy as jnp

        from multimodal_context_reasoning_tpu.models.encoders import (
            ChunkAlignEncoder,
            GlobalImageEncoder,
        )
        from multimodal_context_reasoning_tpu.models.fusion import (
            ChunkAlignFusion,
        )
        from multimodal_context_reasoning_tpu.models.roberta import (
            PrefixRoberta,
        )
        from multimodal_context_reasoning_tpu.ops.chunk import (
            chunk_mask_from_gather_index,
        )

        c = self.config
        input_ids = batch["input_ids"]
        text_mask = batch["text_mask"]
        img_feat = batch["img_feat"]
        img_mask = batch["img_mask"]
        T = input_ids.shape[1]

        full_mask = jnp.concatenate([text_mask, img_mask], axis=-1)
        g = GlobalImageEncoder(c.global_encoder, name="global_enc")(
            input_ids, img_feat, full_mask,
            token_type_ids=batch.get("token_type_ids"),
            deterministic=deterministic,
        )
        chunk_mask = batch.get("chunk_mask")
        if chunk_mask is None:
            chunk_mask = chunk_mask_from_gather_index(
                batch["gather_index"], text_mask
            )
        s = ChunkAlignEncoder(c.seq_encoder, c.chunkalign, name="seq_enc")(
            input_ids, img_feat, text_mask, img_mask,
            chunk_mask, batch["gather_index"], c.max_chunks,
            token_type_ids=batch.get("token_type_ids"),
            deterministic=deterministic,
        )
        fused = ChunkAlignFusion(c.global_encoder, c.chunkalign, name="fusion")(
            g.sequence, g.pooled, s.sequence, s.pooled, s.chunk_hidden,
            s.attn_probs, text_mask, T,
            align_pos=batch.get("align_pos"),
            total_label=batch.get("total_label"),
            deterministic=deterministic,
        )
        if self.text_view == "gpt2":
            from multimodal_context_reasoning_tpu.core.config import GPT2Config
            from multimodal_context_reasoning_tpu.models.gpt2 import GPT2Decoder

            gcfg = self.gpt2_config or GPT2Config(
                n_embd=c.global_encoder.hidden_size,
                add_cross_attention=False,
            )
            ids = batch["r_input_ids"]
            mask = batch["r_attention_mask"]
            _, _, h = GPT2Decoder(gcfg, name="gpt")(
                ids, attn_mask=mask, deterministic=deterministic,
                output_hidden=True,
            )
            if self.gpt_pool == "first":
                text_cls = h[:, 0]                     # ensemble:273 verbatim
            elif self.gpt_pool == "last_real":
                last = jnp.maximum(
                    jnp.sum(mask, axis=-1).astype(jnp.int32) - 1, 0
                )
                text_cls = jnp.take_along_axis(
                    h, last[:, None, None], axis=1
                )[:, 0]
            else:
                raise ValueError(f"unknown gpt_pool {self.gpt_pool}")
        else:
            r = PrefixRoberta(c.roberta, name="roberta")(
                batch["r_input_ids"], batch["r_attention_mask"],
                token_type_ids=batch.get("r_token_type_ids"),
                deterministic=deterministic,
            )
            text_cls = r.pooled
        out = CandidateEnsemble(
            num_labels=c.num_labels, fusion=self.fusion, loss=self.loss,
            name="ensemble",
        )({"calec": fused.cls_ensem, self.text_view: text_cls},
          batch.get("label"))
        return out, fused.align_loss
