"""Rationale generation: candidate classification + GPT-2 explanation decode.

Rebuilds the ``ChunkAlign_CLS_dec5_4`` family
(modeling_vcr_chunkalign_v10.py:1319-1494, beam variants :2039-2320):

- global + ChunkAlign sequence encoders (trainable in this family, unlike
  the frozen prod ModCR path), CLS fusion through ``cls_ensemble``
  (Linear(2D→D)) and ``cls_layer_num`` reasoning layers over the
  3×(T-1) ``[global_hypo ‖ chunk_align ‖ chunk_hidden]`` memory — this
  variant *does* mask padded memory (:1369-1372);
- ``classifier: Linear(D, 2)`` per-candidate binary logits, CE against the
  flat binary target, and :func:`binary_to_mp` for the 4-way decision
  (:363-373);
- a GPT-2 cross-attention decoder generating the explanation for each
  question's *gold* candidate row: the decoder memory is
  ``[seq_hypo ‖ global_hypo ‖ chunk_hidden]`` (note the order differs from
  the cls memory, :1384-1387), detached, gathered at ``label`` (:1391-1398);
  teacher-forced XE ignoring pad (:1407-1411).

The reasoning layers return their attention maps so beam constraints can be
extracted (generation/constraints.py; reference :2107-2112 sums ClsLayer
attentions to rank tokens).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_context_reasoning_tpu.core.config import (
    ChunkAlignConfig,
    EncoderConfig,
    GPT2Config,
)
from multimodal_context_reasoning_tpu.models.encoders import (
    ChunkAlignEncoder,
    GlobalImageEncoder,
)
from multimodal_context_reasoning_tpu.models.gpt2 import GPT2Decoder
from multimodal_context_reasoning_tpu.models.layers import FeedForward
from multimodal_context_reasoning_tpu.ops.masks import NEG_INF


def rationale_init_batch(
    encoder_config: EncoderConfig,
    gpt2_config: GPT2Config,
    spec,                       # BatchSpec (duck-typed: text_len/img_len)
    *,
    rows: int = 4,
    expl_len: int = 8,
    seed: int = 0,
) -> Dict:
    """One representative input batch for ``RationaleModel.init``.

    Single source for the init recipe (cli/serve.py, scripts/
    bench_generate.py): the ``expl_ids``/``expl_mask`` stream MUST be
    present so the GPT-2 decoder branch is traced — without it the init'd
    tree has no ``"dec"`` subtree and the serving generator's constructor
    rejects the params.  The explanation stream is per-QUESTION (one row),
    while the classify stream carries the question's ``rows`` candidate
    rows.  Host numpy on purpose: usable for both ``jax.jit(model.init)``
    and shape-only ``jax.eval_shape`` templates.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    B, T, I = rows, spec.text_len, spec.img_len
    return {
        "input_ids": np.asarray(
            rng.integers(4, encoder_config.vocab_size, size=(B, T)), np.int32
        ),
        "text_mask": np.ones((B, T), np.float32),
        "img_feat": rng.normal(
            size=(B, I, encoder_config.img_feature_dim)
        ).astype(np.float32),
        "img_mask": np.ones((B, I), np.float32),
        "chunk_mask": np.ones((B, T, T), np.float32),
        "gather_index": np.full((B, T), -1, np.int32),
        "expl_ids": np.asarray(
            rng.integers(2, gpt2_config.vocab_size, size=(1, expl_len)),
            np.int32,
        ),
        "expl_mask": np.ones((1, expl_len), np.float32),
    }


def binary_to_mp(logits: jnp.ndarray, num_labels: int = 4) -> jnp.ndarray:
    """Per-candidate binary logits → multiple-choice probabilities.

    softmax over {false,true}, take P(true), reshape (-1, num_labels)
    (modeling_vcr_chunkalign_v10.py:363-373).
    """
    p_true = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., 1]
    return p_true.reshape(-1, num_labels)


class ClsReasonLayer(nn.Module):
    """Single-query cross-attention of the CLS over a memory + BERT FFN.

    ClsLayer2, rebuilt to its EXACT attention form (v10.py:801-837):
    SINGLE-head, raw (unscaled — no 1/sqrt(d), only ``tau``) dot product of
    the projected CLS query against ``align_k_proj(memory)``, whose output
    serves as BOTH keys and values (:818-821 — ``self_chunk_align_v`` is a
    clone of the k-projection); optional ``neg`` takes 1−softmax (:824-827);
    both the attention weights and the context output use
    ``hidden_dropout_prob`` (the reference reuses one Dropout module);
    dense + residual + LN + BertIntermediate/Output FFN. Returns the
    (post-dropout, as the reference does) attention weights for the beam
    constraint extraction (v10.py:2107-2133).
    """

    config: EncoderConfig

    @nn.compact
    def __call__(
        self,
        memory: jnp.ndarray,                 # [B, M, D]
        cls: jnp.ndarray,                    # [B, D]
        memory_bias: Optional[jnp.ndarray],  # [B, 1, 1, M] additive
        *,
        deterministic: bool = True,
        tau: float = 1.0,
        neg: bool = False,
    ):
        c = self.config
        dt = c.jnp_dtype
        D = c.hidden_size

        q = nn.Dense(D, dtype=dt, name="cls_q_proj")(cls[:, None, :])
        kv = nn.Dense(D, dtype=dt, name="align_k_proj")(memory)
        scores = jnp.einsum("bqd,bmd->bqm", q, kv).astype(jnp.float32)
        if memory_bias is not None:
            scores = scores + memory_bias[:, 0].astype(jnp.float32)
        probs = jax.nn.softmax(scores / tau, axis=-1)
        if neg:
            probs = 1.0 - probs
        probs = nn.Dropout(c.hidden_dropout_prob)(
            probs, deterministic=deterministic
        )
        ctx = jnp.einsum("bqm,bmd->bqd", probs.astype(kv.dtype), kv)[:, 0]
        out = nn.Dense(D, dtype=dt, name="dense")(ctx)
        out = nn.Dropout(c.hidden_dropout_prob)(out, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=dt, name="layer_norm")(out + cls)
        h = FeedForward(c, name="ffn")(h[:, None, :], deterministic=deterministic)[:, 0]
        return h, probs[:, 0, :]


class RationaleOutput(NamedTuple):
    gen_loss: jnp.ndarray       # scalar teacher-forcing XE
    cls_loss: jnp.ndarray       # scalar binary CE
    mp_probs: jnp.ndarray       # [Q, num_labels] choice probabilities
    cls_attn: jnp.ndarray       # [B, M] summed reasoning-layer attention
    decoder_memory: jnp.ndarray  # [Q, 3(T-1), D] gold-candidate memory
    decoder_memory_mask: jnp.ndarray  # [Q, 3(T-1)]


class RationaleModel(nn.Module):
    config: EncoderConfig
    schedule: ChunkAlignConfig
    gpt2: GPT2Config
    num_labels: int = 4
    cls_layer_num: int = 3       # v10.py:1330
    max_chunks: int = 40

    @nn.compact
    def __call__(
        self,
        batch: Dict[str, jnp.ndarray],
        *,
        deterministic: bool = True,
    ) -> RationaleOutput:
        c = self.config
        input_ids = batch["input_ids"]       # [B, T] (B = Q·num_labels)
        text_mask = batch["text_mask"]       # [B, T]
        img_feat = batch["img_feat"]
        img_mask = batch["img_mask"]
        B, T = input_ids.shape

        import dataclasses

        global_enc = GlobalImageEncoder(c, name="global_enc")
        seq_enc = ChunkAlignEncoder(c, self.schedule, name="seq_enc")
        # the rationale family trains a separate UNTIED lm_head
        # (v10.py:1335-1336), not HF GPT-2's tied head
        dec = GPT2Decoder(
            dataclasses.replace(self.gpt2, tie_word_embeddings=False),
            name="dec",
        )

        full_mask = jnp.concatenate([text_mask, img_mask], axis=-1)
        g = global_enc(
            input_ids, img_feat, full_mask,
            token_type_ids=batch.get("token_type_ids"),
            deterministic=deterministic,
        )
        s = seq_enc(
            input_ids, img_feat, text_mask, img_mask,
            batch["chunk_mask"], batch["gather_index"], self.max_chunks,
            token_type_ids=batch.get("token_type_ids"),
            deterministic=deterministic,
        )

        cls = nn.Dense(c.hidden_size, dtype=c.jnp_dtype, name="cls_ensemble")(
            jnp.concatenate([g.pooled, s.pooled], axis=-1)
        )
        # cls-layer memory: [global ‖ seq ‖ chunk_hidden] over positions 1..T-1
        memory = jnp.concatenate(
            [g.sequence[:, 1:T], s.sequence[:, 1:T], s.chunk_hidden[:, 1:T]], axis=1
        )
        word = text_mask[:, 1:T].astype(jnp.float32)
        tri_mask = jnp.concatenate([word, word, word], axis=-1)
        memory_bias = ((1.0 - tri_mask) * NEG_INF)[:, None, None, :]

        attn_sum = jnp.zeros(memory.shape[:2], jnp.float32)
        for i in range(self.cls_layer_num):
            cls, probs = ClsReasonLayer(c, name=f"cls_layer_{i}")(
                memory, cls, memory_bias, deterministic=deterministic
            )
            attn_sum = attn_sum + probs.astype(jnp.float32)

        logits = nn.Dense(2, dtype=c.jnp_dtype, name="classifier")(cls)  # [B, 2]

        cls_loss = jnp.asarray(0.0, jnp.float32)
        label = batch.get("label")
        if label is not None:
            lbl = label.reshape(-1).astype(jnp.int32)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            cls_loss = -jnp.mean(jnp.take_along_axis(logp, lbl[:, None], axis=1))
        mp_probs = binary_to_mp(logits, self.num_labels)

        # ---- Decoder memory: gold-candidate row per question (:1384-1398).
        dec_memory = jax.lax.stop_gradient(jnp.concatenate(
            [s.sequence[:, 1:T], g.sequence[:, 1:T], s.chunk_hidden[:, 1:T]],
            axis=1,
        ))
        dec_mask = tri_mask
        Q = B // self.num_labels
        if label is not None:
            gold = jnp.argmax(label.reshape(Q, self.num_labels), axis=-1)
        else:
            gold = jnp.argmax(mp_probs, axis=-1)
        rows = jnp.arange(Q) * self.num_labels + gold
        mem_q = dec_memory[rows]
        mask_q = dec_mask[rows]

        gen_loss = jnp.asarray(0.0, jnp.float32)
        if "expl_ids" in batch:
            # expl streams are per-question (reference keeps only candidate 0
            # of each 4-row group, :1399-1401)
            expl = batch["expl_ids"]            # [Q, Lg]
            expl_mask = batch.get("expl_mask")  # [Q, Lg]
            gpt_labels = batch.get("gpt_labels", expl)
            lm_logits, _ = dec(
                expl,
                memory=mem_q.astype(jnp.float32),
                memory_mask=mask_q,
                attn_mask=expl_mask,
                deterministic=deterministic,
            )
            shift_logits = lm_logits[:, :-1]
            shift_labels = gpt_labels[:, 1:]
            logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(logp, shift_labels[..., None], axis=-1)[..., 0]
            keep = (shift_labels != self.gpt2.pad_token_id).astype(jnp.float32)
            gen_loss = jnp.sum(nll * keep) / jnp.maximum(jnp.sum(keep), 1.0)

        return RationaleOutput(
            gen_loss=gen_loss,
            cls_loss=cls_loss,
            mp_probs=mp_probs,
            cls_attn=attn_sum,
            decoder_memory=mem_q,
            decoder_memory_mask=mask_q,
        )


class RationaleTrainOutput(NamedTuple):
    loss: jnp.ndarray        # optimized scalar: cls CE + gen_weight × XE
    align_loss: jnp.ndarray  # 0 — this family has no alignment term
    logits: jnp.ndarray      # [Q, num_labels] log choice probabilities
    gen_loss: jnp.ndarray
    cls_loss: jnp.ndarray


class RationaleForTraining:
    """Trainer-interface facade over :class:`RationaleModel`.

    The reference ships the rationale family as modules only — no training
    entry point exists in its repo, and the forward returns the two losses
    separately (``gen_loss, loss_cls_0, matched_0``,
    modeling_vcr_chunkalign_v10.py:1408).  This facade sums them —
    ``cls CE + gen_weight × teacher-forcing XE`` — and exposes the
    ``loss / logits / align_loss`` contract ``train/step.py`` expects, so
    ``Trainer.fit`` drives the family unchanged.  ``init``/``apply``
    DELEGATE to the wrapped module: the param tree is exactly
    ``RationaleModel``'s, so trained checkpoints interchange freely with
    the serving generator and the torch bridge
    (interop/assemble.py::assemble_rationale_params / export).
    """

    def __init__(self, model: RationaleModel, *, gen_weight: float = 1.0):
        self.model = model
        self.gen_weight = gen_weight

    def init(self, rng, inputs):
        return self.model.init(rng, inputs)

    def apply(self, params, inputs, *, deterministic: bool = True,
              rngs=None):
        out = self.model.apply(
            params, inputs, deterministic=deterministic, rngs=rngs
        )
        loss = out.cls_loss + self.gen_weight * out.gen_loss
        # mp_probs are the 4-way choice probabilities; log keeps the
        # argmax semantics _metrics needs and stays finite for pad rows
        logits = jnp.log(jnp.maximum(out.mp_probs, 1e-20))
        return RationaleTrainOutput(
            loss=loss,
            align_loss=jnp.zeros_like(loss),
            logits=logits,
            gen_loss=out.gen_loss,
            cls_loss=out.cls_loss,
        )
