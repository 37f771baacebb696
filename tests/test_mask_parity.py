"""Stage-mask parity oracle.

Reimplements the reference's *imperative* mask mutations
(CaptionBertEncoder.forward, modeling_vcr_chunkalign_v10.py:177-206) in
plain numpy, literally step by step, and requires our precomputed stage
biases (ops/masks.py) to match bit-for-bit on random inputs.  This is the
strongest evidence for SURVEY §7 hard-part 1 ("byte-exact parity with the
three mask regimes").
"""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_context_reasoning_tpu.ops.masks import build_stage_biases

NEG = -10000.0


def reference_stage_masks(text_mask, img_mask, chunk_mask):
    """Literal numpy transcription of the reference schedule.

    Inputs are {0,1}; the reference first builds additive extended masks
    (SeqBertImgModel.forward :289-315):
      extended_input_mask  = (1 - [text‖img]) * -10000        [B,1,1,L]
      extended_attention   = (1 - chunk_mask) * -10000        [B,1,T,T]
      extended_img_mask    = (1 - img_mask) * -10000          [B,1,1,I]
    then mutates per stage (CaptionBertEncoder.forward :177-206).
    """
    B, T = text_mask.shape
    I = img_mask.shape[1]
    L = T + I

    full = np.concatenate([text_mask, img_mask], axis=1)        # [B, L]
    ext_input = ((1.0 - full) * NEG)[:, None, None, :]          # [B,1,1,L]
    ext_chunk = ((1.0 - chunk_mask) * NEG)[:, None]             # [B,1,T,T]

    # stage 1 (:179-183): input_mask broadcast to rows, text-text block
    # overwritten with the chunk mask, img->text rows hard -10000
    m1 = np.tile(ext_input, (1, 1, L, 1))
    m1[:, :, :T, :T] = ext_chunk
    m1[:, :, T:, :T] = NEG

    # stage 2 (:190-191): plain extended input mask
    m2 = ext_input.copy()

    # stage 3 (:196-206): rebuild from input_mask rows; image rows become
    # [ -10000 over text | (1-eye)*-10000 ]; text-text block = chunk mask
    eye = np.eye(I)[None].repeat(B, axis=0)                     # [B,I,I]
    img_rows = np.concatenate([np.zeros((B, I, T)), eye], axis=-1)
    img_rows = (1.0 - img_rows) * NEG                           # [B,I,L]
    m3 = np.tile(ext_input, (1, 1, L, 1))
    m3[:, 0, T:, :] = img_rows
    m3[:, :, :T, :T] = ext_chunk
    return m1, m2, m3


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_stage_biases_match_reference_oracle(seed):
    rng = np.random.default_rng(seed)
    B, T, I = 3, 9, 5
    text_len = rng.integers(4, T + 1, size=B)
    img_len = rng.integers(1, I + 1, size=B)
    text_mask = (np.arange(T)[None] < text_len[:, None]).astype(np.float32)
    img_mask = (np.arange(I)[None] < img_len[:, None]).astype(np.float32)

    # random symmetric-ish chunk mask over real tokens (content irrelevant —
    # the schedule copies it verbatim into the text-text block)
    chunk_mask = (rng.random((B, T, T)) > 0.5).astype(np.float32)
    chunk_mask *= text_mask[:, :, None] * text_mask[:, None, :]

    m1, m2, m3 = reference_stage_masks(text_mask, img_mask, chunk_mask)
    b1, b2, b3 = build_stage_biases(
        jnp.asarray(text_mask), jnp.asarray(img_mask), jnp.asarray(chunk_mask)
    )

    np.testing.assert_array_equal(np.asarray(b1), m1)
    # our stage-2 bias is [B,1,1,L] broadcastable — same values
    np.testing.assert_array_equal(np.asarray(b2), m2)
    np.testing.assert_array_equal(np.asarray(b3), m3)


class TestAlignmentLossOracle:
    """Transcribes the reference alignment loss (v10.py:981-987) in numpy
    and requires ChunkAlignFusion to reproduce it."""

    def test_align_loss_matches_oracle(self):
        import jax

        from multimodal_context_reasoning_tpu.core.config import (
            ChunkAlignConfig,
            EncoderConfig,
        )
        from multimodal_context_reasoning_tpu.models.fusion import (
            ChunkAlignFusion,
        )

        rng = np.random.default_rng(0)
        B, T, I, H, D = 2, 6, 4, 2, 16
        L = T + I
        enc = EncoderConfig(
            vocab_size=32, hidden_size=D, num_hidden_layers=1,
            num_attention_heads=H, intermediate_size=32,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        )
        fusion = ChunkAlignFusion(enc, ChunkAlignConfig(cls_layer_num=1))

        seq = rng.normal(size=(B, L, D)).astype(np.float32)
        cls = rng.normal(size=(B, D)).astype(np.float32)
        # 3 cross-modal layers of attention probs; zero out some img columns
        # to exercise the ==0 re-mask
        attn = rng.random((B, 3, H, L, L)).astype(np.float32)
        attn[:, :, :, :, T + 2:] = 0.0
        text_mask = np.ones((B, T), np.float32)
        align_pos = np.zeros((B, T), np.int32)
        total_label = np.zeros((B, T), np.int32)
        align_pos[0, 2] = 1
        total_label[0, 2] = 1
        align_pos[1, 3] = 1
        total_label[1, 3] = 0

        params = fusion.init(
            jax.random.PRNGKey(0),
            jnp.asarray(seq), jnp.asarray(cls), jnp.asarray(seq),
            jnp.asarray(cls), jnp.asarray(seq), jnp.asarray(attn),
            jnp.asarray(text_mask), T,
            align_pos=jnp.asarray(align_pos),
            total_label=jnp.asarray(total_label),
        )
        out = fusion.apply(
            params,
            jnp.asarray(seq), jnp.asarray(cls), jnp.asarray(seq),
            jnp.asarray(cls), jnp.asarray(seq), jnp.asarray(attn),
            jnp.asarray(text_mask), T,
            align_pos=jnp.asarray(align_pos),
            total_label=jnp.asarray(total_label),
        )

        # --- numpy oracle (torch semantics): stack(last3).sum(1).sum(1),
        # take [:, :T, T:], masked_fill(==0, -1e5), softmax, CE at align_pos
        w = attn[:, -3:].sum(axis=1).sum(axis=1)[:, :T, T:]     # [B, T, I]
        w = np.where(w == 0.0, -1e5, w)
        e = np.exp(w - w.max(-1, keepdims=True))
        sm = e / e.sum(-1, keepdims=True)
        # CrossEntropyLoss over the softmaxed map treated as logits
        picked = []
        for b in range(B):
            for t in range(T):
                if align_pos[b, t] == 1:
                    z = sm[b, t]
                    lse = np.log(np.exp(z - z.max()).sum()) + z.max()
                    picked.append(-(z[total_label[b, t]] - lse))
        want = float(np.mean(picked))
        np.testing.assert_allclose(float(out.align_loss), want, rtol=1e-5)
