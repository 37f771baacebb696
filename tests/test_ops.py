"""Golden-value tests for the core ops against hand-written numpy references.

The numpy oracles reimplement the reference's semantics directly from its
documented behavior (SURVEY.md §2.3): per-example python loops over offsets
for the chunk mean (modeling_vcr_chunkalign_v10.py:66-78) and imperative mask
assembly (v10.py:177-206)."""

import numpy as np
import jax.numpy as jnp
import pytest

from multimodal_context_reasoning_tpu.ops.masks import (
    NEG_INF,
    build_stage_biases,
    padding_bias,
)
from multimodal_context_reasoning_tpu.ops.chunk import (
    chunk_mask_from_gather_index,
    chunk_mean_scatter,
)


def np_chunk_mean(x, gather_index):
    """Oracle: ragged python-loop chunk mean (mirrors v10.py:66-78)."""
    out = x.copy()
    B, T, D = x.shape
    for b in range(B):
        ids = gather_index[b]
        for cid in set(int(i) for i in ids if i >= 0):
            pos = [t for t in range(T) if ids[t] == cid]
            mean = x[b, pos].mean(axis=0)
            for t in pos:
                out[b, t] = mean
    return out


class TestChunkMean:
    def test_matches_loop_oracle(self):
        rng = np.random.default_rng(0)
        B, T, D, C = 3, 12, 8, 5
        x = rng.normal(size=(B, T, D)).astype(np.float32)
        gi = np.full((B, T), -1, dtype=np.int32)
        # ex 0: chunks [1..3]→0, [4..5]→1; CLS(0), tail unassigned
        gi[0, 1:4] = 0
        gi[0, 4:6] = 1
        # ex 1: one big chunk
        gi[1, 1:9] = 0
        # ex 2: singleton chunks
        gi[2, 1] = 0
        gi[2, 2] = 1
        gi[2, 3] = 2

        got = np.asarray(chunk_mean_scatter(jnp.asarray(x), jnp.asarray(gi), C))
        want = np_chunk_mean(x, gi)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_unassigned_positions_unchanged(self):
        x = np.arange(24, dtype=np.float32).reshape(1, 6, 4)
        gi = np.full((1, 6), -1, dtype=np.int32)
        got = np.asarray(chunk_mean_scatter(jnp.asarray(x), jnp.asarray(gi), 4))
        np.testing.assert_array_equal(got, x)

    def test_mean_is_exact_for_uniform_chunk(self):
        x = np.zeros((1, 4, 2), np.float32)
        x[0, 1] = [2.0, 4.0]
        x[0, 2] = [4.0, 8.0]
        gi = np.array([[-1, 0, 0, -1]], np.int32)
        got = np.asarray(chunk_mean_scatter(jnp.asarray(x), jnp.asarray(gi), 2))
        np.testing.assert_allclose(got[0, 1], [3.0, 6.0])
        np.testing.assert_allclose(got[0, 2], [3.0, 6.0])
        np.testing.assert_allclose(got[0, 0], [0.0, 0.0])


class TestStageBiases:
    def _setup(self):
        B, T, I = 2, 5, 3
        text_mask = np.ones((B, T), np.float32)
        text_mask[1, 4] = 0.0
        img_mask = np.ones((B, I), np.float32)
        img_mask[1, 2] = 0.0
        chunk = np.zeros((B, T, T), np.float32)
        for b in range(B):
            chunk[b, 0, :] = text_mask[b]
            chunk[b, :, 0] = text_mask[b]
            np.fill_diagonal(chunk[b], text_mask[b])
        chunk[0, 1:3, 1:3] = 1.0
        return text_mask, img_mask, chunk

    def test_stage_one_semantics(self):
        text_mask, img_mask, chunk = self._setup()
        bc, bf, bx = build_stage_biases(
            jnp.asarray(text_mask), jnp.asarray(img_mask), jnp.asarray(chunk)
        )
        bc = np.asarray(bc)[:, 0]
        B, T, I = 2, 5, 3
        # text-text block equals the chunk additive mask
        np.testing.assert_allclose(bc[:, :T, :T], (1 - chunk) * NEG_INF)
        # text→img: padding-based
        assert bc[0, 0, T] == 0.0
        assert bc[1, 0, T + 2] == NEG_INF  # padded region col
        # img→text: always masked (v10.py:183)
        assert np.all(bc[:, T:, :T] == NEG_INF)
        # img→img: padding-based
        assert bc[1, T, T + 2] == NEG_INF
        assert bc[1, T, T] == 0.0

    def test_stage_two_is_padding_mask(self):
        text_mask, img_mask, chunk = self._setup()
        _, bf, _ = build_stage_biases(
            jnp.asarray(text_mask), jnp.asarray(img_mask), jnp.asarray(chunk)
        )
        full = np.concatenate([text_mask, img_mask], -1)
        np.testing.assert_allclose(np.asarray(bf)[:, 0, 0], (1 - full) * NEG_INF)

    def test_stage_three_img_rows_identity(self):
        text_mask, img_mask, chunk = self._setup()
        _, _, bx = build_stage_biases(
            jnp.asarray(text_mask), jnp.asarray(img_mask), jnp.asarray(chunk)
        )
        bx = np.asarray(bx)[:, 0]
        B, T, I = 2, 5, 3
        # image rows: only the diagonal visible — even padded regions
        # (reference builds torch.eye unconditionally, v10.py:199-204)
        for b in range(B):
            img_block = bx[b, T:, T:]
            np.testing.assert_allclose(img_block, (1 - np.eye(I)) * NEG_INF)
            assert np.all(bx[b, T:, :T] == NEG_INF)
        # text rows identical to stage one
        bc, _, _ = build_stage_biases(
            jnp.asarray(text_mask), jnp.asarray(img_mask), jnp.asarray(chunk)
        )
        np.testing.assert_allclose(bx[:, :T], np.asarray(bc)[:, 0, :T])

    def test_padding_bias(self):
        m = jnp.asarray([[1.0, 1.0, 0.0]])
        b = np.asarray(padding_bias(m))
        assert b.shape == (1, 1, 1, 3)
        np.testing.assert_allclose(b[0, 0, 0], [0.0, 0.0, NEG_INF])


class TestChunkMaskFromGatherIndex:
    def test_blocks_and_full_rows(self):
        """Reference builder semantics (GetChunk_v4_vcr.py:104-148): CLS and
        final-SEP get all-visible ROWS only (columns stay diagonal); O
        tokens see only themselves."""
        # [CLS, w1, w1, O, w2, SEP, pad]
        gi = np.array([[-1, 0, 0, -1, 1, -1, -1]], np.int32)
        tm = np.array([[1, 1, 1, 1, 1, 1, 0]], np.float32)
        m = np.asarray(chunk_mask_from_gather_index(jnp.asarray(gi), jnp.asarray(tm)))[0]
        # chunk block
        assert m[1, 2] == 1 and m[2, 1] == 1
        # cross-chunk not visible
        assert m[1, 4] == 0 and m[4, 1] == 0
        # CLS row sees all real; CLS column is NOT visible to interior tokens
        assert np.all(m[0, :6] == 1)
        assert m[1, 0] == 0 and m[4, 0] == 0
        # final-SEP row sees all real; its column is diagonal-only
        assert np.all(m[5, :6] == 1)
        assert m[1, 5] == 0
        # O token (pos 3) sees only itself
        assert m[3, 3] == 1 and m[3, 1] == 0 and m[3, 4] == 0
        # padding fully masked
        assert np.all(m[6] == 0) and np.all(m[:, 6] == 0)
        # diagonal for real tokens
        assert np.all(np.diag(m)[:6] == 1)

    def test_synthetic_batch_mirror_matches_op(self):
        """__graft_entry__._synthetic_batch's host-side numpy mask mirror
        must stay bit-identical to the device op it mirrors (ADVICE r1)."""
        from __graft_entry__ import _synthetic_batch
        from multimodal_context_reasoning_tpu.core.config import ModCRConfig

        cfg = ModCRConfig.tiny()
        batch = _synthetic_batch(cfg, n_examples=2)
        mirrored = np.asarray(batch["chunk_mask"])
        op = np.asarray(
            chunk_mask_from_gather_index(
                batch["gather_index"], batch["text_mask"]
            )
        )
        np.testing.assert_array_equal(mirrored, op)
