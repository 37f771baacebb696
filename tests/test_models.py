"""Model-level tests: shapes, determinism, freezing, prefix semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_context_reasoning_tpu.core.config import ModCRConfig
from multimodal_context_reasoning_tpu.models.modcr import ModCRModel, soft_cross_entropy
from multimodal_context_reasoning_tpu.models.roberta import (
    PrefixRoberta,
    roberta_position_ids,
)


def make_batch(cfg: ModCRConfig, n_examples: int = 2, seed: int = 0):
    """Synthetic candidate-expanded batch with the prod schema
    (Data/VCRChunkAlign.py:684-687 tuple fields, statically padded)."""
    rng = np.random.default_rng(seed)
    N = n_examples * cfg.num_labels
    T, I, R = cfg.text_len, cfg.img_len, cfg.roberta_len
    F = cfg.global_encoder.img_feature_dim

    text_len = rng.integers(6, T, size=N)
    input_ids = np.zeros((N, T), np.int32)
    text_mask = np.zeros((N, T), np.float32)
    gather_index = np.full((N, T), -1, np.int32)
    token_type_ids = np.zeros((N, T), np.int32)
    total_label = np.zeros((N, T), np.int32)
    align_pos = np.zeros((N, T), np.int32)
    for i in range(N):
        L = int(text_len[i])
        input_ids[i, :L] = rng.integers(4, cfg.global_encoder.vocab_size, size=L)
        input_ids[i, 0] = 1  # [CLS] — constant across rows (prod schema)
        text_mask[i, :L] = 1.0
        # chunks over positions 1..L-2, two tokens each
        cid = 0
        t = 1
        while t + 1 < L - 1 and cid < cfg.max_chunks:
            gather_index[i, t] = cid
            gather_index[i, t + 1] = cid
            t += 2
            cid += 1
        # a couple of alignment positions
        if L > 4:
            align_pos[i, 2] = 1
            total_label[i, 2] = int(rng.integers(0, I))

    from multimodal_context_reasoning_tpu.ops.chunk import chunk_mask_from_gather_index
    chunk_mask = np.asarray(
        chunk_mask_from_gather_index(jnp.asarray(gather_index), jnp.asarray(text_mask))
    )

    # one image per EXAMPLE, repeated across its candidate rows (the
    # production collate contract, Data/VCRChunkAlign.py:690-741)
    K = cfg.num_labels
    img_len_real = np.repeat(rng.integers(3, I + 1, size=n_examples), K)
    img_feat = np.repeat(
        rng.normal(size=(n_examples, I, F)).astype(np.float32), K, axis=0
    )
    img_mask = np.zeros((N, I), np.float32)
    for i in range(N):
        img_mask[i, : int(img_len_real[i])] = 1.0
        img_feat[i, int(img_len_real[i]):] = 0.0

    r_len = rng.integers(8, R, size=N)
    r_input_ids = np.full((N, R), cfg.roberta.pad_token_id, np.int32)
    r_mask = np.zeros((N, R), np.float32)
    for i in range(N):
        L = int(r_len[i])
        r_input_ids[i, :L] = rng.integers(4, cfg.roberta.vocab_size, size=L)
        r_mask[i, :L] = 1.0

    label = np.zeros((N,), np.float32)
    for e in range(n_examples):
        label[e * cfg.num_labels + int(rng.integers(0, cfg.num_labels))] = 1.0

    return {
        "input_ids": jnp.asarray(input_ids),
        "token_type_ids": jnp.asarray(token_type_ids),
        "text_mask": jnp.asarray(text_mask),
        "img_feat": jnp.asarray(img_feat),
        "img_mask": jnp.asarray(img_mask),
        "chunk_mask": jnp.asarray(chunk_mask),
        "gather_index": jnp.asarray(gather_index),
        "r_input_ids": jnp.asarray(r_input_ids),
        "r_token_type_ids": jnp.asarray(np.zeros((N, R), np.int32)),
        "r_attention_mask": jnp.asarray(r_mask),
        "total_label": jnp.asarray(total_label),
        "align_pos": jnp.asarray(align_pos),
        "label": jnp.asarray(label),
    }


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = ModCRConfig.tiny()
    model = ModCRModel(cfg)
    batch = make_batch(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    return cfg, model, batch, params


class TestModCRForward:
    def test_output_shapes_and_finiteness(self, tiny_setup):
        cfg, model, batch, params = tiny_setup
        out = model.apply(params, batch)
        assert out.logits.shape == (2, cfg.num_labels)
        assert np.isfinite(float(out.loss))
        assert np.isfinite(float(out.align_loss))
        assert np.all(np.isfinite(np.asarray(out.logits)))

    def test_deterministic_eval(self, tiny_setup):
        cfg, model, batch, params = tiny_setup
        a = model.apply(params, batch)
        b = model.apply(params, batch)
        np.testing.assert_array_equal(np.asarray(a.logits), np.asarray(b.logits))

    def test_vision_prefix_dedup_is_exact(self, tiny_setup):
        """dedup_vision_prefix runs the [CLS]+image pass once per example
        and repeats the prefix — same math on the same inputs (candidate
        rows share [CLS]+image), so logits match to float-reassociation
        noise (XLA tiles the [B/K] and [B] batches differently; ~1e-7)."""
        import dataclasses

        cfg, model, batch, params = tiny_setup
        assert cfg.dedup_vision_prefix  # the default
        on = model.apply(params, batch)
        model_off = ModCRModel(
            dataclasses.replace(cfg, dedup_vision_prefix=False)
        )
        off = model_off.apply(params, batch)
        np.testing.assert_allclose(
            np.asarray(on.logits), np.asarray(off.logits),
            rtol=1e-5, atol=1e-5,
        )

    def test_train_time_dedup_matches_full_pass(self, tiny_setup):
        """Train-path dedup (vision pass once per example when the global
        encoder is dropout-free) must reproduce the non-dedup loss AND
        gradients with the same dropout rng: rate-0 flax Dropout consumes
        no RNG, the repeat happens BEFORE the mapping network so its
        per-row dropout masks are drawn identically, and the RoBERTa
        dropout path is untouched."""
        import dataclasses

        cfg, model, batch, params = tiny_setup
        assert cfg.global_encoder.hidden_dropout_prob == 0.0
        cfg_d = dataclasses.replace(cfg, mapping_dropout=0.2)
        rng = {"dropout": jax.random.PRNGKey(7)}

        results = {}
        for name, flag in (("on", True), ("off", False)):
            m = ModCRModel(dataclasses.replace(cfg_d, dedup_vision_prefix=flag))

            def loss_fn(p):
                return m.apply(
                    p, batch, deterministic=False, rngs=rng
                ).loss

            results[name] = jax.value_and_grad(loss_fn)(params)

        np.testing.assert_allclose(
            float(results["on"][0]), float(results["off"][0]), rtol=1e-6
        )
        flat_on = jax.tree_util.tree_leaves(results["on"][1])
        flat_off = jax.tree_util.tree_leaves(results["off"][1])
        for a, b in zip(flat_on, flat_off):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-4, atol=1e-6,
            )

    def test_train_time_dedup_gated_off_when_encoder_stochastic(
        self, tiny_setup
    ):
        """With encoder dropout > 0 the train-path dedup must NOT fire
        (candidate rows need independent encoder noise). If the gate were
        broken, dedup-on would draw differently-shaped dropout masks than
        dedup-off and the logits would diverge at rate 0.5; equal logits
        prove both configs ran the identical full-pass program."""
        import dataclasses

        cfg, model, batch, params = tiny_setup
        enc = dataclasses.replace(
            cfg.global_encoder, hidden_dropout_prob=0.5,
            attention_probs_dropout_prob=0.5,
        )
        cfg_s = dataclasses.replace(cfg, global_encoder=enc)
        rng = {"dropout": jax.random.PRNGKey(3)}
        outs = {}
        for name, flag in (("on", True), ("off", False)):
            m = ModCRModel(dataclasses.replace(cfg_s, dedup_vision_prefix=flag))
            outs[name] = m.apply(params, batch, deterministic=False, rngs=rng)
        np.testing.assert_array_equal(
            np.asarray(outs["on"].logits), np.asarray(outs["off"].logits)
        )

    def test_encoder_gradients_are_zero_when_frozen(self, tiny_setup):
        cfg, model, batch, params = tiny_setup

        def loss_fn(p):
            return model.apply(p, batch).loss

        grads = jax.grad(loss_fn)(params)
        g = grads["params"]
        # frozen: both encoders get exactly zero gradient
        for mod in ("global_enc", "seq_enc"):
            leaves = jax.tree_util.tree_leaves(g[mod])
            assert all(float(jnp.max(jnp.abs(l))) == 0.0 for l in leaves), mod
        # trainable: mapping networks + roberta + scorer get nonzero grads
        for mod in ("mapping_network_vision", "mapping_network_alignment",
                    "roberta", "abst_confidence_scorer", "fusion"):
            leaves = jax.tree_util.tree_leaves(g[mod])
            total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
            assert total > 0.0, mod

    def test_padding_invariance_of_logits(self, tiny_setup):
        """Extending image padding must not change the logits (static-shape
        correctness — the padded regions are masked out everywhere)."""
        cfg, model, batch, params = tiny_setup
        out1 = model.apply(params, batch)

        wider = dict(batch)
        extra = 4
        N, I, F = batch["img_feat"].shape
        wider["img_feat"] = jnp.concatenate(
            [batch["img_feat"], jnp.zeros((N, extra, F))], axis=1
        )
        wider["img_mask"] = jnp.concatenate(
            [batch["img_mask"], jnp.zeros((N, extra))], axis=1
        )
        # total_label indexes image columns; unchanged labels still valid
        out2 = model.apply(params, wider)
        np.testing.assert_allclose(
            np.asarray(out1.logits), np.asarray(out2.logits), rtol=2e-4, atol=2e-4
        )


class TestSoftCE:
    def test_matches_manual(self):
        logits = jnp.asarray([[2.0, 1.0, 0.0, -1.0], [0.0, 0.0, 0.0, 0.0]])
        targets = jnp.asarray([[1.0, 0.0, 0.0, 0.0], [0.5, 0.5, 0.0, 0.0]])
        got = float(soft_cross_entropy(logits, targets))
        logp = np.log(np.exp(np.asarray(logits)) / np.exp(np.asarray(logits)).sum(-1, keepdims=True))
        want = -np.mean((np.asarray(targets) * logp).sum(-1))
        assert abs(got - want) < 1e-4


class TestPrefixRoberta:
    def test_position_ids(self):
        ids = jnp.asarray([[0, 5, 6, 1, 1]])  # pad_token_id=1
        pos = np.asarray(roberta_position_ids(ids, 1))
        np.testing.assert_array_equal(pos, [[2, 3, 4, 1, 1]])

    def test_prefix_changes_output_but_not_shapes(self):
        from multimodal_context_reasoning_tpu.core.config import RobertaConfig

        cfg = RobertaConfig(
            vocab_size=100, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            max_position_embeddings=64,
        )
        model = PrefixRoberta(cfg)
        ids = jnp.asarray(np.random.default_rng(0).integers(4, 100, size=(2, 10)))
        mask = jnp.ones((2, 10))
        prefix = jnp.asarray(np.random.default_rng(1).normal(size=(2, 4, 32)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), ids, mask,
                            prompt_embeddings=prefix)
        out_p = model.apply(params, ids, mask, prompt_embeddings=prefix)
        out_n = model.apply(params, ids, mask)
        assert out_p.sequence.shape == out_n.sequence.shape == (2, 10, 32)
        # prefix must influence the output
        assert float(jnp.max(jnp.abs(out_p.sequence - out_n.sequence))) > 1e-4

    def test_masked_prefix_slot_is_inert(self):
        """A prefix slot with mask 0 must not affect anything."""
        from multimodal_context_reasoning_tpu.core.config import RobertaConfig

        cfg = RobertaConfig(
            vocab_size=100, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            max_position_embeddings=64,
        )
        model = PrefixRoberta(cfg)
        ids = jnp.asarray(np.random.default_rng(0).integers(4, 100, size=(1, 8)))
        mask = jnp.ones((1, 8))
        rng = np.random.default_rng(2)
        prefix_a = jnp.asarray(rng.normal(size=(1, 3, 32)), jnp.float32)
        prefix_b = np.asarray(prefix_a).copy()
        prefix_b[:, 2] = 99.0  # garbage in the masked slot
        pmask = jnp.asarray([[1.0, 1.0, 0.0]])
        params = model.init(jax.random.PRNGKey(0), ids, mask,
                            prompt_embeddings=prefix_a, prompt_mask=pmask)
        out_a = model.apply(params, ids, mask, prompt_embeddings=prefix_a,
                            prompt_mask=pmask)
        out_b = model.apply(params, ids, mask, prompt_embeddings=jnp.asarray(prefix_b),
                            prompt_mask=pmask)
        np.testing.assert_allclose(
            np.asarray(out_a.sequence), np.asarray(out_b.sequence), atol=1e-5
        )
