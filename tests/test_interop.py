"""Checkpoint-bridge golden tests: convert tiny randomly-initialized
HuggingFace *torch* models and require numerical parity with our Flax
modules (SURVEY.md §7 hard-part 3: conversion fidelity)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from multimodal_context_reasoning_tpu.core.config import (
    EncoderConfig,
    GPT2Config,
    RobertaConfig,
)
from multimodal_context_reasoning_tpu.interop.torch_bridge import (
    convert_bert_encoder,
    convert_gpt2,
    convert_roberta,
    delete_keys_matching,
    merge_into,
    resize_token_embeddings,
    strip_prefix,
)
from multimodal_context_reasoning_tpu.models.encoders import GlobalImageEncoder
from multimodal_context_reasoning_tpu.models.gpt2 import GPT2Decoder
from multimodal_context_reasoning_tpu.models.roberta import PrefixRoberta

H, L_LAYERS, HEADS, FF = 32, 2, 4, 64
T, B = 10, 2


def _np_sd(model) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


class TestBertBridge:
    def test_parity_with_hf_bert(self):
        hf_cfg = transformers.BertConfig(
            vocab_size=100, hidden_size=H, num_hidden_layers=L_LAYERS,
            num_attention_heads=HEADS, intermediate_size=FF,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            max_position_embeddings=64,
        )
        hf = transformers.BertModel(hf_cfg).eval()

        cfg = EncoderConfig(
            vocab_size=100, hidden_size=H, num_hidden_layers=L_LAYERS,
            num_attention_heads=HEADS, intermediate_size=FF,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            max_position_embeddings=64, img_feature_dim=8,
        )
        model = GlobalImageEncoder(cfg)

        rng = np.random.default_rng(0)
        ids = rng.integers(1, 100, size=(B, T))
        I = 3
        img = np.zeros((B, I, 8), np.float32)
        mask = np.concatenate([np.ones((B, T)), np.zeros((B, I))], axis=1)

        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(ids, jnp.int32),
            jnp.asarray(img), jnp.asarray(mask, jnp.float32),
        )
        params = jax.tree_util.tree_map(np.asarray, params)
        tree = convert_bert_encoder(_np_sd(hf), L_LAYERS)
        merge_into(params, tree["img_text_embeddings"], ("img_text_embeddings",))
        for i in range(L_LAYERS):
            merge_into(params, tree[f"layer_{i}"], (f"layer_{i}",))
        merge_into(params, tree["pooler"], ("pooler",))

        out = model.apply(
            params, jnp.asarray(ids, jnp.int32), jnp.asarray(img),
            jnp.asarray(mask, jnp.float32),
        )
        with torch.no_grad():
            ref = hf(
                input_ids=torch.tensor(ids),
                attention_mask=torch.ones(B, T, dtype=torch.long),
            )
        np.testing.assert_allclose(
            np.asarray(out.sequence[:, :T]),
            ref.last_hidden_state.numpy(), rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out.pooled), ref.pooler_output.numpy(),
            rtol=2e-4, atol=2e-4,
        )


class TestRobertaBridge:
    def test_parity_with_hf_roberta(self):
        hf_cfg = transformers.RobertaConfig(
            vocab_size=100, hidden_size=H, num_hidden_layers=L_LAYERS,
            num_attention_heads=HEADS, intermediate_size=FF,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            max_position_embeddings=64, pad_token_id=1, type_vocab_size=1,
        )
        hf = transformers.RobertaModel(hf_cfg).eval()

        cfg = RobertaConfig(
            vocab_size=100, hidden_size=H, num_hidden_layers=L_LAYERS,
            num_attention_heads=HEADS, intermediate_size=FF,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            max_position_embeddings=64,
        )
        model = PrefixRoberta(cfg)
        rng = np.random.default_rng(1)
        ids = rng.integers(2, 100, size=(B, T))
        mask = np.ones((B, T), np.float32)

        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(ids, jnp.int32), jnp.asarray(mask)
        )
        params = jax.tree_util.tree_map(np.asarray, params)
        tree = convert_roberta(_np_sd(hf), L_LAYERS)
        # zero the re-initialised token-type table for exact parity with
        # HF's (single, zero-indexed) token type embedding:
        hf_tt = _np_sd(hf)["embeddings.token_type_embeddings.weight"]
        tree["embeddings"]["token_type_embeddings"]["embedding"] = np.concatenate(
            [hf_tt, hf_tt], axis=0
        )
        for k in list(tree):
            merge_into(params, tree[k], (k,))

        out = model.apply(params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask))
        with torch.no_grad():
            ref = hf(
                input_ids=torch.tensor(ids),
                attention_mask=torch.ones(B, T, dtype=torch.long),
            )
        np.testing.assert_allclose(
            np.asarray(out.sequence), ref.last_hidden_state.numpy(),
            rtol=2e-4, atol=2e-4,
        )


class TestGPT2Bridge:
    def test_parity_with_hf_gpt2(self):
        hf_cfg = transformers.GPT2Config(
            vocab_size=100, n_positions=64, n_embd=H, n_layer=L_LAYERS,
            n_head=HEADS, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
            add_cross_attention=True,
        )
        hf = transformers.GPT2LMHeadModel(hf_cfg).eval()

        cfg = GPT2Config(
            vocab_size=100, n_positions=64, n_embd=H, n_layer=L_LAYERS,
            n_head=HEADS, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
        )
        model = GPT2Decoder(cfg)
        rng = np.random.default_rng(2)
        ids = rng.integers(1, 100, size=(B, T))
        M = 4
        mem = rng.normal(size=(B, M, H)).astype(np.float32)

        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(ids, jnp.int32),
            memory=jnp.asarray(mem), memory_mask=jnp.ones((B, M)),
        )
        params = jax.tree_util.tree_map(np.asarray, params)
        tree = convert_gpt2(_np_sd(hf), L_LAYERS)
        for k in list(tree):
            merge_into(params, tree[k], (k,))

        logits, _ = model.apply(
            params, jnp.asarray(ids, jnp.int32),
            memory=jnp.asarray(mem), memory_mask=jnp.ones((B, M)),
        )
        with torch.no_grad():
            ref = hf(
                input_ids=torch.tensor(ids),
                encoder_hidden_states=torch.tensor(mem),
                encoder_attention_mask=torch.ones(B, M, dtype=torch.long),
            )
        np.testing.assert_allclose(
            np.asarray(logits), ref.logits.numpy(), rtol=3e-4, atol=3e-4
        )


class TestSurgery:
    def test_strip_prefix(self):
        sd = {"seq_enc.a": np.zeros(1), "other.b": np.ones(1)}
        out = strip_prefix(sd, "seq_enc.")
        assert list(out) == ["a"]

    def test_delete_keys(self):
        sd = {"mapping_network_vision.0.w": np.zeros(1),
              "classifier.w": np.zeros(1), "roberta.x": np.ones(1)}
        out = delete_keys_matching(
            sd, ("mapping_network_vision.", "mapping_network_alignment.",
                 "classifier.")
        )
        assert list(out) == ["roberta.x"]

    def test_resize_embeddings(self):
        emb = np.ones((10, 4), np.float32)
        out = resize_token_embeddings(emb, 13)
        assert out.shape == (13, 4)
        np.testing.assert_array_equal(out[:10], emb)
        assert np.abs(out[10:]).max() < 0.2  # small init
