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


class TestExportRoundTrip:
    """interop/export.py: Flax params → reference Abstract_Specific state
    dict → assemble back into a fresh tree must reproduce the original
    exactly (and consume every exported key under strict accounting)."""

    @pytest.fixture(scope="class")
    def roundtrip(self):
        from __graft_entry__ import _synthetic_batch
        from multimodal_context_reasoning_tpu.core.config import ModCRConfig
        from multimodal_context_reasoning_tpu.interop.assemble import (
            assemble_modcr_params,
        )
        from multimodal_context_reasoning_tpu.interop.export import (
            export_modcr_state_dict,
        )
        from multimodal_context_reasoning_tpu.models.modcr import ModCRModel

        cfg = ModCRConfig.tiny()
        model = ModCRModel(cfg)
        batch = _synthetic_batch(cfg, 1)
        params = jax.tree.map(
            np.asarray, jax.jit(model.init)(jax.random.PRNGKey(0), batch)
        )
        sd = export_modcr_state_dict(params, cfg)
        fresh = jax.tree.map(
            np.asarray, jax.jit(model.init)(jax.random.PRNGKey(7), batch)
        )
        report = assemble_modcr_params(fresh, cfg, modcr_sd=sd, strict=True)
        return cfg, params, sd, fresh, report

    def test_every_exported_key_consumed(self, roundtrip):
        cfg, params, sd, fresh, report = roundtrip
        assert not report.unconsumed
        # the exported dict carries no dead-head keys, so nothing to skip
        # beyond the (absent) position-id buffers
        assert not report.skipped

    def test_tree_reproduced_exactly(self, roundtrip):
        cfg, params, sd, fresh, report = roundtrip
        flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
        flat_b = jax.tree_util.tree_flatten_with_path(fresh)[0]
        assert len(flat_a) == len(flat_b)
        for (ka, va), (kb, vb) in zip(flat_a, flat_b):
            assert ka == kb
            assert np.array_equal(np.asarray(va), np.asarray(vb)), (
                jax.tree_util.keystr(ka)
            )

    def test_torch_save_wrapper_roundtrip(self, roundtrip, tmp_path):
        """save_reference_checkpoint writes the reference's {'net': ...}
        torch.save form; load_torch_state_dict reads it back bit-exact."""
        from multimodal_context_reasoning_tpu.interop.export import (
            save_reference_checkpoint,
        )
        from multimodal_context_reasoning_tpu.interop.torch_bridge import (
            load_torch_state_dict,
        )

        cfg, params, sd, fresh, report = roundtrip
        path = str(tmp_path / "exported.pth")
        save_reference_checkpoint(path, params, cfg)
        back = load_torch_state_dict(path)
        assert set(back) == set(sd)
        for k in sd:
            assert np.array_equal(back[k], sd[k]), k


class TestExportCLI:
    def test_export_cli_from_orbax_checkpoint(self, tmp_path):
        """cli/export_reference: Orbax best-ckpt + config.json → the
        reference's {'net': ...} .pth, re-graftable with strict
        accounting."""
        from __graft_entry__ import _synthetic_batch
        from multimodal_context_reasoning_tpu.cli.export_reference import (
            main as export_main,
        )
        from multimodal_context_reasoning_tpu.core.config import (
            ModCRConfig, TrainConfig,
        )
        from multimodal_context_reasoning_tpu.interop.assemble import (
            assemble_modcr_params,
        )
        from multimodal_context_reasoning_tpu.interop.torch_bridge import (
            load_torch_state_dict,
        )
        from multimodal_context_reasoning_tpu.models.modcr import ModCRModel
        from multimodal_context_reasoning_tpu.train.checkpoint import (
            CheckpointManager, save_config,
        )
        from multimodal_context_reasoning_tpu.train.optim import make_optimizer
        from multimodal_context_reasoning_tpu.train.state import TrainState

        cfg = ModCRConfig.tiny()
        model = ModCRModel(cfg)
        batch = _synthetic_batch(cfg, 1)
        params = jax.jit(model.init)(jax.random.PRNGKey(3), batch)
        tx = make_optimizer(
            TrainConfig(scheduler="constant", per_device_batch_size=1),
            10, params,
        )
        state = TrainState.create(params, tx)
        run_dir = tmp_path / "run"
        mgr = CheckpointManager(str(run_dir / "ckpt"))
        mgr.save(state, metrics={"accuracy": 0.5})
        mgr.wait()
        save_config(str(run_dir), "config.json", cfg)

        out_pth = str(tmp_path / "exported.pth")
        export_main(["--eval_model_dir", str(run_dir), "--out", out_pth])
        sd = load_torch_state_dict(out_pth)
        fresh = jax.tree.map(
            np.asarray, jax.jit(model.init)(jax.random.PRNGKey(9), batch)
        )
        report = assemble_modcr_params(fresh, cfg, modcr_sd=sd, strict=True)
        assert not report.unconsumed
        np.testing.assert_array_equal(
            np.asarray(fresh["params"]["abst_confidence_scorer"]["kernel"]),
            np.asarray(params["params"]["abst_confidence_scorer"]["kernel"]),
        )


class TestRationaleExportRoundTrip:
    def test_rationale_export_then_assemble(self):
        """export_rationale_state_dict inverts assemble_rationale_params:
        a fresh tree grafted from the export reproduces the source
        exactly (incl. the fused-qkv Conv1D re-assembly and the untied
        lm_head transpose)."""
        from multimodal_context_reasoning_tpu.core.config import (
            ChunkAlignConfig, EncoderConfig, GPT2Config,
        )
        from multimodal_context_reasoning_tpu.interop.assemble import (
            assemble_rationale_params,
        )
        from multimodal_context_reasoning_tpu.interop.export import (
            export_rationale_state_dict,
        )
        from multimodal_context_reasoning_tpu.models.rationale import (
            RationaleModel,
        )

        rng = np.random.default_rng(0)
        enc = EncoderConfig(
            vocab_size=64, hidden_size=16, num_hidden_layers=4,
            num_attention_heads=2, intermediate_size=32,
            max_position_embeddings=64, img_feature_dim=8,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        )
        gpt = GPT2Config(
            vocab_size=32, n_positions=32, n_embd=16, n_layer=2, n_head=2,
            resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
            pad_token_id=0, add_cross_attention=True,
        )
        model = RationaleModel(
            enc, ChunkAlignConfig(chunk_layers_end=1, full_layers_end=2),
            gpt, num_labels=4, max_chunks=4,
        )
        B, T, I = 4, 10, 4
        batch = {
            "input_ids": jnp.asarray(rng.integers(2, 64, (B, T)), jnp.int32),
            "text_mask": jnp.ones((B, T)),
            "img_feat": jnp.asarray(rng.normal(size=(B, I, 8)), jnp.float32),
            "img_mask": jnp.ones((B, I)),
            "chunk_mask": jnp.ones((B, T, T)),
            "gather_index": jnp.full((B, T), -1, jnp.int32),
            "expl_ids": jnp.asarray(rng.integers(2, 32, (1, 6)), jnp.int32),
            "expl_mask": jnp.ones((1, 6)),
        }
        params = jax.tree.map(
            np.asarray, jax.jit(model.init)(jax.random.PRNGKey(0), batch)
        )
        sd = export_rationale_state_dict(params, enc, gpt)
        fresh = jax.tree.map(
            np.asarray, jax.jit(model.init)(jax.random.PRNGKey(9), batch)
        )
        report = assemble_rationale_params(fresh, enc, gpt, sd, strict=True)
        assert not report.unconsumed and not report.skipped
        flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
        flat_b = jax.tree_util.tree_flatten_with_path(fresh)[0]
        assert len(flat_a) == len(flat_b)
        for (ka, va), (kb, vb) in zip(flat_a, flat_b):
            assert ka == kb
            assert np.array_equal(np.asarray(va), np.asarray(vb)), (
                jax.tree_util.keystr(ka)
            )


class TestChunkAlignClsExportRoundTrip:
    def _setup(self):
        from multimodal_context_reasoning_tpu.core.config import (
            ChunkAlignConfig, EncoderConfig,
        )
        from multimodal_context_reasoning_tpu.models.chunkalign_cls import (
            ChunkAlignClassifier,
        )

        rng = np.random.default_rng(3)
        enc = EncoderConfig(
            vocab_size=64, hidden_size=16, num_hidden_layers=4,
            num_attention_heads=2, intermediate_size=32,
            max_position_embeddings=64, img_feature_dim=8,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        )
        model = ChunkAlignClassifier(
            enc, ChunkAlignConfig(chunk_layers_end=1, full_layers_end=2),
            num_labels=4, max_chunks=4,
        )
        B, T, I = 4, 10, 4
        batch = {
            "input_ids": jnp.asarray(rng.integers(2, 64, (B, T)), jnp.int32),
            "text_mask": jnp.ones((B, T)),
            "img_feat": jnp.asarray(rng.normal(size=(B, I, 8)), jnp.float32),
            "img_mask": jnp.ones((B, I)),
            "chunk_mask": jnp.ones((B, T, T)),
            "gather_index": jnp.full((B, T), -1, jnp.int32),
            "label": jnp.asarray([0.0, 0.0, 1.0, 0.0]),
        }
        return model, enc, batch

    def test_stage1_export_then_assemble(self):
        """export_chunkalign_cls_state_dict inverts
        assemble_chunkalign_cls_params: a fresh tree grafted from the
        export reproduces the source exactly."""
        from multimodal_context_reasoning_tpu.interop.assemble import (
            assemble_chunkalign_cls_params,
        )
        from multimodal_context_reasoning_tpu.interop.export import (
            export_chunkalign_cls_state_dict,
        )

        model, enc, batch = self._setup()
        params = jax.tree.map(
            np.asarray, jax.jit(model.init)(jax.random.PRNGKey(0), batch)
        )
        sd = export_chunkalign_cls_state_dict(params, enc)
        fresh = jax.tree.map(
            np.asarray, jax.jit(model.init)(jax.random.PRNGKey(9), batch)
        )
        report = assemble_chunkalign_cls_params(fresh, enc, sd, strict=True)
        assert not report.unconsumed and not report.skipped
        flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
        flat_b = jax.tree_util.tree_flatten_with_path(fresh)[0]
        assert len(flat_a) == len(flat_b)
        for (ka, va), (kb, vb) in zip(flat_a, flat_b):
            assert ka == kb
            assert np.array_equal(np.asarray(va), np.asarray(vb)), (
                jax.tree_util.keystr(ka)
            )

    def test_stage1_export_feeds_stage2_surgery(self):
        """The stage-1→stage-2 handoff: an exported ChunkAlign checkpoint
        drives assemble_modcr_params(chunkalign_sd=...) — the reference's
        seq_enc.-strip surgery (run_PMR_ModCR.py:752-763) — and the
        composite's seq encoder picks up the stage-1 weights bit-exactly."""
        from multimodal_context_reasoning_tpu.core.config import ModCRConfig
        from multimodal_context_reasoning_tpu.interop.assemble import (
            assemble_modcr_params,
        )
        from multimodal_context_reasoning_tpu.interop.export import (
            export_chunkalign_cls_state_dict,
        )
        from multimodal_context_reasoning_tpu.models.modcr import ModCRModel

        model, enc, batch = self._setup()
        params = jax.tree.map(
            np.asarray, jax.jit(model.init)(jax.random.PRNGKey(0), batch)
        )
        sd = export_chunkalign_cls_state_dict(params, enc)

        import dataclasses

        # geometry must match the stage-1 towers for the graft to land
        cfg = dataclasses.replace(
            ModCRConfig.tiny(), seq_encoder=enc, global_encoder=enc
        )
        modcr = ModCRModel(cfg)
        mb = {
            "input_ids": batch["input_ids"],
            "text_mask": batch["text_mask"],
            "img_feat": batch["img_feat"],
            "img_mask": batch["img_mask"],
            "chunk_mask": batch["chunk_mask"],
            "gather_index": batch["gather_index"],
            "r_input_ids": jnp.ones((4, 8), jnp.int32),
            "r_attention_mask": jnp.ones((4, 8)),
            "r_token_type_ids": jnp.zeros((4, 8), jnp.int32),
        }
        mp = jax.tree.map(
            np.asarray, jax.jit(modcr.init)(jax.random.PRNGKey(1), mb)
        )
        report = assemble_modcr_params(mp, cfg, chunkalign_sd=sd)
        assert not report.unconsumed
        src = params["params"]["seq_enc"]
        dst = mp["params"]["seq_enc"]
        fa = jax.tree_util.tree_flatten_with_path(src)[0]
        fb = jax.tree_util.tree_flatten_with_path(dst)[0]
        assert len(fa) == len(fb)
        for (ka, va), (kb, vb) in zip(fa, fb):
            assert ka == kb
            assert np.array_equal(np.asarray(va), np.asarray(vb)), (
                jax.tree_util.keystr(ka)
            )
