"""Full-composite checkpoint assembly from reference-shaped torch dicts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from multimodal_context_reasoning_tpu.core.config import (
    ChunkAlignConfig,
    EncoderConfig,
    ModCRConfig,
    RobertaConfig,
)
from multimodal_context_reasoning_tpu.interop.assemble import (
    assemble_modcr_params,
)
from multimodal_context_reasoning_tpu.models.modcr import ModCRModel
from tests.test_models import make_batch


def tiny_cfg() -> ModCRConfig:
    enc = EncoderConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        max_position_embeddings=64, img_feature_dim=20,
    )
    rob = RobertaConfig(
        vocab_size=128, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        max_position_embeddings=64,
    )
    return ModCRConfig(
        global_encoder=enc, seq_encoder=enc, roberta=rob,
        chunkalign=ChunkAlignConfig(chunk_layers_end=1, full_layers_end=1),
        text_len=12, img_len=6, roberta_len=16, max_chunks=6,
    )


def oscar_style_sd(cfg, seed, with_prefix=""):
    """Reference-shaped Oscar dict: HF BertModel keys + img_embedding."""
    torch.manual_seed(seed)
    hf = transformers.BertModel(transformers.BertConfig(
        vocab_size=cfg.vocab_size - 10,  # exercise token-resize
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
    ))
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    sd["img_embedding.weight"] = np.random.default_rng(seed).normal(
        size=(cfg.hidden_size, cfg.img_feature_dim)).astype(np.float32)
    sd["img_embedding.bias"] = np.zeros((cfg.hidden_size,), np.float32)
    return {with_prefix + k: v for k, v in sd.items()}


class TestAssemble:
    def test_full_assembly_changes_outputs_and_loads_all_towers(self):
        cfg = tiny_cfg()
        model = ModCRModel(cfg)
        batch = make_batch(cfg)
        params = model.init(jax.random.PRNGKey(0), batch)
        params = jax.tree_util.tree_map(np.asarray, params)
        before = np.asarray(model.apply(params, batch).logits)

        torch.manual_seed(7)
        rob = transformers.RobertaModel(transformers.RobertaConfig(
            vocab_size=cfg.roberta.vocab_size - 10,
            hidden_size=cfg.roberta.hidden_size,
            num_hidden_layers=cfg.roberta.num_hidden_layers,
            num_attention_heads=cfg.roberta.num_attention_heads,
            intermediate_size=cfg.roberta.intermediate_size,
            max_position_embeddings=cfg.roberta.max_position_embeddings,
            pad_token_id=1, type_vocab_size=1,
        ))
        roberta_sd = {k: v.detach().numpy() for k, v in rob.state_dict().items()}

        # modcr head dict (torch layouts), incl. Sequential index names
        rng = np.random.default_rng(3)
        D, R, P = cfg.global_encoder.hidden_size, cfg.roberta.hidden_size, cfg.prefix_len
        modcr_sd = {
            "mapping_network_vision.1.weight":
                rng.normal(size=(D * P, D)).astype(np.float32),
            "mapping_network_vision.1.bias": np.zeros((D * P,), np.float32),
            "mapping_network_vision.4.weight":
                rng.normal(size=(R * P, D * P)).astype(np.float32),
            "mapping_network_vision.4.bias": np.zeros((R * P,), np.float32),
            "abst_confidence_scorer.weight":
                rng.normal(size=(1, R)).astype(np.float32),
            "abst_confidence_scorer.bias": np.zeros((1,), np.float32),
        }

        assemble_modcr_params(
            params, cfg,
            oscar_sd=oscar_style_sd(cfg.global_encoder, 1),
            chunkalign_sd=oscar_style_sd(cfg.seq_encoder, 2, with_prefix="seq_enc."),
            roberta_sd=roberta_sd,
            modcr_sd=modcr_sd,
            cold_start=False,
        )
        after = np.asarray(model.apply(params, batch).logits)
        assert not np.allclose(before, after)

        # spot-check: scorer kernel landed transposed
        got = params["params"]["abst_confidence_scorer"]["kernel"]
        np.testing.assert_array_equal(
            got, modcr_sd["abst_confidence_scorer.weight"].T
        )
        # token-resize happened: word table has full target vocab
        w = params["params"]["global_enc"]["img_text_embeddings"]["embeddings"][
            "word_embeddings"]["embedding"]
        assert w.shape[0] == cfg.global_encoder.vocab_size

    def test_cold_start_drops_mapping_networks_but_keeps_scorer(self):
        """run_PMR_ModCR.py:823-832 deletes mapping_network_vision./
        mapping_network_alignment./classifier. — the scorer survives."""
        cfg = tiny_cfg()
        model = ModCRModel(cfg)
        batch = make_batch(cfg)
        params = model.init(jax.random.PRNGKey(0), batch)
        params = jax.tree_util.tree_map(np.asarray, params)
        fresh_map = params["params"]["mapping_network_vision"]["dense0"][
            "kernel"].copy()

        rng = np.random.default_rng(5)
        D, R, P = (cfg.global_encoder.hidden_size, cfg.roberta.hidden_size,
                   cfg.prefix_len)
        modcr_sd = {
            "mapping_network_vision.1.weight":
                rng.normal(size=(D * P, D)).astype(np.float32),
            "mapping_network_vision.1.bias": np.zeros((D * P,), np.float32),
            "abst_confidence_scorer.weight":
                rng.normal(size=(1, R)).astype(np.float32),
            "abst_confidence_scorer.bias": np.ones((1,), np.float32),
        }
        assemble_modcr_params(params, cfg, modcr_sd=modcr_sd, cold_start=True)
        # mapping network kept its fresh init
        np.testing.assert_array_equal(
            params["params"]["mapping_network_vision"]["dense0"]["kernel"],
            fresh_map,
        )
        # scorer was grafted (reference does NOT drop it)
        np.testing.assert_array_equal(
            params["params"]["abst_confidence_scorer"]["kernel"],
            modcr_sd["abst_confidence_scorer.weight"].T,
        )
