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


def full_composite_sd(cfg, seed=11):
    """Reference-shaped FULL Abstract_Specific state dict — the
    ``{'net': ...}`` form the published 0.8492/0.8573 checkpoints use
    (run_PMR_ModCR.py:802-806).  Key names follow the reference module tree
    (modeling_ensemble.py:424-458, v10.py:872-889,840-855)."""
    rng = np.random.default_rng(seed)
    D = cfg.global_encoder.hidden_size
    R = cfg.roberta.hidden_size
    P = cfg.prefix_len
    FF = cfg.global_encoder.intermediate_size

    sd = {}
    sd.update(oscar_style_sd(cfg.global_encoder, seed + 1,
                             with_prefix="calec.global_enc."))
    sd.update(oscar_style_sd(cfg.seq_encoder, seed + 2,
                             with_prefix="calec.seq_enc."))
    sd["calec.seq_enc.edge_dense.weight"] = rng.normal(
        size=(1, D)).astype(np.float32)

    def lin(name, out_d, in_d):
        sd[name + ".weight"] = rng.normal(size=(out_d, in_d)).astype(np.float32)
        sd[name + ".bias"] = rng.normal(size=(out_d,)).astype(np.float32)

    def ln(name, d):
        sd[name + ".weight"] = np.ones((d,), np.float32) + 0.01 * rng.normal(size=(d,)).astype(np.float32)
        sd[name + ".bias"] = 0.01 * rng.normal(size=(d,)).astype(np.float32)

    lin("calec.cls_ensemble_1", D, 2 * D)
    for i in range(cfg.chunkalign.cls_layer_num):
        p = f"calec.cls_layer_lyx.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            lin(f"{p}.cross_attention.{proj}", D, D)
        ln(f"{p}.LayerNorm", D)
        lin(f"{p}.intermediate.dense", FF, D)
        lin(f"{p}.output.dense", D, FF)
        ln(f"{p}.output.LayerNorm", D)
        # dead params present in every real checkpoint
        lin(f"{p}.ensemble", 1, 2 * D)
        lin(f"{p}.dense", D, D)
        lin(f"{p}.attention.self.query", D, D)
    # dead CALeC heads + the unused ClsLayer2 stack
    lin("calec.classifier", 2, D)
    lin("calec.fusion_align", 1024 if D > 512 else D, 2 * D)
    lin("calec.prior", 1, D)
    lin("calec.cls_layer.0.dense", D, D)

    torch.manual_seed(seed + 3)
    rob = transformers.RobertaModel(transformers.RobertaConfig(
        vocab_size=cfg.roberta.vocab_size,
        hidden_size=R,
        num_hidden_layers=cfg.roberta.num_hidden_layers,
        num_attention_heads=cfg.roberta.num_attention_heads,
        intermediate_size=cfg.roberta.intermediate_size,
        max_position_embeddings=cfg.roberta.max_position_embeddings,
        pad_token_id=1, type_vocab_size=2,   # fine-tuned 2-row table
    ))
    sd.update({"roberta." + k: v.detach().numpy()
               for k, v in rob.state_dict().items()})

    lin("mapping_network_vision.1", D * P, D)
    lin("mapping_network_vision.4", R * P, D * P)
    lin("mapping_network_alignment.1", D * P, D)
    lin("mapping_network_alignment.4", R * P, D * P)
    lin("abst_confidence_scorer", 1, R)
    # dead Abstract_Specific heads
    lin("classifier", 1, 2 * D)
    lin("confidence_scorer", 1, D)
    sd["promptfuse.weight"] = rng.normal(size=(2, R)).astype(np.float32)
    return sd


class TestFullCompositeRestore:
    """run_PMR_ModCR.py:802-806: the --do_test path loads a COMPLETE
    Abstract_Specific dict — fusion stack and fine-tuned RoBERTa included."""

    def test_every_tower_grafts_and_forward_changes(self):
        cfg = tiny_cfg()
        model = ModCRModel(cfg)
        batch = make_batch(cfg)
        params = model.init(jax.random.PRNGKey(0), batch)
        params = jax.tree_util.tree_map(np.asarray, params)
        before = np.asarray(model.apply(params, batch).logits)

        snap = {
            "global_word": params["params"]["global_enc"]["img_text_embeddings"]
                ["embeddings"]["word_embeddings"]["embedding"].copy(),
            "seq_q": params["params"]["seq_enc"]["layer_0"]["attention"]
                ["query"]["kernel"].copy(),
            "fusion_ens": params["params"]["fusion"]["cls_ensemble_1"]
                ["kernel"].copy(),
            "fusion_q": params["params"]["fusion"]["cls_layer_0"]["q_proj"]
                ["kernel"].copy(),
            "rob_q": params["params"]["roberta"]["layer_0"]["attention"]
                ["query"]["kernel"].copy(),
            "rob_tt": params["params"]["roberta"]["embeddings"]
                ["token_type_embeddings"]["embedding"].copy(),
            "edge": params["params"]["seq_enc"]["edge_dense"].copy(),
            "map_v": params["params"]["mapping_network_vision"]["dense0"]
                ["kernel"].copy(),
        }

        sd = full_composite_sd(cfg)
        report = assemble_modcr_params(params, cfg, modcr_sd=sd,
                                       cold_start=False)

        # every tower's params changed
        for name, old in snap.items():
            new = {
                "global_word": params["params"]["global_enc"]
                    ["img_text_embeddings"]["embeddings"]["word_embeddings"]
                    ["embedding"],
                "seq_q": params["params"]["seq_enc"]["layer_0"]["attention"]
                    ["query"]["kernel"],
                "fusion_ens": params["params"]["fusion"]["cls_ensemble_1"]
                    ["kernel"],
                "fusion_q": params["params"]["fusion"]["cls_layer_0"]
                    ["q_proj"]["kernel"],
                "rob_q": params["params"]["roberta"]["layer_0"]["attention"]
                    ["query"]["kernel"],
                "rob_tt": params["params"]["roberta"]["embeddings"]
                    ["token_type_embeddings"]["embedding"],
                "edge": params["params"]["seq_enc"]["edge_dense"],
                "map_v": params["params"]["mapping_network_vision"]["dense0"]
                    ["kernel"],
            }[name]
            assert not np.allclose(old, new), f"{name} did not change"

        # the fine-tuned token-type table is RESTORED, not re-initialised
        np.testing.assert_array_equal(
            params["params"]["roberta"]["embeddings"]["token_type_embeddings"]
            ["embedding"],
            sd["roberta.embeddings.token_type_embeddings.weight"],
        )
        # fusion layer kernels land transposed
        np.testing.assert_array_equal(
            params["params"]["fusion"]["cls_layer_1"]["out_proj"]["kernel"],
            sd["calec.cls_layer_lyx.1.cross_attention.out_proj.weight"].T,
        )
        after = np.asarray(model.apply(params, batch).logits)
        assert not np.allclose(before, after)

        # accounting: nothing unconsumed; all dead heads skipped w/ reasons
        assert report.unconsumed == set()
        for dead in ("calec.classifier.weight", "calec.prior.bias",
                     "classifier.weight", "confidence_scorer.bias",
                     "promptfuse.weight", "calec.cls_layer.0.dense.weight",
                     "calec.cls_layer_lyx.0.ensemble.weight",
                     "calec.cls_layer_lyx.0.attention.self.query.weight"):
            assert dead in report.skipped, f"{dead} not classified as skipped"
        assert "calec.cls_ensemble_1.weight" in report.consumed
        assert "roberta.embeddings.word_embeddings.weight" in report.consumed

    def test_unconsumed_key_raises_strict_and_reports_lenient(self):
        cfg = tiny_cfg()
        model = ModCRModel(cfg)
        batch = make_batch(cfg)
        params = model.init(jax.random.PRNGKey(0), batch)
        params = jax.tree_util.tree_map(np.asarray, params)
        sd = full_composite_sd(cfg)
        sd["calec.mystery_head.weight"] = np.zeros((3, 3), np.float32)

        with pytest.raises(KeyError, match="mystery_head"):
            assemble_modcr_params(
                params, cfg,
                modcr_sd=dict(sd),
                cold_start=False,
            )
        report = assemble_modcr_params(
            params, cfg, modcr_sd=dict(sd), cold_start=False, strict=False,
        )
        assert "calec.mystery_head.weight" in report.unconsumed

    def test_cold_start_on_full_dict_drops_only_surgery_keys(self):
        cfg = tiny_cfg()
        model = ModCRModel(cfg)
        batch = make_batch(cfg)
        params = model.init(jax.random.PRNGKey(0), batch)
        params = jax.tree_util.tree_map(np.asarray, params)
        fresh_map = params["params"]["mapping_network_vision"]["dense0"][
            "kernel"].copy()
        fresh_fusion = params["params"]["fusion"]["cls_ensemble_1"][
            "kernel"].copy()

        sd = full_composite_sd(cfg)
        report = assemble_modcr_params(params, cfg, modcr_sd=sd,
                                       cold_start=True)
        # mapping networks keep fresh init; fusion stack still grafts
        np.testing.assert_array_equal(
            params["params"]["mapping_network_vision"]["dense0"]["kernel"],
            fresh_map,
        )
        assert not np.allclose(
            params["params"]["fusion"]["cls_ensemble_1"]["kernel"],
            fresh_fusion,
        )
        assert report.skipped["mapping_network_vision.1.weight"].startswith(
            "cold-start surgery")
