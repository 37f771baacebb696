"""ModCR Flax params → reference-format ``Abstract_Specific`` state dict.

The inverse of interop/assemble.py: after training on TPU, export the
param tree as the torch state dict the reference's composite consumes
(``calec.global_enc.*``, ``calec.seq_enc.*``, ``calec.cls_ensemble_1.*``,
``calec.cls_layer_lyx.N.*``, ``roberta.*``, mapping networks, scorer —
the "full composite" form of run_PMR_ModCR.py:802-806), so a user can
round-trip back into the reference's torch stack (or hand a TPU-trained
checkpoint to a torch deployment).

Key layout notes (mirroring interop/torch_bridge.py): Flax ``Dense``
kernels are ``[in, out]`` → torch ``nn.Linear.weight`` is ``[out, in]``
(transpose back); LayerNorm ``scale`` → ``weight``.  The exported dict
contains only the parameters the production forward reads — the
reference's dead heads (``calec.cls_layer.``, ``classifier.``,
``promptfuse.`` …, interop/assemble.py ``_KNOWN_DEAD``) have no
counterpart in this tree, so load it with ``strict=False`` (their fresh
init is never read by ``Abstract_Specific.forward``).

Round-trip guarantee: ``assemble_modcr_params(fresh, cfg,
modcr_sd=export_modcr_state_dict(params, cfg), strict=True)`` reproduces
``params`` exactly (tests/test_interop.py::TestExportRoundTrip).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from multimodal_context_reasoning_tpu.core.config import ModCRConfig

Array = np.ndarray
StateDict = Dict[str, Array]


def _np(x) -> Array:
    return np.asarray(x, np.float32)


def _lin(out: StateDict, prefix: str, node: Dict[str, Any]) -> None:
    """Flax Dense → torch Linear (kernel transposed back to [out, in])."""
    out[prefix + "weight"] = np.ascontiguousarray(_np(node["kernel"]).T)
    if "bias" in node:
        out[prefix + "bias"] = _np(node["bias"])


def _ln(out: StateDict, prefix: str, node: Dict[str, Any]) -> None:
    out[prefix + "weight"] = _np(node["scale"])
    out[prefix + "bias"] = _np(node["bias"])


def _export_encoder(
    out: StateDict, prefix: str, tree: Dict[str, Any], num_layers: int
) -> None:
    """Encoder params → HF-style keys (the bare layout the torch_bridge
    converters consume).  Handles both tree shapes: the image encoders
    nest embeddings under ``img_text_embeddings`` (convert_bert_encoder),
    PrefixRoberta keeps ``embeddings`` at the root (convert_roberta)."""
    if "img_text_embeddings" in tree:
        emb = tree["img_text_embeddings"]["embeddings"]
    else:
        emb = tree["embeddings"]
    out[prefix + "embeddings.word_embeddings.weight"] = _np(
        emb["word_embeddings"]["embedding"]
    )
    out[prefix + "embeddings.position_embeddings.weight"] = _np(
        emb["position_embeddings"]["embedding"]
    )
    out[prefix + "embeddings.token_type_embeddings.weight"] = _np(
        emb["token_type_embeddings"]["embedding"]
    )
    _ln(out, prefix + "embeddings.LayerNorm.", emb["layer_norm"])
    if "img_embedding" in tree.get("img_text_embeddings", {}):
        _lin(out, prefix + "img_embedding.",
             tree["img_text_embeddings"]["img_embedding"])
    for i in range(num_layers):
        layer = tree[f"layer_{i}"]
        p = f"{prefix}encoder.layer.{i}."
        att = layer["attention"]
        _lin(out, p + "attention.self.query.", att["query"])
        _lin(out, p + "attention.self.key.", att["key"])
        _lin(out, p + "attention.self.value.", att["value"])
        _lin(out, p + "attention.output.dense.", att["out"])
        _ln(out, p + "attention.output.LayerNorm.", att["out_layer_norm"])
        ffn = layer["ffn"]
        _lin(out, p + "intermediate.dense.", ffn["intermediate"])
        _lin(out, p + "output.dense.", ffn["output"])
        _ln(out, p + "output.LayerNorm.", ffn["output_layer_norm"])
    if "pooler" in tree:
        _lin(out, prefix + "pooler.dense.", tree["pooler"]["dense"])


def export_modcr_state_dict(params: Dict[str, Any], cfg: ModCRConfig) -> StateDict:
    """Flax ModCR param tree → flat numpy state dict in the reference's
    full-composite ``Abstract_Specific`` layout."""
    root = params["params"] if "params" in params else params
    out: StateDict = {}

    _export_encoder(out, "calec.global_enc.", root["global_enc"],
                    cfg.global_encoder.num_hidden_layers)
    if "seq_enc" in root:
        _export_encoder(out, "calec.seq_enc.", root["seq_enc"],
                        cfg.seq_encoder.num_hidden_layers)
        if "edge_dense" in root["seq_enc"]:
            # SeqBertImgModel's extra embedding (v10.py:260) — unused by
            # the forward but a real checkpoint key (round-trip fidelity)
            out["calec.seq_enc.edge_dense.weight"] = _np(
                root["seq_enc"]["edge_dense"]
            )

    fusion = root.get("fusion", {})
    if "cls_ensemble_1" in fusion:
        _lin(out, "calec.cls_ensemble_1.", fusion["cls_ensemble_1"])
    for i in range(cfg.chunkalign.cls_layer_num):
        layer = fusion.get(f"cls_layer_{i}")
        if layer is None:
            continue
        p = f"calec.cls_layer_lyx.{i}."
        _lin(out, p + "cross_attention.q_proj.", layer["q_proj"])
        _lin(out, p + "cross_attention.k_proj.", layer["k_proj"])
        _lin(out, p + "cross_attention.v_proj.", layer["v_proj"])
        _lin(out, p + "cross_attention.out_proj.", layer["out_proj"])
        _ln(out, p + "LayerNorm.", layer["layer_norm"])
        _lin(out, p + "intermediate.dense.", layer["ffn"]["intermediate"])
        _lin(out, p + "output.dense.", layer["ffn"]["output"])
        _ln(out, p + "output.LayerNorm.", layer["ffn"]["output_layer_norm"])

    _export_encoder(out, "roberta.", root["roberta"],
                    cfg.roberta.num_hidden_layers)

    for name, torch_prefixes in (
        ("mapping_network_vision",
         ("mapping_network_vision.1.", "mapping_network_vision.4.")),
        ("mapping_network_alignment",
         ("mapping_network_alignment.1.", "mapping_network_alignment.4.")),
    ):
        net = root.get(name)
        if net is None:
            continue
        # torch Sequential indices 1/4 ↔ our dense0/dense1 (ensemble:439-457)
        _lin(out, torch_prefixes[0], net["dense0"])
        _lin(out, torch_prefixes[1], net["dense1"])
    if "abst_confidence_scorer" in root:
        _lin(out, "abst_confidence_scorer.", root["abst_confidence_scorer"])
    return out


def _conv1d(out: StateDict, prefix: str, node: Dict[str, Any]) -> None:
    """Flax Dense → vendored GPT-2 Conv1D (weights stored [in, out] — NO
    transpose, unlike nn.Linear)."""
    out[prefix + "weight"] = _np(node["kernel"])
    out[prefix + "bias"] = _np(node["bias"])


def export_chunkalign_cls_state_dict(
    params: Dict[str, Any], enc_cfg, *, cls_layer_num: int = 3
) -> StateDict:
    """ChunkAlignClassifier params → the reference
    ``ChunkAlign_CLS_enc4_align`` state-dict layout (v10.py:1016-1165) —
    i.e. the ChunkAlign-pretrain checkpoint whose ``seq_enc.`` keys the
    production trainer strips and loads (run_PMR_ModCR.py:752-763).
    The stage-1→stage-2 handoff in scripts/train_two_stage.py round-trips
    through this format so the surgery path is the reference's, not a
    framework-internal shortcut."""
    root = params["params"] if "params" in params else params
    out: StateDict = {}
    _export_encoder(out, "global_enc.", root["global_enc"],
                    enc_cfg.num_hidden_layers)
    _export_encoder(out, "seq_enc.", root["seq_enc"],
                    enc_cfg.num_hidden_layers)
    if "edge_dense" in root["seq_enc"]:
        out["seq_enc.edge_dense.weight"] = _np(root["seq_enc"]["edge_dense"])
    _lin(out, "cls_ensemble.", root["cls_ensemble"])
    _lin(out, "classifier.", root["classifier"])
    for i in range(cls_layer_num):
        layer = root[f"cls_layer_{i}"]
        p = f"cls_layer.{i}."
        _lin(out, p + "cls_q_proj.", layer["cls_q_proj"])
        _lin(out, p + "align_k_proj.", layer["align_k_proj"])
        _lin(out, p + "dense.", layer["dense"])
        _ln(out, p + "LayerNorm.", layer["layer_norm"])
        _lin(out, p + "intermediate.dense.", layer["ffn"]["intermediate"])
        _lin(out, p + "output.dense.", layer["ffn"]["output"])
        _ln(out, p + "output.LayerNorm.", layer["ffn"]["output_layer_norm"])
    return out


def export_rationale_state_dict(
    params: Dict[str, Any], enc_cfg, gpt2_cfg, *, cls_layer_num: int = 3
) -> StateDict:
    """RationaleModel params → reference ``ChunkAlign_CLS_dec5_4`` state
    dict (v10.py:1319-1494) — the inverse of
    interop/assemble.py::assemble_rationale_params.  GPT-2 blocks restore
    the vendored Conv1D layout (fused [in, 3D] c_attn; cross-attention
    q_attn + [in, 2D] kv c_attn); the UNTIED lm_head goes back to
    nn.Linear's [vocab, D]."""
    root = params["params"] if "params" in params else params
    out: StateDict = {}
    _export_encoder(out, "global_enc.", root["global_enc"],
                    enc_cfg.num_hidden_layers)
    _export_encoder(out, "seq_enc.", root["seq_enc"],
                    enc_cfg.num_hidden_layers)
    if "edge_dense" in root["seq_enc"]:
        out["seq_enc.edge_dense.weight"] = _np(root["seq_enc"]["edge_dense"])
    _lin(out, "cls_ensemble.", root["cls_ensemble"])
    _lin(out, "classifier.", root["classifier"])
    for i in range(cls_layer_num):
        layer = root[f"cls_layer_{i}"]
        p = f"cls_layer.{i}."
        _lin(out, p + "cls_q_proj.", layer["cls_q_proj"])
        _lin(out, p + "align_k_proj.", layer["align_k_proj"])
        _lin(out, p + "dense.", layer["dense"])
        _ln(out, p + "LayerNorm.", layer["layer_norm"])
        _lin(out, p + "intermediate.dense.", layer["ffn"]["intermediate"])
        _lin(out, p + "output.dense.", layer["ffn"]["output"])
        _ln(out, p + "output.LayerNorm.", layer["ffn"]["output_layer_norm"])

    dec = root["dec"]
    out["dec.wte.weight"] = _np(dec["wte"]["embedding"])
    out["dec.wpe.weight"] = _np(dec["wpe"]["embedding"])
    _ln(out, "dec.ln_f.", dec["ln_f"])
    out["lm_head.weight"] = np.ascontiguousarray(
        _np(dec["lm_head"]["kernel"]).T
    )
    for i in range(gpt2_cfg.n_layer):
        blk = dec[f"block_{i}"]
        p = f"dec.h.{i}."
        _ln(out, p + "ln_1.", blk["ln_1"])
        _ln(out, p + "ln_2.", blk["ln_2"])
        att = blk["attn"]
        out[p + "attn.c_attn.weight"] = np.concatenate(
            [_np(att["q"]["kernel"]), _np(att["k"]["kernel"]),
             _np(att["v"]["kernel"])], axis=1,
        )
        out[p + "attn.c_attn.bias"] = np.concatenate(
            [_np(att["q"]["bias"]), _np(att["k"]["bias"]),
             _np(att["v"]["bias"])]
        )
        _conv1d(out, p + "attn.c_proj.", att["out"])
        _conv1d(out, p + "mlp.c_fc.", blk["mlp_c_fc"])
        _conv1d(out, p + "mlp.c_proj.", blk["mlp_c_proj"])
        if "crossattention" in blk:
            ca = blk["crossattention"]
            _conv1d(out, p + "crossattention.q_attn.", ca["q"])
            out[p + "crossattention.c_attn.weight"] = np.concatenate(
                [_np(ca["k"]["kernel"]), _np(ca["v"]["kernel"])], axis=1,
            )
            out[p + "crossattention.c_attn.bias"] = np.concatenate(
                [_np(ca["k"]["bias"]), _np(ca["v"]["bias"])]
            )
            _conv1d(out, p + "crossattention.c_proj.", ca["out"])
            _ln(out, p + "ln_cross_attn.", blk["ln_cross"])
    return out


def save_reference_checkpoint(
    path: str, params: Dict[str, Any], cfg: ModCRConfig
) -> None:
    """torch.save the exported dict in the reference's best-checkpoint
    wrapper ``{'net': state_dict}`` (run_PMR_ModCR.py:236-239), loadable by
    its --do_test path (with strict=False — see module docstring) and by
    interop/assemble.py."""
    import torch

    sd = export_modcr_state_dict(params, cfg)
    torch.save(
        # np.array copies: torch.from_numpy on a non-writable view (jax
        # arrays export read-only buffers) warns and risks aliasing
        {"net": {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}},
        path,
        _use_new_zipfile_serialization=False,  # the reference's legacy flag
    )
