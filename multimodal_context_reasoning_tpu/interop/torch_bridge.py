"""PyTorch/HuggingFace checkpoint → Flax param-tree conversion.

Covers the reference's loading surface:

- Oscar-base ``BertImgModel`` weights → :class:`GlobalImageEncoder`
  (run_PMR_ModCR.py:727-730);
- ChunkAlign pretrain dict with the ``seq_enc.`` prefix stripped →
  :class:`ChunkAlignEncoder` (run_PMR_ModCR.py:752-763);
- ``roberta-large`` → :class:`PrefixRoberta`, with the 2-type token-type
  embedding re-initialisation (run_PMR_ModCR.py:772-781);
- GPT-2 (Conv1D fused qkv) → :class:`GPT2Decoder`;
- cold-start key surgery: delete ``mapping_network_vision.`` /
  ``mapping_network_alignment.`` / ``classifier.`` keys before a non-strict
  load (run_PMR_ModCR.py:819-832);
- token-embedding resize for the 45 ``<|det#|>`` special tokens
  (run_PMR_ModCR.py:715-716,730).

All functions consume a flat ``{name: numpy array}`` dict — call
``{k: v.cpu().numpy() for k, v in torch.load(p).items()}`` (or use
:func:`load_torch_state_dict`) to produce one; nothing here imports torch at
module scope so the package stays importable without it.

Layout notes: torch ``nn.Linear.weight`` is ``[out, in]`` → Flax ``Dense``
kernels are ``[in, out]`` (transpose); GPT-2's ``Conv1D.weight`` is already
``[in, out]`` (no transpose), with ``c_attn`` fused as ``[in, 3·out]``
(split), and cross-attention ``q_attn``/``c_attn``(k,v) handled separately.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Iterable, Optional, Tuple

import numpy as np

Array = np.ndarray
StateDict = Dict[str, Array]


def load_torch_state_dict(path: str) -> StateDict:
    """torch.load a .pth/.bin file to a flat numpy dict (handles the
    reference's ``{'net': state_dict, ...}`` wrapper, run_PMR_ModCR.py:236)."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "net" in raw and isinstance(raw["net"], dict):
        raw = raw["net"]
    if hasattr(raw, "state_dict"):
        raw = raw.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in raw.items()
            if hasattr(v, "detach")}


def strip_prefix(sd: StateDict, prefix: str) -> StateDict:
    """Keep only keys under ``prefix``, with it removed
    (run_PMR_ModCR.py:756-762 strips ``seq_enc.``)."""
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def delete_keys_matching(sd: StateDict, prefixes: Iterable[str]) -> StateDict:
    """Cold-start surgery (run_PMR_ModCR.py:823-832): drop freshly
    initialized heads before a non-strict load."""
    prefixes = tuple(prefixes)
    return {k: v for k, v in sd.items() if not k.startswith(prefixes)}


def resize_token_embeddings(
    emb: Array, new_size: int, *, std: float = 0.02, seed: int = 0
) -> Array:
    """Grow a [V, D] embedding table; new rows ~ N(0, std) (HF
    resize_token_embeddings semantics for the 45 <|det#|> tokens)."""
    V, D = emb.shape
    if new_size <= V:
        return emb[:new_size]
    rng = np.random.default_rng(seed)
    extra = (rng.standard_normal((new_size - V, D)) * std).astype(emb.dtype)
    return np.concatenate([emb, extra], axis=0)


def _t(w: Array) -> Array:
    return np.ascontiguousarray(w.T)


def _get(sd: StateDict, *names: str) -> Optional[Array]:
    for n in names:
        if n in sd:
            return sd[n]
    return None


def _require(sd: StateDict, *names: str) -> Array:
    v = _get(sd, *names)
    if v is None:
        raise KeyError(f"none of {names} found in state dict "
                       f"(have e.g. {list(sd)[:5]})")
    return v


def convert_bert_encoder(
    sd: StateDict,
    num_layers: int,
    *,
    vocab_size: Optional[int] = None,
    has_img_embedding: bool = True,
) -> Dict[str, Any]:
    """HF-style BERT(+img_embedding) state dict → Global/ChunkAlign encoder
    params (structure of models/encoders.py).

    Accepts both bare (``embeddings.…``) and ``bert.``-prefixed keys.
    """
    if any(k.startswith("bert.") for k in sd):
        sd = {**{k[5:]: v for k, v in sd.items() if k.startswith("bert.")},
              **{k: v for k, v in sd.items() if not k.startswith("bert.")}}

    word = _require(sd, "embeddings.word_embeddings.weight")
    if vocab_size is not None and word.shape[0] != vocab_size:
        word = resize_token_embeddings(word, vocab_size)

    emb = {
        "word_embeddings": {"embedding": word},
        "position_embeddings": {
            "embedding": _require(sd, "embeddings.position_embeddings.weight")
        },
        "token_type_embeddings": {
            "embedding": _require(sd, "embeddings.token_type_embeddings.weight")
        },
        "layer_norm": {
            "scale": _require(sd, "embeddings.LayerNorm.weight",
                              "embeddings.LayerNorm.gamma"),
            "bias": _require(sd, "embeddings.LayerNorm.bias",
                             "embeddings.LayerNorm.beta"),
        },
    }
    tree: Dict[str, Any] = {"img_text_embeddings": {"embeddings": emb}}

    if has_img_embedding:
        w = _get(sd, "img_embedding.weight")
        if w is not None:
            tree["img_text_embeddings"]["img_embedding"] = {
                "kernel": _t(w), "bias": _require(sd, "img_embedding.bias"),
            }

    for i in range(num_layers):
        p = f"encoder.layer.{i}."

        def lin(name: str) -> Dict[str, Array]:
            return {"kernel": _t(_require(sd, p + name + ".weight")),
                    "bias": _require(sd, p + name + ".bias")}

        tree[f"layer_{i}"] = {
            "attention": {
                "query": lin("attention.self.query"),
                "key": lin("attention.self.key"),
                "value": lin("attention.self.value"),
                "out": lin("attention.output.dense"),
                "out_layer_norm": {
                    "scale": _require(sd, p + "attention.output.LayerNorm.weight"),
                    "bias": _require(sd, p + "attention.output.LayerNorm.bias"),
                },
            },
            "ffn": {
                "intermediate": lin("intermediate.dense"),
                "output": lin("output.dense"),
                "output_layer_norm": {
                    "scale": _require(sd, p + "output.LayerNorm.weight"),
                    "bias": _require(sd, p + "output.LayerNorm.bias"),
                },
            },
        }

    pw = _get(sd, "pooler.dense.weight")
    if pw is not None:
        tree["pooler"] = {"dense": {"kernel": _t(pw),
                                    "bias": _require(sd, "pooler.dense.bias")}}
    return tree


def convert_roberta(
    sd: StateDict,
    num_layers: int,
    *,
    vocab_size: Optional[int] = None,
    reinit_token_types: int = 2,
    keep_token_type: bool = False,
    initializer_range: float = 0.02,
    seed: int = 0,
) -> Dict[str, Any]:
    """HF roberta state dict → PrefixRoberta params.

    ``reinit_token_types``: the reference replaces roberta's 1-row
    token-type table with a fresh 2-row one (run_PMR_ModCR.py:779-781).
    ``keep_token_type``: restore the source table instead — required when
    loading a fine-tuned composite checkpoint whose 2-row table is trained
    (run_PMR_ModCR.py:802-806); the source must already have
    ``reinit_token_types`` rows.
    """
    if any(k.startswith("roberta.") for k in sd):
        sd = strip_prefix(sd, "roberta.")

    word = _require(sd, "embeddings.word_embeddings.weight")
    if vocab_size is not None and word.shape[0] != vocab_size:
        word = resize_token_embeddings(word, vocab_size)
    hidden = word.shape[1]

    if keep_token_type:
        ttype = _require(sd, "embeddings.token_type_embeddings.weight")
        if ttype.shape[0] != reinit_token_types:
            raise ValueError(
                f"keep_token_type: source table has {ttype.shape[0]} rows, "
                f"target needs {reinit_token_types}"
            )
    else:
        rng = np.random.default_rng(seed)
        ttype = (rng.standard_normal((reinit_token_types, hidden))
                 * initializer_range).astype(word.dtype)

    tree: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": {"embedding": word},
            "position_embeddings": {
                "embedding": _require(sd, "embeddings.position_embeddings.weight")
            },
            "token_type_embeddings": {"embedding": ttype},
            "layer_norm": {
                "scale": _require(sd, "embeddings.LayerNorm.weight"),
                "bias": _require(sd, "embeddings.LayerNorm.bias"),
            },
        }
    }
    for i in range(num_layers):
        p = f"encoder.layer.{i}."

        def lin(name: str) -> Dict[str, Array]:
            return {"kernel": _t(_require(sd, p + name + ".weight")),
                    "bias": _require(sd, p + name + ".bias")}

        tree[f"layer_{i}"] = {
            "attention": {
                "query": lin("attention.self.query"),
                "key": lin("attention.self.key"),
                "value": lin("attention.self.value"),
                "out": lin("attention.output.dense"),
                "out_layer_norm": {
                    "scale": _require(sd, p + "attention.output.LayerNorm.weight"),
                    "bias": _require(sd, p + "attention.output.LayerNorm.bias"),
                },
            },
            "ffn": {
                "intermediate": lin("intermediate.dense"),
                "output": lin("output.dense"),
                "output_layer_norm": {
                    "scale": _require(sd, p + "output.LayerNorm.weight"),
                    "bias": _require(sd, p + "output.LayerNorm.bias"),
                },
            },
        }
    pw = _get(sd, "pooler.dense.weight")
    if pw is not None:
        tree["pooler"] = {"dense": {"kernel": _t(pw),
                                    "bias": _require(sd, "pooler.dense.bias")}}
    return tree


def convert_gpt2(sd: StateDict, num_layers: int) -> Dict[str, Any]:
    """HF GPT-2 (Conv1D) state dict → GPT2Decoder params.

    Conv1D weights are stored ``[in, out]`` — our Dense kernels match, no
    transpose.  ``c_attn`` is ``[in, 3·D]`` fused qkv (split);
    cross-attention uses ``q_attn`` for q and ``crossattention.c_attn``
    ``[in, 2·D]`` for k,v (HF layout the vendored copy mirrors,
    modeling_transfomres.py:285-299).
    """
    if any(k.startswith("transformer.") for k in sd):
        sd = strip_prefix(sd, "transformer.")

    tree: Dict[str, Any] = {
        "wte": {"embedding": _require(sd, "wte.weight")},
        "wpe": {"embedding": _require(sd, "wpe.weight")},
        "ln_f": {"scale": _require(sd, "ln_f.weight"),
                 "bias": _require(sd, "ln_f.bias")},
    }
    # the rationale family's separate untied head (v10.py:1335) — stored
    # torch-style [vocab, D]
    lm = _get(sd, "lm_head.weight")
    if lm is not None:
        tree["lm_head"] = {"kernel": _t(lm)}
    for i in range(num_layers):
        p = f"h.{i}."
        D = sd[p + "attn.c_attn.weight"].shape[0]
        w = _require(sd, p + "attn.c_attn.weight")   # [D, 3D]
        b = _require(sd, p + "attn.c_attn.bias")
        qw, kw, vw = np.split(w, 3, axis=1)
        qb, kb, vb = np.split(b, 3)
        block: Dict[str, Any] = {
            "ln_1": {"scale": _require(sd, p + "ln_1.weight"),
                     "bias": _require(sd, p + "ln_1.bias")},
            "attn": {
                "q": {"kernel": qw, "bias": qb},
                "k": {"kernel": kw, "bias": kb},
                "v": {"kernel": vw, "bias": vb},
                "out": {"kernel": _require(sd, p + "attn.c_proj.weight"),
                        "bias": _require(sd, p + "attn.c_proj.bias")},
            },
            "ln_2": {"scale": _require(sd, p + "ln_2.weight"),
                     "bias": _require(sd, p + "ln_2.bias")},
            "mlp_c_fc": {"kernel": _require(sd, p + "mlp.c_fc.weight"),
                         "bias": _require(sd, p + "mlp.c_fc.bias")},
            "mlp_c_proj": {"kernel": _require(sd, p + "mlp.c_proj.weight"),
                           "bias": _require(sd, p + "mlp.c_proj.bias")},
        }
        if p + "crossattention.c_attn.weight" in sd:
            cw = sd[p + "crossattention.c_attn.weight"]  # [D, 2D]
            cb = sd[p + "crossattention.c_attn.bias"]
            kw2, vw2 = np.split(cw, 2, axis=1)
            kb2, vb2 = np.split(cb, 2)
            block["crossattention"] = {
                "q": {"kernel": _require(sd, p + "crossattention.q_attn.weight"),
                      "bias": _require(sd, p + "crossattention.q_attn.bias")},
                "k": {"kernel": kw2, "bias": kb2},
                "v": {"kernel": vw2, "bias": vb2},
                "out": {"kernel": _require(sd, p + "crossattention.c_proj.weight"),
                        "bias": _require(sd, p + "crossattention.c_proj.bias")},
            }
            block["ln_cross"] = {
                "scale": _require(sd, p + "ln_cross_attn.weight"),
                "bias": _require(sd, p + "ln_cross_attn.bias"),
            }
        tree[f"block_{i}"] = block
    return tree


def _normalize_hf_clip(sd: StateDict) -> StateDict:
    """HF ``CLIPModel`` layout → OpenAI layout (the one convert_clip reads).

    HF splits the fused in_proj into q/k/v and stores the projections as
    Linear ``[out, in]``; OpenAI packs ``in_proj_weight`` [3W, W] and keeps
    ``proj``/``text_projection`` as plain ``[in, out]`` matrices.
    """
    out: StateDict = {}

    def block(src_prefix: str, dst_prefix: str) -> None:
        i = 0
        while f"{src_prefix}.layers.{i}.layer_norm1.weight" in sd:
            s = f"{src_prefix}.layers.{i}."
            d = f"{dst_prefix}.resblocks.{i}."
            out[d + "ln_1.weight"] = sd[s + "layer_norm1.weight"]
            out[d + "ln_1.bias"] = sd[s + "layer_norm1.bias"]
            out[d + "attn.in_proj_weight"] = np.concatenate(
                [sd[s + f"self_attn.{n}_proj.weight"] for n in "qkv"], axis=0)
            out[d + "attn.in_proj_bias"] = np.concatenate(
                [sd[s + f"self_attn.{n}_proj.bias"] for n in "qkv"], axis=0)
            out[d + "attn.out_proj.weight"] = sd[s + "self_attn.out_proj.weight"]
            out[d + "attn.out_proj.bias"] = sd[s + "self_attn.out_proj.bias"]
            out[d + "ln_2.weight"] = sd[s + "layer_norm2.weight"]
            out[d + "ln_2.bias"] = sd[s + "layer_norm2.bias"]
            out[d + "mlp.c_fc.weight"] = sd[s + "mlp.fc1.weight"]
            out[d + "mlp.c_fc.bias"] = sd[s + "mlp.fc1.bias"]
            out[d + "mlp.c_proj.weight"] = sd[s + "mlp.fc2.weight"]
            out[d + "mlp.c_proj.bias"] = sd[s + "mlp.fc2.bias"]
            i += 1

    out["visual.conv1.weight"] = _require(
        sd, "vision_model.embeddings.patch_embedding.weight")
    out["visual.class_embedding"] = _require(
        sd, "vision_model.embeddings.class_embedding")
    out["visual.positional_embedding"] = _require(
        sd, "vision_model.embeddings.position_embedding.weight")
    # "pre_layrnorm" is HF's historical typo, kept for compatibility there.
    out["visual.ln_pre.weight"] = _require(
        sd, "vision_model.pre_layrnorm.weight",
        "vision_model.pre_layernorm.weight")
    out["visual.ln_pre.bias"] = _require(
        sd, "vision_model.pre_layrnorm.bias",
        "vision_model.pre_layernorm.bias")
    block("vision_model.encoder", "visual.transformer")
    out["visual.ln_post.weight"] = _require(
        sd, "vision_model.post_layernorm.weight")
    out["visual.ln_post.bias"] = _require(
        sd, "vision_model.post_layernorm.bias")
    out["visual.proj"] = _t(_require(sd, "visual_projection.weight"))

    out["token_embedding.weight"] = _require(
        sd, "text_model.embeddings.token_embedding.weight")
    out["positional_embedding"] = _require(
        sd, "text_model.embeddings.position_embedding.weight")
    block("text_model.encoder", "transformer")
    out["ln_final.weight"] = _require(sd, "text_model.final_layer_norm.weight")
    out["ln_final.bias"] = _require(sd, "text_model.final_layer_norm.bias")
    out["text_projection"] = _t(_require(sd, "text_projection.weight"))
    out["logit_scale"] = _require(sd, "logit_scale")
    return out


def convert_clip(sd: StateDict) -> Dict[str, Any]:
    """CLIP checkpoint → Flax ``models/clip.py::CLIP`` params.

    Accepts both the OpenAI published layout (``visual.conv1.weight``,
    ``…resblocks.N.attn.in_proj_weight``, ``text_projection``, …— what
    ``clip.load('ViT-B/16')`` holds, run_PMR_ModCR.py:450) and the HF
    ``CLIPModel`` layout (``vision_model.…``, split q/k/v projections).
    OpenAI ships fp16 weights; everything is cast to fp32 here (params are
    always fp32 in this framework, compute dtype is a config knob).
    """
    if "visual.conv1.weight" not in sd and \
            "vision_model.embeddings.patch_embedding.weight" in sd:
        sd = _normalize_hf_clip(sd)
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}

    def blocks(prefix: str, n_guess: int = 64) -> Dict[str, Any]:
        tree: Dict[str, Any] = {}
        for i in range(n_guess):
            p = f"{prefix}.resblocks.{i}."
            if p + "ln_1.weight" not in sd:
                break
            tree[f"block_{i}"] = {
                "ln_1": {"scale": sd[p + "ln_1.weight"],
                         "bias": sd[p + "ln_1.bias"]},
                "in_proj": {"kernel": _t(sd[p + "attn.in_proj_weight"]),
                            "bias": sd[p + "attn.in_proj_bias"]},
                "out_proj": {"kernel": _t(sd[p + "attn.out_proj.weight"]),
                             "bias": sd[p + "attn.out_proj.bias"]},
                "ln_2": {"scale": sd[p + "ln_2.weight"],
                         "bias": sd[p + "ln_2.bias"]},
                "mlp_c_fc": {"kernel": _t(sd[p + "mlp.c_fc.weight"]),
                             "bias": sd[p + "mlp.c_fc.bias"]},
                "mlp_c_proj": {"kernel": _t(sd[p + "mlp.c_proj.weight"]),
                               "bias": sd[p + "mlp.c_proj.bias"]},
            }
        return tree

    visual: Dict[str, Any] = {
        # torch Conv2d OIHW [W, 3, P, P] → Flax HWIO [P, P, 3, W]
        "conv1": {"kernel": np.ascontiguousarray(
            _require(sd, "visual.conv1.weight").transpose(2, 3, 1, 0))},
        "class_embedding": _require(sd, "visual.class_embedding"),
        "positional_embedding": _require(sd, "visual.positional_embedding"),
        "ln_pre": {"scale": _require(sd, "visual.ln_pre.weight"),
                   "bias": _require(sd, "visual.ln_pre.bias")},
        "ln_post": {"scale": _require(sd, "visual.ln_post.weight"),
                    "bias": _require(sd, "visual.ln_post.bias")},
        "proj": _require(sd, "visual.proj"),
    }
    visual.update(blocks("visual.transformer"))

    text: Dict[str, Any] = {
        "token_embedding": {"embedding": _require(sd, "token_embedding.weight")},
        "positional_embedding": _require(sd, "positional_embedding"),
        "ln_final": {"scale": _require(sd, "ln_final.weight"),
                     "bias": _require(sd, "ln_final.bias")},
        "text_projection": _require(sd, "text_projection"),
    }
    text.update(blocks("transformer"))

    return {"visual": visual, "text": text,
            "logit_scale": _require(sd, "logit_scale").reshape(())}


def load_clip_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """OpenAI .pt (TorchScript archive or plain dict) or HF .bin → flat
    numpy state dict for :func:`convert_clip` (torch stays in interop/
    per the repo convention — the compute path never imports it)."""
    import torch

    try:
        raw = torch.load(path, map_location="cpu", weights_only=False)
    except RuntimeError:
        raw = torch.jit.load(path, map_location="cpu")
    if hasattr(raw, "state_dict"):
        raw = raw.state_dict()
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]
    return {k: v.detach().cpu().float().numpy() for k, v in raw.items()
            if hasattr(v, "detach")}


def merge_into(params: Dict[str, Any], sub: Dict[str, Any],
               path: Tuple[str, ...]) -> None:
    """Graft ``sub`` into ``params['params'][*path]`` in place, checking
    shapes leaf-by-leaf (the non-strict-load analogue: extra target leaves
    keep their fresh init)."""
    node = params["params"]
    for k in path[:-1]:
        node = node[k]
    target = node[path[-1]]

    def graft(dst, src, crumbs=()):
        for k, v in src.items():
            if k not in dst:
                raise KeyError(f"no target param {'/'.join(crumbs + (k,))}")
            if isinstance(v, dict):
                graft(dst[k], v, crumbs + (k,))
            else:
                if tuple(dst[k].shape) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch at {'/'.join(crumbs + (k,))}: "
                        f"{dst[k].shape} vs {v.shape}"
                    )
                dst[k] = np.asarray(v, dtype=np.float32)

    graft(target, sub)
