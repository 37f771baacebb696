"""One-call assembly of ModCR params from the reference's artifact set.

Mirrors the reference's model-build sequence (run_PMR_ModCR.py:709-835):

1. Oscar-base ``BertImgModel`` weights → global encoder (:727-730), with the
   45 ``<|det#|>`` token rows appended (:715-716,730);
2. ChunkAlign pretrain dict: strip the ``seq_enc.`` prefix, load into the
   sequence encoder (:752-763);
3. ``roberta-large`` → prefix reasoner, token-type table re-initialised to
   2 rows (:772-781);
4. optional ModCR checkpoint (the ``{'net': ...}`` torch.save form,
   :236-239).  Two shapes exist in the wild:

   - **full composite** — a complete ``Abstract_Specific`` state dict
     (``calec.global_enc.*``, ``calec.seq_enc.*``, ``calec.cls_ensemble_1.*``,
     ``calec.cls_layer_lyx.N.*``, ``roberta.*``, mapping networks, scorer);
     the reference loads it with ``load_state_dict(params)`` for --do_test
     (run_PMR_ModCR.py:802-806) — this is how the published 0.8492/0.8573
     checkpoints must be restored;
   - **cold start** — same dict but with ``mapping_network_vision.`` /
     ``mapping_network_alignment.`` / ``classifier.`` keys deleted before a
     non-strict load (:819-832), so those heads keep their fresh init.

Every step is pure dict surgery over numpy state dicts
(interop/torch_bridge.py); nothing touches the network.  Unlike the
reference's silent ``strict=False`` loads, every call returns an
:class:`AssembleReport` accounting for EVERY source key — consumed into the
param tree, skipped with a documented reason (the reference's dead heads),
or unexpectedly unconsumed (an error by default).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Set

import numpy as np

from multimodal_context_reasoning_tpu.core.config import ModCRConfig
from multimodal_context_reasoning_tpu.interop.torch_bridge import (
    StateDict,
    convert_bert_encoder,
    convert_roberta,
    delete_keys_matching,
    load_torch_state_dict,
    merge_into,
)

COLD_START_DROPPED = (
    "mapping_network_vision.",
    "mapping_network_alignment.",
    "classifier.",
)

# Abstract_Specific / CALeC parameters that exist in every reference
# checkpoint but are never read by the production forward — each entry is
# (prefix, reason with reference citation).  Keys under these prefixes are
# reported as skipped, not errors.
_KNOWN_DEAD = (
    ("calec.cls_layer.", "ClsLayer2 stack constructed but prod forward uses "
                         "cls_layer_lyx only (v10.py:884-885,976-977)"),
    ("calec.classifier.", "dead CALeC head (v10.py:886, return path commented "
                          "out :999-1013)"),
    ("calec.fusion_align.", "dead CALeC head (v10.py:887; consumer block is "
                            "commented out :920-941)"),
    ("calec.prior.", "dead CALeC head (v10.py:889; prior_score path commented "
                     "out :942,968)"),
    ("classifier.", "dead Abstract_Specific head (ensemble:432-435; logits "
                    "path commented out :508-510)"),
    ("confidence_scorer.", "dead Abstract_Specific head (ensemble:438; "
                           "specific_logits commented out :510)"),
    ("promptfuse.", "PromptFuse ablation embedding, unused in prod forward "
                    "(ensemble:458, usage commented :477-481)"),
)
# Within each cls_layer_lyx block: the BertLayer base attention and two dead
# heads (ClsLayer_lyx.forward reads only cross_attention/LayerNorm/
# intermediate/output, v10.py:857-870).
_CLS_LYX_DEAD = ("attention.", "ensemble.", "dense.")


class _TrackedSD(dict):
    """Flat state dict recording every key actually read (by its ORIGINAL
    checkpoint name, surviving prefix-stripping views).

    ``_get``/``_require`` in torch_bridge read via ``sd[name]`` after an
    ``in`` check, so ``__getitem__`` is the single consumption point.
    """

    def __init__(self, base: Dict[str, Any], consumed: Optional[Set[str]] = None,
                 names: Optional[Dict[str, str]] = None):
        super().__init__(base)
        self.consumed: Set[str] = consumed if consumed is not None else set()
        self.names: Dict[str, str] = names or {}

    def full_name(self, key: str) -> str:
        return self.names.get(key, key)

    def __getitem__(self, key):
        value = super().__getitem__(key)
        self.consumed.add(self.full_name(key))
        return value

    def sub(self, prefix: str) -> "_TrackedSD":
        """Tracked view of the keys under ``prefix`` (names recorded in
        full)."""
        base: Dict[str, Any] = {}
        names: Dict[str, str] = {}
        for k in dict.keys(self):
            if k.startswith(prefix):
                bare = k[len(prefix):]
                base[bare] = dict.__getitem__(self, k)
                names[bare] = self.full_name(k)
        return _TrackedSD(base, self.consumed, names)


@dataclasses.dataclass
class AssembleReport:
    """Per-source-key accounting for one checkpoint graft."""

    consumed: Set[str] = dataclasses.field(default_factory=set)
    skipped: Dict[str, str] = dataclasses.field(default_factory=dict)  # key -> reason
    unconsumed: Set[str] = dataclasses.field(default_factory=set)

    def merge(self, other: "AssembleReport") -> None:
        self.consumed |= other.consumed
        self.skipped.update(other.skipped)
        self.unconsumed |= other.unconsumed

    def summary(self) -> str:
        lines = [
            f"consumed={len(self.consumed)} skipped={len(self.skipped)} "
            f"unconsumed={len(self.unconsumed)}"
        ]
        for k in sorted(self.unconsumed):
            lines.append(f"  UNCONSUMED: {k}")
        return "\n".join(lines)


def _finish(report: AssembleReport, sd: _TrackedSD, strict: bool,
            extra=()) -> None:
    """Classify leftovers: known-dead prefixes (plus the caller's ``extra``
    ``(regex, reason)`` pairs) → skipped, rest → unconsumed."""
    import re

    report.consumed |= sd.consumed
    for key in sd:
        full = sd.full_name(key)
        if full in report.consumed or full in report.skipped:
            continue
        reason = None
        for pattern, why in extra:
            if re.search(pattern, key):
                reason = why
                break
        if reason is None and (
            key.endswith(".position_ids") or key == "position_ids"
        ):
            reason = "HF position-id buffer (not a parameter)"
        if reason is None:
            for prefix, why in _KNOWN_DEAD:
                if key.startswith(prefix):
                    reason = why
                    break
            if reason is None and re.match(
                r"calec\.cls_layer_lyx\.\d+\.(%s)"
                % "|".join(re.escape(p) for p in _CLS_LYX_DEAD), key
            ):
                reason = ("BertLayer base attention / dead heads inside "
                          "ClsLayer_lyx (forward reads only cross_attention/"
                          "LayerNorm/intermediate/output, v10.py:857-870)")
        if reason is not None:
            report.skipped[full] = reason
        else:
            report.unconsumed.add(full)
    if strict and report.unconsumed:
        raise KeyError(
            "checkpoint keys were neither grafted nor known-dead:\n"
            + "\n".join(f"  {k}" for k in sorted(report.unconsumed))
        )


def _lin(sd: _TrackedSD, prefix: str) -> Dict[str, np.ndarray]:
    """torch Linear → Flax Dense dict (transpose)."""
    out: Dict[str, np.ndarray] = {
        "kernel": np.ascontiguousarray(sd[prefix + "weight"].T)
    }
    if prefix + "bias" in sd:
        out["bias"] = sd[prefix + "bias"]
    return out


def _ln(sd: _TrackedSD, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": sd[prefix + "weight"], "bias": sd[prefix + "bias"]}


def _graft_encoder(params, sd: _TrackedSD, target: str, cfg_enc) -> None:
    # Normalize a "bert."-prefixed dict here (the converter would otherwise
    # rebuild a plain dict and lose consumption tracking).
    if any(k.startswith("bert.") for k in sd):
        base: Dict[str, Any] = {}
        names: Dict[str, str] = {}
        for k in list(dict.keys(sd)):
            if k.startswith("bert."):
                base[k[5:]] = dict.__getitem__(sd, k)
                names[k[5:]] = sd.full_name(k)
        for k in list(dict.keys(sd)):            # bare keys win on collision
            if not k.startswith("bert."):
                base[k] = dict.__getitem__(sd, k)
                names[k] = sd.full_name(k)
        sd = _TrackedSD(base, sd.consumed, names)
    tree = convert_bert_encoder(
        sd, cfg_enc.num_hidden_layers, vocab_size=cfg_enc.vocab_size,
    )
    for key, subtree in tree.items():
        merge_into(params, subtree, (target, key))


def _graft_heads(params, sd: _TrackedSD) -> None:
    """Mapping networks (torch Sequential indices 1/4) + scorer
    (ensemble:439-457,437)."""
    head_map = {
        "mapping_network_vision.1.": ("mapping_network_vision", "dense0"),
        "mapping_network_vision.4.": ("mapping_network_vision", "dense1"),
        "mapping_network_alignment.1.": ("mapping_network_alignment", "dense0"),
        "mapping_network_alignment.4.": ("mapping_network_alignment", "dense1"),
        "abst_confidence_scorer.": ("abst_confidence_scorer",),
    }
    for prefix, path in head_map.items():
        if prefix + "weight" not in sd:
            continue
        sub = _lin(sd, prefix)
        if len(path) == 2:
            merge_into(params, {path[1]: sub}, (path[0],))
        else:
            merge_into(params, sub, path)


def _graft_fusion(params, sd: _TrackedSD, cfg: ModCRConfig) -> None:
    """CALeC fusion stack: cls_ensemble_1 + cls_layer_lyx.N
    (v10.py:877,885) → fusion/cls_ensemble_1 + fusion/cls_layer_N."""
    if "calec.cls_ensemble_1.weight" in sd:
        merge_into(params, {"cls_ensemble_1": _lin(sd, "calec.cls_ensemble_1.")},
                   ("fusion",))
    for i in range(cfg.chunkalign.cls_layer_num):
        p = f"calec.cls_layer_lyx.{i}."
        if p + "cross_attention.q_proj.weight" not in sd:
            continue
        layer = {
            "q_proj": _lin(sd, p + "cross_attention.q_proj."),
            "k_proj": _lin(sd, p + "cross_attention.k_proj."),
            "v_proj": _lin(sd, p + "cross_attention.v_proj."),
            "out_proj": _lin(sd, p + "cross_attention.out_proj."),
            "layer_norm": _ln(sd, p + "LayerNorm."),
            "ffn": {
                "intermediate": _lin(sd, p + "intermediate.dense."),
                "output": _lin(sd, p + "output.dense."),
                "output_layer_norm": _ln(sd, p + "output.LayerNorm."),
            },
        }
        merge_into(params, {f"cls_layer_{i}": layer}, ("fusion",))


def assemble_modcr_params(
    params: Dict[str, Any],
    cfg: ModCRConfig,
    *,
    oscar_sd: Optional[StateDict] = None,
    chunkalign_sd: Optional[StateDict] = None,
    roberta_sd: Optional[StateDict] = None,
    modcr_sd: Optional[StateDict] = None,
    cold_start: bool = False,
    strict: bool = True,
) -> AssembleReport:
    """Graft converted reference weights into a freshly-initialized ModCR
    param tree, in place.  Any source may be omitted (its submodel keeps
    the fresh init — the non-strict-load semantics).

    ``modcr_sd`` may be a heads-only dict or a **full** ``Abstract_Specific``
    state dict (run_PMR_ModCR.py:802-806); the full form restores the
    fine-tuned CALeC fusion stack, both encoders, and RoBERTa too.

    ``cold_start=True`` reproduces the stage-1 surgery
    (run_PMR_ModCR.py:819-832): the mapping networks and scorer keys of
    ``modcr_sd`` are dropped so those heads keep their fresh init; False
    (evaluation / resume) grafts them too.

    Returns an :class:`AssembleReport`; with ``strict=True`` (default) any
    source key that is neither grafted nor known-dead raises.
    """
    report = AssembleReport()

    if oscar_sd is not None:
        sd = _TrackedSD(oscar_sd)
        _graft_encoder(params, sd, "global_enc", cfg.global_encoder)
        _finish(report, sd, strict)

    if chunkalign_sd is not None:
        consumed: Set[str] = set()
        sd = _TrackedSD(chunkalign_sd, consumed)
        if any(k.startswith("seq_enc.") for k in sd):
            sd = sd.sub("seq_enc.")             # run_PMR_ModCR.py:756-762
        _graft_seq_encoder(params, sd, cfg.seq_encoder)
        _finish(report, sd, strict)

    if roberta_sd is not None:
        sd = _TrackedSD(roberta_sd)
        _graft_roberta(params, sd, cfg, report)
        _finish(report, sd, strict)

    if modcr_sd is not None:
        sd_raw = modcr_sd
        if cold_start:
            # stage-1 surgery (:819-832): heads stay freshly initialized
            dropped = [k for k in sd_raw if k.startswith(COLD_START_DROPPED)]
            sd_raw = delete_keys_matching(sd_raw, COLD_START_DROPPED)
            for k in dropped:
                report.skipped[k] = ("cold-start surgery deletes this key "
                                     "before the non-strict load "
                                     "(run_PMR_ModCR.py:819-832)")
        sd = _TrackedSD(sd_raw)
        if any(k.startswith("calec.") for k in sd):
            _graft_encoder(params, sd.sub("calec.global_enc."),
                           "global_enc", cfg.global_encoder)
            _graft_seq_encoder(params, sd.sub("calec.seq_enc."), cfg.seq_encoder)
            _graft_fusion(params, sd, cfg)
        if any(k.startswith("roberta.") for k in sd):
            # fine-tuned reasoner inside the composite: keep its trained
            # 2-row token-type table instead of re-initialising
            _graft_roberta(params, sd.sub("roberta."), cfg, report,
                           keep_token_type=True)
        _graft_heads(params, sd)
        _finish(report, sd, strict)

    return report


def _graft_seq_encoder(params, sd: _TrackedSD, cfg_enc) -> None:
    _graft_encoder(params, sd, "seq_enc", cfg_enc)
    # SeqBertImgModel's extra edge_dense embedding (v10.py:260) — unused by
    # forward but a real checkpoint key; keep it for round-trip fidelity.
    if "edge_dense.weight" in sd:
        merge_into(params, {"edge_dense": sd["edge_dense.weight"]}, ("seq_enc",))


def _graft_roberta(params, sd: _TrackedSD, cfg: ModCRConfig,
                   report: AssembleReport, *,
                   keep_token_type: bool = False) -> None:
    if any(k.startswith("roberta.") for k in sd):
        sd = sd.sub("roberta.")                   # keep tracking through strip
    if not keep_token_type and "embeddings.token_type_embeddings.weight" in sd:
        # the reference replaces the pretrained table with a fresh 2-row one
        report.skipped[
            sd.full_name("embeddings.token_type_embeddings.weight")
        ] = ("token-type table re-initialised to 2 rows "
             "(run_PMR_ModCR.py:779-781)")
    tree = convert_roberta(
        sd, cfg.roberta.num_hidden_layers,
        vocab_size=cfg.roberta.vocab_size,
        reinit_token_types=cfg.roberta.type_vocab_size,
        keep_token_type=keep_token_type,
    )
    for key, subtree in tree.items():
        merge_into(params, subtree, ("roberta", key))


def assemble_rationale_params(
    params: Dict[str, Any],
    enc_cfg,
    gpt2_cfg,
    rationale_sd: StateDict,
    *,
    cls_layer_num: int = 3,
    strict: bool = True,
) -> AssembleReport:
    """Graft a reference ``ChunkAlign_CLS_dec5_4`` checkpoint
    (v10.py:1319-1494) into a :class:`RationaleModel` param tree, in place —
    the rationale-family counterpart of :func:`assemble_modcr_params`
    (feeds serving/generator.py from reference-trained weights).

    Key space: ``global_enc.*`` / ``seq_enc.*`` (BertImgModel layouts,
    edge_dense kept), ``cls_ensemble`` + ``classifier`` linears,
    ``cls_layer.N.*`` (ClsLayer2: cls_q_proj/align_k_proj/dense +
    LayerNorm/FFN), ``dec.*`` (vendored GPT-2 w/ cross-attention), and the
    UNTIED ``lm_head`` (v10.py:1335).
    """
    from multimodal_context_reasoning_tpu.interop.torch_bridge import (
        convert_gpt2,
    )

    report = AssembleReport()
    sd = _TrackedSD(rationale_sd)
    _graft_encoder(params, sd.sub("global_enc."), "global_enc", enc_cfg)
    _graft_seq_encoder(params, sd.sub("seq_enc."), enc_cfg)
    merge_into(params, _lin(sd, "cls_ensemble."), ("cls_ensemble",))
    merge_into(params, _lin(sd, "classifier."), ("classifier",))
    for i in range(cls_layer_num):
        p = f"cls_layer.{i}."
        layer = {
            "cls_q_proj": _lin(sd, p + "cls_q_proj."),
            "align_k_proj": _lin(sd, p + "align_k_proj."),
            "dense": _lin(sd, p + "dense."),
            "layer_norm": _ln(sd, p + "LayerNorm."),
            "ffn": {
                "intermediate": _lin(sd, p + "intermediate.dense."),
                "output": _lin(sd, p + "output.dense."),
                "output_layer_norm": _ln(sd, p + "output.LayerNorm."),
            },
        }
        merge_into(params, layer, (f"cls_layer_{i}",))
    dec_tree = convert_gpt2(sd.sub("dec."), gpt2_cfg.n_layer)
    dec_tree["lm_head"] = {
        "kernel": np.ascontiguousarray(sd["lm_head.weight"].T)
    }
    merge_into(params, dec_tree, ("dec",))

    # leftovers: GPT-2 registers causal-mask constants as state-dict
    # buffers; ClsLayer2 carries the same dead BertLayer heads as the
    # ensemble's lyx blocks
    _finish(report, sd, strict, extra=(
        (r"^dec\.h\.\d+\.(crossattention|attn)\.(bias|masked_bias)$",
         "GPT-2 causal-mask buffer, not a parameter "
         "(modeling_transfomres.py Attention.register_buffer)"),
        (r"^cls_layer\.\d+\.attention\.",
         "dead BertSelfAttention inside ClsLayer2 — its forward reads "
         "only cls_q_proj/align_k_proj/dense/LayerNorm/FFN "
         "(v10.py:801-837)"),
    ))
    return report


def assemble_chunkalign_cls_params(
    params: Dict[str, Any],
    enc_cfg,
    cls_sd: StateDict,
    *,
    cls_layer_num: int = 3,
    strict: bool = True,
) -> AssembleReport:
    """Graft a reference ``ChunkAlign_CLS_enc4_align`` checkpoint
    (v10.py:1016-1165 — the stage-1 ChunkAlign-pretrain regime whose
    ``seq_enc.`` keys the production trainer strips and loads,
    run_PMR_ModCR.py:752-763) into a
    :class:`~..models.chunkalign_cls.ChunkAlignClassifier` param tree, in
    place.

    Key space: ``global_enc.*`` / ``seq_enc.*`` (BertImgModel layouts,
    edge_dense kept), ``cls_ensemble`` + ``classifier`` linears, and
    ``cls_layer.N.*`` (ClsLayer2: cls_q_proj/align_k_proj/dense +
    LayerNorm/FFN) — :func:`assemble_rationale_params` minus the GPT-2
    decoder.  Round-trips with
    :func:`~..interop.export.export_chunkalign_cls_state_dict`.
    """
    report = AssembleReport()
    sd = _TrackedSD(cls_sd)
    _graft_encoder(params, sd.sub("global_enc."), "global_enc", enc_cfg)
    _graft_seq_encoder(params, sd.sub("seq_enc."), enc_cfg)
    merge_into(params, _lin(sd, "cls_ensemble."), ("cls_ensemble",))
    merge_into(params, _lin(sd, "classifier."), ("classifier",))
    for i in range(cls_layer_num):
        p = f"cls_layer.{i}."
        layer = {
            "cls_q_proj": _lin(sd, p + "cls_q_proj."),
            "align_k_proj": _lin(sd, p + "align_k_proj."),
            "dense": _lin(sd, p + "dense."),
            "layer_norm": _ln(sd, p + "LayerNorm."),
            "ffn": {
                "intermediate": _lin(sd, p + "intermediate.dense."),
                "output": _lin(sd, p + "output.dense."),
                "output_layer_norm": _ln(sd, p + "output.LayerNorm."),
            },
        }
        merge_into(params, layer, (f"cls_layer_{i}",))
    _finish(report, sd, strict, extra=(
        (r"^cls_layer\.\d+\.attention\.",
         "dead BertSelfAttention inside ClsLayer2 — its forward reads "
         "only cls_q_proj/align_k_proj/dense/LayerNorm/FFN "
         "(v10.py:801-837)"),
    ))
    return report


def assemble_from_files(
    params: Dict[str, Any],
    cfg: ModCRConfig,
    *,
    oscar_path: Optional[str] = None,
    chunkalign_path: Optional[str] = None,
    roberta_path: Optional[str] = None,
    modcr_path: Optional[str] = None,
    cold_start: bool = False,
    strict: bool = True,
) -> AssembleReport:
    load = lambda p: load_torch_state_dict(p) if p else None
    return assemble_modcr_params(
        params, cfg,
        oscar_sd=load(oscar_path),
        chunkalign_sd=load(chunkalign_path),
        roberta_sd=load(roberta_path),
        modcr_sd=load(modcr_path),
        cold_start=cold_start,
        strict=strict,
    )
