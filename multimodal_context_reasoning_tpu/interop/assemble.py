"""One-call assembly of ModCR params from the reference's artifact set.

Mirrors the reference's model-build sequence (run_PMR_ModCR.py:709-835):

1. Oscar-base ``BertImgModel`` weights → global encoder (:727-730), with the
   45 ``<|det#|>`` token rows appended (:715-716,730);
2. ChunkAlign pretrain dict: strip the ``seq_enc.`` prefix, load into the
   sequence encoder (:752-763);
3. ``roberta-large`` → prefix reasoner, token-type table re-initialised to
   2 rows (:772-781);
4. optional ModCR checkpoint (the ``{'net': ...}`` torch.save form,
   :236-239): cold-start surgery deletes ``mapping_network_vision.`` /
   ``mapping_network_alignment.`` / ``classifier.`` keys then non-strict
   loads the rest over the assembled tree (:819-832).

Every step is pure dict surgery over numpy state dicts
(interop/torch_bridge.py); nothing touches the network.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from multimodal_context_reasoning_tpu.core.config import ModCRConfig
from multimodal_context_reasoning_tpu.interop.torch_bridge import (
    StateDict,
    convert_bert_encoder,
    convert_roberta,
    delete_keys_matching,
    load_torch_state_dict,
    merge_into,
    strip_prefix,
)

COLD_START_DROPPED = (
    "mapping_network_vision.",
    "mapping_network_alignment.",
    "classifier.",
)


def assemble_modcr_params(
    params: Dict[str, Any],
    cfg: ModCRConfig,
    *,
    oscar_sd: Optional[StateDict] = None,
    chunkalign_sd: Optional[StateDict] = None,
    roberta_sd: Optional[StateDict] = None,
    modcr_sd: Optional[StateDict] = None,
    cold_start: bool = False,
) -> Dict[str, Any]:
    """Graft converted reference weights into a freshly-initialized ModCR
    param tree, in place.  Any source may be omitted (its submodel keeps
    the fresh init — the non-strict-load semantics).

    ``cold_start=True`` reproduces the stage-1 surgery
    (run_PMR_ModCR.py:819-832): the mapping networks and scorer keys of
    ``modcr_sd`` are dropped so those heads keep their fresh init; False
    (evaluation / resume) grafts them too."""
    if oscar_sd is not None:
        tree = convert_bert_encoder(
            oscar_sd, cfg.global_encoder.num_hidden_layers,
            vocab_size=cfg.global_encoder.vocab_size,
        )
        for key, sub in tree.items():
            merge_into(params, sub, ("global_enc", key))

    if chunkalign_sd is not None:
        sd = chunkalign_sd
        if any(k.startswith("seq_enc.") for k in sd):
            sd = strip_prefix(sd, "seq_enc.")       # run_PMR_ModCR.py:756-762
        tree = convert_bert_encoder(
            sd, cfg.seq_encoder.num_hidden_layers,
            vocab_size=cfg.seq_encoder.vocab_size,
        )
        for key, sub in tree.items():
            merge_into(params, sub, ("seq_enc", key))

    if roberta_sd is not None:
        tree = convert_roberta(
            roberta_sd, cfg.roberta.num_hidden_layers,
            vocab_size=cfg.roberta.vocab_size,
        )
        for key, sub in tree.items():
            merge_into(params, sub, ("roberta", key))

    if modcr_sd is not None:
        sd = modcr_sd
        if cold_start:
            # stage-1 surgery (:819-832): heads stay freshly initialized
            sd = delete_keys_matching(sd, COLD_START_DROPPED)
        head_map = {
            # torch Sequential indices → our MappingNetwork names
            "mapping_network_vision.1.": ("mapping_network_vision", "dense0"),
            "mapping_network_vision.4.": ("mapping_network_vision", "dense1"),
            "mapping_network_alignment.1.": ("mapping_network_alignment", "dense0"),
            "mapping_network_alignment.4.": ("mapping_network_alignment", "dense1"),
            "abst_confidence_scorer.": ("abst_confidence_scorer",),
        }
        import numpy as np

        for prefix, path in head_map.items():
            w = sd.get(prefix + "weight")
            b = sd.get(prefix + "bias")
            if w is None:
                continue
            sub: Dict[str, Any] = {"kernel": np.ascontiguousarray(w.T)}
            if b is not None:
                sub["bias"] = b
            if len(path) == 2:
                merge_into(params, {path[1]: sub}, (path[0],))
            else:
                merge_into(params, sub, path)

    return params


def assemble_from_files(
    params: Dict[str, Any],
    cfg: ModCRConfig,
    *,
    oscar_path: Optional[str] = None,
    chunkalign_path: Optional[str] = None,
    roberta_path: Optional[str] = None,
    modcr_path: Optional[str] = None,
    cold_start: bool = False,
) -> Dict[str, Any]:
    load = lambda p: load_torch_state_dict(p) if p else None
    return assemble_modcr_params(
        params, cfg,
        oscar_sd=load(oscar_path),
        chunkalign_sd=load(chunkalign_path),
        roberta_sd=load(roberta_path),
        modcr_sd=load(modcr_path),
        cold_start=cold_start,
    )
