"""Parameter and batch partition rules.

Rule-based mapping from flattened parameter paths to ``PartitionSpec``s, in
the spirit of t5x partitioning but specialized to this model zoo.  The rules
shard along the ``model`` axis:

- attention q/k/v and FFN-up kernels on their *output* feature dim,
- attention-out and FFN-down kernels on their *input* feature dim,

so each TP shard computes a head/neuron slice and XLA inserts one
reduce-scatter/all-reduce per layer over ICI.  Embeddings, LayerNorms,
biases, poolers, mapping networks, and the scorer are replicated (they are
tiny next to the matmuls).  The batch is sharded over ``data`` on the leading
(candidate-flattened) axis.

The reference has no analogue — its TP accounting is "absent"
(SURVEY.md §2.6); this module is the TPU-native replacement for the unused
NCCL/Horovod plumbing (run_PMR_ModCR.py:403-448, utils/distributed.py).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex over "/"-joined param path, PartitionSpec) — first match wins.
PARAM_RULES: Tuple[Tuple[str, P], ...] = (
    # Attention projections: kernels are [D_in, D_out].
    (r".*/attention/(query|key|value)/kernel$", P(None, "model")),
    (r".*/attention/out/kernel$", P("model", None)),
    # Fusion cls-layer cross-attention.
    (r".*/(q_proj|k_proj|v_proj)/kernel$", P(None, "model")),
    (r".*/out_proj/kernel$", P("model", None)),
    # FFN.
    (r".*/ffn/intermediate/kernel$", P(None, "model")),
    (r".*/ffn/output/kernel$", P("model", None)),
    # GPT-2 decoder blocks (models/gpt2.py: attn/crossattention q·k·v·out,
    # mlp_c_fc/mlp_c_proj — flat names, no "mlp/" scope).
    (r".*/(attn|crossattention)/(q|k|v)/kernel$", P(None, "model")),
    (r".*/(attn|crossattention)/out/kernel$", P("model", None)),
    (r".*/mlp_c_fc/kernel$", P(None, "model")),
    (r".*/mlp_c_proj/kernel$", P("model", None)),
    # Embedding tables: replicate (vocab gathers are cheap at this scale).
    (r".*", P()),
)


def _spec_for(path: str, ndim: int) -> P:
    for pattern, spec in PARAM_RULES:
        if re.fullmatch(pattern, path):
            if len(spec) > ndim:  # biases etc. that match a kernel rule
                return P()
            if len(spec) == ndim - 1 and "/layers/layer/" in path:
                # scanned tower (RobertaConfig.scan_layers): kernels carry
                # a leading [num_layers] stack axis — replicate it, shard
                # the original dims per the rule
                return P(None, *spec)
            return spec
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """PyTree of NamedShardings matching ``params``' structure."""

    def assign(path, leaf):
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        return NamedSharding(mesh, _spec_for(name, leaf.ndim))

    return jax.tree_util.tree_map_with_path(assign, params)


# batch keys whose leading axis is NOT the example/row axis — the
# device-resident feature table (data/device_table.py) is indexed by
# image id and must replicate, not row-shard
from multimodal_context_reasoning_tpu.data.device_table import TABLE_KEYS

_REPLICATED_BATCH_KEYS = frozenset(TABLE_KEYS)


def batch_shardings(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Shard every batch array over ``data`` on its leading axis (tables
    replicate — see _REPLICATED_BATCH_KEYS)."""

    def assign(path, x):
        key = str(getattr(path[-1], "key", "")) if path else ""
        if key in _REPLICATED_BATCH_KEYS:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))

    return jax.tree_util.tree_map_with_path(assign, batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
