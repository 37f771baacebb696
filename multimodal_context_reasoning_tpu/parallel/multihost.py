"""Multi-host (DCN) data ingestion.

The SPMD train/eval programs span every process after
``jax.distributed.initialize`` (cli/common.py ``maybe_init_distributed`` —
the TPU-native replacement for the reference's dead NCCL env-init,
run_PMR_ModCR.py:423-448).  What does NOT come free is data: each process
holds only its shard of the batch (the DataLoader's
``shard=(process_index, process_count)``), and pjit needs GLOBAL arrays.
:func:`global_batch` lifts per-process host-local shards into global
``jax.Array``s laid out row-sharded over the mesh's ``data`` axis.

Validated by a real 2-process CPU run in
tests/test_multihost.py::test_two_process_train_step (both ranks compute
the identical psum'd loss).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, PartitionSpec

# Batch keys whose leading axis is the image id, not the example row — the
# device-resident feature table.  These must lift REPLICATED (every host
# builds the identical table: DeviceFeatureTable sorts its keys, so same
# features dict → same array), while the rest of the batch row-shards over
# ``axis``.  Single source of truth: data/device_table.py.
from multimodal_context_reasoning_tpu.data.device_table import (
    TABLE_KEYS as _TABLE_KEYS,
)

# id(local array) → (src ref, mesh ref, lifted global array).  The source
# refs keep the ids stable; the table is the loop's largest array and every
# batch carries the SAME buffer, so the lift must happen once, not per
# step.  Bounded FIFO: an evicted still-live table only costs a re-lift.
_replicated_cache: "collections.OrderedDict[int, Tuple[Any, Mesh, jax.Array]]" = (
    __import__("collections").OrderedDict()
)
_REPLICATED_CACHE_MAX = 8


def _lift_replicated(x, mesh: Mesh, name: str) -> jax.Array:
    """Host-identical array → fully-replicated global array (cached).

    Cross-host agreement check: a position-sensitive digest (CRC32 over
    the raw bytes + shape) is allgathered and compared — divergent
    per-host tables would otherwise be silently wrong (each device reads
    its own host's copy under a replicated spec), and a permutation-
    invariant sum would miss the likeliest divergence (same features,
    different key order → rows permuted).
    """
    import zlib

    from jax.experimental import multihost_utils

    hit = _replicated_cache.get(id(x))
    if hit is not None and hit[0] is x and hit[1] is mesh:
        return hit[2]
    local = np.asarray(x)
    digest = np.asarray(
        [zlib.crc32(np.ascontiguousarray(local).tobytes()), *local.shape],
        np.float64,
    )
    digests = multihost_utils.process_allgather(digest)
    if not np.all(digests == digests[0]):
        raise ValueError(
            f"device-table batch key {name!r} differs across hosts "
            f"(digests {digests.tolist()}); every process must build its "
            "DeviceFeatureTable from the same image-feature dict"
        )
    glob = multihost_utils.host_local_array_to_global_array(
        local, mesh, PartitionSpec()
    )
    _replicated_cache[id(x)] = (x, mesh, glob)
    while len(_replicated_cache) > _REPLICATED_CACHE_MAX:
        _replicated_cache.popitem(last=False)
    return glob


def global_batch(
    batch: Dict[str, np.ndarray],
    mesh: Mesh,
    axis: str = "data",
) -> Dict[str, jax.Array]:
    """Per-process local batch shards → global arrays sharded over ``axis``.

    Every process must call this with its own equally-sized shard; the
    concatenation over processes (in process order) forms the global batch.
    Device-table keys (``feat_table``/``feat_mask_table``) lift replicated
    instead — once, cached — so multi-host runs keep the ship-ids-not-floats
    data path (data/device_table.py).
    """
    from jax.experimental import multihost_utils

    tables = {k: batch[k] for k in _TABLE_KEYS if k in batch}
    rows = {
        k: np.asarray(v) for k, v in batch.items() if k not in tables
    }
    out = multihost_utils.host_local_array_to_global_array(
        rows, mesh, PartitionSpec(axis)
    )
    for k, v in tables.items():
        out[k] = _lift_replicated(v, mesh, k)
    return out
