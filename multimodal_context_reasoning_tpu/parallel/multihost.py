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

from typing import Dict

import numpy as np

import jax
from jax.sharding import Mesh, PartitionSpec


def global_batch(
    batch: Dict[str, np.ndarray],
    mesh: Mesh,
    axis: str = "data",
) -> Dict[str, jax.Array]:
    """Per-process local batch shards → global arrays sharded over ``axis``.

    Every process must call this with its own equally-sized shard; the
    concatenation over processes (in process order) forms the global batch.
    """
    from jax.experimental import multihost_utils

    if "feat_table" in batch:
        raise ValueError(
            "device-table batches are single-host scope: the table must "
            "not be row-sharded by the global lift — build one "
            "DeviceFeatureTable per host and keep batches local, or drop "
            "use_device_table for multi-host runs"
        )
    batch = {k: np.asarray(v) for k, v in batch.items()}
    return multihost_utils.host_local_array_to_global_array(
        batch, mesh, PartitionSpec(axis)
    )
