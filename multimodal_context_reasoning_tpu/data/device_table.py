"""Device-resident image-feature table: gather rows on device, ship ids.

The reference materializes every batch's region features on the host and
ships them with the batch (Data/VCRChunkAlign.py:690-741 stacks img_feat
per candidate row) — at production geometry that is ~52 MB of fp32 per
batch-32 step, the single largest host→device transfer of the training
loop.  On TPU the natural layout is the opposite: keep the WHOLE feature
table resident in HBM once (bf16: 2 bytes × I × F per image — the
reference's full PMR image set is well under 1 GB) and gather the batch's
rows inside the jitted step from a [N] int32 index vector (~0.2 MB/batch).

Wiring: :meth:`PMRDataset.use_device_table` switches the dataset's batches
to carry ``img_row`` + references to the resident ``feat_table`` /
``feat_mask_table`` arrays (the same device buffers every batch — the
trainer's ``jnp.asarray`` is a no-op on them, so nothing re-transfers);
``train/step.py::_model_inputs`` expands the gather inside the compiled
program.

Multi-host: every process builds its table from the same image-feature
dict (sorted keys make the array deterministic); ``global_batch``
(parallel/multihost.py) lifts the table keys replicated — once, cached,
with a cross-host checksum guard — while the rest of the batch row-shards.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

# Batch keys whose leading axis is the image id, not the example row.
# Single source of truth — parallel/partition.py replicates them under a
# mesh, parallel/multihost.py lifts them replicated, train/step.py pops
# them for the in-program gather.
TABLE_KEYS = ("feat_table", "feat_mask_table")


class DeviceFeatureTable:
    def __init__(
        self,
        image_features,  # mapping img_id -> ImageFeatures: a dict or the
                         # native FeatureStore (keys() + __getitem__)
        *,
        img_len: int,
        dtype: str = "bfloat16",
        capacity: Optional[int] = None,  # pad the row axis up to a fixed size so a
                               # shape-baked program (AOT artifact) can be
                               # fed from a smaller feature set
    ):
        keys = sorted(image_features.keys())
        if not keys:
            raise ValueError(
                "DeviceFeatureTable needs at least one image feature "
                "(empty mapping — wrong/mis-filtered feature file?)"
            )
        self.row = {k: i for i, k in enumerate(keys)}
        n = len(keys)
        if capacity is not None:
            if n > capacity:
                raise ValueError(
                    f"{n} image features exceed the table capacity "
                    f"{capacity} baked into the compiled program — "
                    "re-export the artifact against the larger set"
                )
            n = capacity
        table = None
        mask = np.zeros((n, img_len), np.float32)
        for i, k in enumerate(keys):
            img = image_features[k]
            if table is None:
                table = np.zeros(
                    (n, img_len, img.features.shape[-1]), np.float32
                )
            r = min(img.num_regions, img_len)
            table[i, :r] = img.features[:r]
            mask[i, :r] = 1.0
        jdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.dtype(dtype)
        self.table = jnp.asarray(table, jdt)       # [n, I, F] resident
        self.mask = jnp.asarray(mask, jnp.float32)  # [n, I]

    @classmethod
    def for_config(
        cls, image_features, cfg, *, capacity: Optional[int] = None
    ) -> "DeviceFeatureTable":
        """Build with geometry + dtype derived from a ``ModCRConfig`` —
        the table dtype must follow the compute dtype (the forward casts
        features there anyway; a bf16 table under fp32 compute would
        silently round the features)."""
        return cls(
            image_features,
            img_len=cfg.img_len,
            dtype="bfloat16"
            if cfg.global_encoder.dtype == "bfloat16" else "float32",
            capacity=capacity,
        )

    def place(self, mesh) -> None:
        """One-time replicated placement across a single-process mesh.

        Without this, a jitted step whose in_shardings pin the table to
        ``P()`` would re-broadcast the (large, uncommitted) array every
        call.  Multi-host runs use parallel/multihost.py instead."""
        from jax.sharding import NamedSharding, PartitionSpec

        import jax

        rep = NamedSharding(mesh, PartitionSpec())
        self.table = jax.device_put(self.table, rep)
        self.mask = jax.device_put(self.mask, rep)

    def row_for(self, img_id: str) -> int:
        key = str(img_id)
        if key in self.row:
            return self.row[key]
        # the reference keys features as "img-<num>" (VCRChunkAlign.py:586)
        return self.row[f"img-{key.split('-')[-1]}"]

    @property
    def nbytes(self) -> int:
        return self.table.nbytes + self.mask.nbytes
