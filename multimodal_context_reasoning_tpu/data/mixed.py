"""Multi-task dataset mixing — one batch stream over PMR + VCR featurizers.

The reference pretrains its grafted ChunkAlign checkpoint on ONE task's
data and reuses it across tasks (run_PMR_ModCR.py:555 loads a
VCR-pretrained ``checkpoint-6-2625-acc-0.8164`` into the PMR composite);
it has no in-repo multi-task pretraining path.  This module adds one:
both featurizers emit the same fixed-geometry candidate batches
(data/collate.py::BatchSpec), so a mixture is just index concatenation —
each example is featurized by its OWNING dataset (PMR prompt template vs
VCR truncation heuristic stay task-faithful) and the collate is shared.

Used by scripts/train_two_stage.py ``--stage1_task both`` to pretrain the
ChunkAlign towers on the union of the PMR and VCR splits before the
cold-start surgery.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from .collate import collate_candidates


class MixedDataset:
    """Concatenates featurizer datasets that share a :class:`BatchSpec`.

    Exposes the same surface the :class:`DataLoader` consumes
    (``__len__`` + ``batch(indices)``), so a mixture drops into any
    trainer/eval path unchanged.  A batch may span children: each
    example's candidates come from its owner's ``featurize`` (cached
    there), and the fixed-shape collate runs once over the union.
    """

    def __init__(self, datasets: Sequence):
        if not datasets:
            raise ValueError("MixedDataset needs at least one dataset")
        self.datasets = list(datasets)
        spec0 = self.datasets[0].spec
        for d in self.datasets[1:]:
            if d.spec != spec0:
                raise ValueError(
                    f"all children must share one BatchSpec; got {d.spec} "
                    f"vs {spec0}"
                )
        self.spec = spec0
        # flat index -> (child, local index); children keep their own
        # featurize caches
        self._owner = [
            (d, j) for d in self.datasets for j in range(len(d))
        ]
        # device-table mode: every child must gather from the SAME
        # resident table (rows for the union of img_ids) or the batch's
        # table buffers would differ per example
        tables = {
            id(getattr(d, "device_table", None)) for d in self.datasets
        }
        if len(tables) != 1:
            raise ValueError(
                "children disagree on device-table mode; build ONE table "
                "over the union of img_ids and use_device_table() it on "
                "every child (or none)"
            )
        t = getattr(self.datasets[0], "device_table", None)
        if t is not None:
            self.device_table = t

    def __len__(self) -> int:
        return len(self._owner)

    def use_device_table(self, table) -> None:
        """Switch the mixture (and every child) to device-table mode."""
        self.device_table = table
        for d in self.datasets:
            d.use_device_table(table)

    def batch(self, indices: Sequence[int]) -> Dict[str, np.ndarray]:
        owners = [self._owner[int(i)] for i in indices]
        cands = [d._featurize_cached(j) for d, j in owners]
        table = getattr(self, "device_table", None)
        if table is None:
            imgs = [d.get_image(d.examples[j]) for d, j in owners]
            return collate_candidates(cands, imgs, self.spec)
        out = collate_candidates(cands, None, self.spec)
        rows = np.repeat(
            np.asarray(
                [table.row_for(d.examples[j].img_id) for d, j in owners],
                np.int32,
            ),
            self.spec.num_labels,
        )
        out["img_row"] = rows
        out["feat_table"] = table.table
        out["feat_mask_table"] = table.mask
        return out
