"""Static-shape candidate batching.

Replaces the reference's dynamic collate (``SNLIGPT_gen_collate``,
Data/VCRChunkAlign.py:690-741) which pads to batch-max lengths and trims
image features to the batch's max region count — shapes that change per batch
and would force one XLA recompilation each.  Here every batch is padded to
the fixed geometry in :class:`BatchSpec`, so the jitted step compiles once.

The candidate ×num_labels expansion (each example contributes 4 rows) matches
the reference's unzip-concat flattening (:692-693).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence

import numpy as np

from multimodal_context_reasoning_tpu.data.schemas import CandidateFeatures, ImageFeatures


@dataclasses.dataclass(frozen=True)
class BatchSpec:
    text_len: int = 80
    img_len: int = 50
    roberta_len: int = 128
    num_labels: int = 4
    img_feature_dim: int = 2054
    bert_pad_id: int = 0
    roberta_pad_id: int = 1


def pad_to(x: np.ndarray, length: int, value=0) -> np.ndarray:
    """Pad or truncate a 1-D array to ``length``."""
    x = np.asarray(x)
    if x.shape[0] >= length:
        return x[:length]
    out = np.full((length,) + x.shape[1:], value, dtype=x.dtype)
    out[: x.shape[0]] = x
    return out


def collate_candidates(
    candidates: Sequence[Sequence[CandidateFeatures]],  # [B][num_labels]
    images,                 # [B] ImageFeatures, or None (device-table mode)
    spec: BatchSpec,
) -> Dict[str, np.ndarray]:
    """[B] examples × num_labels candidates → flat [B·num_labels] batch.

    ``images=None`` omits img_feat/img_mask — the caller attaches device-
    table row indices instead (data/device_table.py)."""
    B = len(candidates)
    K = spec.num_labels
    N = B * K
    T, I, R = spec.text_len, spec.img_len, spec.roberta_len

    out = {
        "input_ids": np.zeros((N, T), np.int32),
        "token_type_ids": np.zeros((N, T), np.int32),
        "text_mask": np.zeros((N, T), np.float32),
        "gather_index": np.full((N, T), -1, np.int32),
        "total_label": np.zeros((N, T), np.int32),
        "align_pos": np.zeros((N, T), np.int32),
        "r_input_ids": np.full((N, R), spec.roberta_pad_id, np.int32),
        "r_token_type_ids": np.zeros((N, R), np.int32),
        "r_attention_mask": np.zeros((N, R), np.float32),
        "img_feat": np.zeros((N, I, spec.img_feature_dim), np.float32),
        "img_mask": np.zeros((N, I), np.float32),
        "label": np.zeros((N,), np.float32),
    }

    if images is None:
        # device-table mode (data/device_table.py): image features are
        # gathered ON DEVICE from a resident table — the batch carries row
        # indices instead of materialized [N, I, F] features
        del out["img_feat"], out["img_mask"]
        images = [None] * B
    for b, (cands, img) in enumerate(zip(candidates, images)):
        assert len(cands) == K, f"expected {K} candidates, got {len(cands)}"
        if img is not None:
            n_reg = min(img.num_regions, I)
            feats = img.features[:n_reg].astype(np.float32)
        for k, c in enumerate(cands):
            n = b * K + k
            t = min(len(c.input_ids), T)
            out["input_ids"][n] = pad_to(np.asarray(c.input_ids, np.int32), T, spec.bert_pad_id)
            out["token_type_ids"][n] = pad_to(np.asarray(c.token_type_ids, np.int32), T)
            out["text_mask"][n, :t] = 1.0
            out["gather_index"][n] = pad_to(np.asarray(c.gather_index, np.int32), T, -1)
            out["total_label"][n] = pad_to(np.asarray(c.total_label, np.int32), T)
            out["align_pos"][n] = pad_to(np.asarray(c.align_pos, np.int32), T)
            r = min(len(c.r_input_ids), R)
            out["r_input_ids"][n] = pad_to(
                np.asarray(c.r_input_ids, np.int32), R, spec.roberta_pad_id
            )
            out["r_token_type_ids"][n] = pad_to(np.asarray(c.r_token_type_ids, np.int32), R)
            out["r_attention_mask"][n, :r] = 1.0
            if img is not None:
                out["img_feat"][n, :n_reg] = feats
                out["img_mask"][n, :n_reg] = 1.0
            out["label"][n] = np.float32(c.target)

    return out


def assert_dedup_invariant(batch, num_labels: int = 4) -> None:
    """Validate the layout ``dedup_vision_prefix`` assumes: the K candidate
    rows of each example are consecutive with identical img_feat/img_mask
    (the production collate contract, Data/VCRChunkAlign.py:690-741).

    ``ModCRModel`` applies the dedup inside jit and cannot check this;
    callers that hand-build batches (outside the collate path) should run
    this once on a representative batch — the CLI and serving entry points
    do.  Raises ValueError on violation.
    """
    if "img_feat" not in batch and "img_row" in batch:
        # device-table batch (data/device_table.py): rows with the same
        # table index gather identical features, so the invariant reduces
        # to per-example img_row equality
        rows = np.asarray(batch["img_row"])
        if rows.shape[0] % num_labels:
            raise ValueError(
                f"batch rows {rows.shape[0]} not divisible by "
                f"num_labels {num_labels}"
            )
        per = rows.reshape(-1, num_labels)
        if not (per == per[:, :1]).all():
            bad = int(np.argmax(~(per == per[:, :1]).all(axis=1)))
            raise ValueError(
                f"example {bad}: candidate rows index different table "
                f"rows — dedup_vision_prefix would compute wrong vision "
                f"prefixes; set ModCRConfig.dedup_vision_prefix=False"
            )
        return
    feat = np.asarray(batch["img_feat"])
    mask = np.asarray(batch["img_mask"])
    n = feat.shape[0]
    if n % num_labels:
        raise ValueError(
            f"batch rows {n} not divisible by num_labels {num_labels}"
        )
    per = feat.reshape(n // num_labels, num_labels, *feat.shape[1:])
    per_m = mask.reshape(n // num_labels, num_labels, *mask.shape[1:])
    if not (per == per[:, :1]).all() or not (per_m == per_m[:, :1]).all():
        bad = int(np.argmax(~(per == per[:, :1]).all(
            axis=tuple(range(1, per.ndim)))))
        raise ValueError(
            f"example {bad}: candidate rows carry different img_feat/"
            f"img_mask — dedup_vision_prefix would compute wrong vision "
            f"prefixes; rebuild the batch with collate_candidates or set "
            f"ModCRConfig.dedup_vision_prefix=False"
        )
