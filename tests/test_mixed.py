"""MixedDataset (data/mixed.py) — multi-task batch stream over PMR + VCR.

The reference has no multi-task pretraining path (its grafted ChunkAlign
checkpoint was trained on one task, run_PMR_ModCR.py:555); the mixture is
a framework extension, so these tests pin its contract directly: batches
match the owning child's own collate bit-for-bit, specs must agree, and
device-table mode requires one shared table.
"""

import dataclasses
import os

import numpy as np
import pytest

from multimodal_context_reasoning_tpu.core.config import ModCRConfig
from multimodal_context_reasoning_tpu.data.collate import BatchSpec
from multimodal_context_reasoning_tpu.data.device_table import (
    DeviceFeatureTable,
)
from multimodal_context_reasoning_tpu.data.loader import DataLoader
from multimodal_context_reasoning_tpu.data.mixed import MixedDataset
from multimodal_context_reasoning_tpu.data.pmr import (
    PMRDataset,
    load_pmr_jsonl,
)
from multimodal_context_reasoning_tpu.data.tokenization import (
    HashTokenizer,
    RobertaHashTokenizer,
)
from multimodal_context_reasoning_tpu.data.vcr import (
    VCRDataset,
    load_vcr_json,
)

PMR_JSONL = "/root/reference/pmr_data/val-ori.jsonl"
VCR_JSON = "/root/reference/vcr_data/vcr_val.json"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(PMR_JSONL) and os.path.exists(VCR_JSON)),
    reason="reference data not mounted",
)


@pytest.fixture(scope="module")
def children():
    import sys

    sys.path.insert(0, "/root/repo")
    from scripts.train_real_pmr import synthetic_features

    cfg = ModCRConfig.tiny()
    spec = BatchSpec(
        text_len=cfg.text_len, img_len=cfg.img_len,
        roberta_len=cfg.roberta_len, num_labels=cfg.num_labels,
        img_feature_dim=cfg.seq_encoder.img_feature_dim,
    )
    pmr_ex = load_pmr_jsonl(PMR_JSONL, limit=6)
    vcr_ex = load_vcr_json(VCR_JSON, limit=5)
    feats = synthetic_features(
        {e.img_id for e in pmr_ex} | {e.img_id for e in vcr_ex},
        cfg.seq_encoder.img_feature_dim, max_regions=min(cfg.img_len, 20),
    )
    bert = HashTokenizer(vocab_size=cfg.seq_encoder.vocab_size)
    rob = RobertaHashTokenizer(vocab_size=cfg.roberta.vocab_size)
    kw = dict(spec=spec, max_chunks=cfg.max_chunks)
    return (PMRDataset(pmr_ex, feats, bert, rob, **kw),
            VCRDataset(vcr_ex, feats, bert, rob, **kw),
            feats, cfg)


def test_batches_match_owning_child(children):
    pmr, vcr, _, _ = children
    mixed = MixedDataset([pmr, vcr])
    assert len(mixed) == len(pmr) + len(vcr)

    # pure-PMR and pure-VCR index slices reproduce the child collate
    np.testing.assert_array_equal(
        mixed.batch([0, 2])["input_ids"], pmr.batch([0, 2])["input_ids"])
    off = len(pmr)
    for key, val in vcr.batch([1, 3]).items():
        np.testing.assert_array_equal(
            mixed.batch([off + 1, off + 3])[key], val, err_msg=key)

    # a straddling batch concatenates example-major
    b = mixed.batch([1, off + 0])
    np.testing.assert_array_equal(
        b["input_ids"][: pmr.spec.num_labels],
        pmr.batch([1])["input_ids"])
    np.testing.assert_array_equal(
        b["input_ids"][pmr.spec.num_labels:],
        vcr.batch([0])["input_ids"])


def test_loader_epoch_covers_both_tasks(children):
    pmr, vcr, _, _ = children
    mixed = MixedDataset([pmr, vcr])
    dl = DataLoader(mixed, 4, shuffle=True, seed=0)
    n = sum(float(b["example_mask"].sum()) for b in dl)
    assert n == len(mixed)


def test_spec_mismatch_rejected(children):
    pmr, vcr, _, _ = children
    other = dataclasses.replace(pmr.spec, text_len=pmr.spec.text_len + 8)
    bad = PMRDataset(pmr.examples, pmr.image_features, pmr.bert,
                     pmr.roberta, spec=other, max_chunks=pmr.max_chunks)
    with pytest.raises(ValueError, match="BatchSpec"):
        MixedDataset([bad, vcr])


def test_device_table_must_be_shared(children):
    pmr, vcr, feats, cfg = children
    table = DeviceFeatureTable(feats, img_len=cfg.img_len, dtype="float32")
    pmr.use_device_table(table)
    try:
        with pytest.raises(ValueError, match="device-table"):
            MixedDataset([pmr, vcr])

        vcr.use_device_table(table)
        mixed = MixedDataset([pmr, vcr])
        b = mixed.batch([0, len(pmr)])
        assert b["feat_table"] is table.table
        # rows point at each example's own features in the shared table
        assert b["img_row"][0] == table.row_for(pmr.examples[0].img_id)
        assert b["img_row"][-1] == table.row_for(vcr.examples[0].img_id)
    finally:
        # module-scoped fixture: leave the children in host mode
        for d in (pmr, vcr):
            if hasattr(d, "device_table"):
                del d.device_table
