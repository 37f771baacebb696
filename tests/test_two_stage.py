"""The two-stage recipe driver (scripts/train_two_stage.py) runs end-to-end.

Reduced-size CPU companion to the full-size v5e run recorded in
BENCHMARKS.md ("Two-stage recipe"): stage-1 ChunkAlign pretrain
(ChunkAlign_CLS_enc4_align regime, v10.py:1016-1165) on real PMR data,
export through the reference's checkpoint layout, the reference's
cold-start surgery (run_PMR_ModCR.py:752-763, 819-832), then the
production prefix-tune.  The stage-1 math is pinned by
tests/test_reference_parity.py::TestStage1ChunkAlignParity and the
export/graft bit-exactness by tests/test_interop.py; this test asserts
the DRIVER wiring — both trainers run, the surgery consumes the stage-1
export, and the curve records both stages.
"""

import json
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_two_stage_driver_end_to_end(tmp_path):
    if not os.path.exists("/root/reference/pmr_data/val-ori.jsonl"):
        pytest.skip("reference pmr_data not mounted")
    sys.path.insert(0, "/root/repo")
    from scripts.train_two_stage import main

    curve = main([
        "--tiny", "--stage1_steps", "8", "--stage2_steps", "8",
        "--batch", "4", "--stage1_batch", "4", "--limit", "48",
        "--valid_steps", "4", "--stage1_valid_steps", "2", "--warmup", "2",
        # exercise the dtype decoupling knob (full size defaults bf16;
        # BENCHMARKS "Stage-1 trainability" has the measured rationale)
        "--stage1_compute", "float32",
        "--out", str(tmp_path),
    ])

    # both stages trained and validated
    assert curve["stage1"]["steps"] == 8 and curve["stage2"]["steps"] == 8
    assert len(curve["stage1"]["history"]) >= 1
    # stage-2 history leads with the post-surgery (step 0) accuracy
    assert curve["stage2"]["history"][0]["step"] == 0
    assert curve["stage2"]["history"][0]["val_acc"] == pytest.approx(
        curve["stage2"]["post_surgery_acc"])
    assert (tmp_path / "curve.json").exists()
    assert json.load(open(tmp_path / "curve.json"))["stage1"]
    # best-acc Orbax checkpointing: whenever stage 1 improved, the export
    # must come from the restored BEST step, which implies a checkpoint
    if curve["stage1"]["best_acc"] > 0:
        assert (tmp_path / "stage1_ckpt").exists()

    # the stage-1 export is the reference's checkpoint layout: seq_enc. keys
    # (what run_PMR_ModCR.py:756-762 strips and loads) plus the trained
    # global tower and the enc4_align heads
    sd = np.load(tmp_path / "chunkalign_cls_state_dict.npz")
    keys = set(sd.keys())
    assert any(k.startswith("seq_enc.") for k in keys)
    assert any(k.startswith("global_enc.") for k in keys)
    assert "classifier.weight" in keys and "cls_ensemble.weight" in keys
    assert "cls_layer.0.cls_q_proj.weight" in keys


def test_cross_task_stage1_and_npz_reuse(tmp_path):
    """Cross-task stage-1 (the reference's own shape: its grafted ChunkAlign
    checkpoint was pretrained on OTHER data, run_PMR_ModCR.py:555) and
    --stage1_npz (graft a previous run's export without retraining).

    The npz-reuse run grafts the cross run's export on identical stage-2
    data/seed, so its post-surgery accuracy must REPRODUCE the cross run's —
    pinning that the export→reload→surgery path is lossless.
    """
    if not os.path.exists("/root/reference/vcr_data/vcr_val.json"):
        pytest.skip("reference vcr_data not mounted")
    sys.path.insert(0, "/root/repo")
    from scripts.train_two_stage import main

    common = [
        "--tiny", "--batch", "4", "--limit", "40", "--valid_steps", "4",
        "--warmup", "2", "--task", "vcr",
        "--jsonl", "/root/reference/vcr_data/vcr_val.json",
    ]
    cross = main(common + [
        "--stage1_steps", "4", "--stage2_steps", "4", "--stage1_batch", "4",
        "--stage1_task", "pmr",
        "--stage1_jsonl", "/root/reference/pmr_data/val-ori.jsonl",
        "--stage1_valid_steps", "2",
        "--out", str(tmp_path / "cross"),
    ])
    # stage-1 trained on PMR, stage-2 on VCR — curve records both
    assert cross["task"] == "vcr"
    assert cross["stage1"]["task"] == "pmr"
    assert cross["stage1"]["data"] == "val-ori.jsonl"
    npz = tmp_path / "cross" / "chunkalign_cls_state_dict.npz"
    assert npz.exists()

    reuse = main(common + [
        "--stage1_steps", "0", "--stage2_steps", "4",
        "--stage1_npz", str(npz),
        "--out", str(tmp_path / "reuse"),
    ])
    assert reuse["stage1"] == {"npz": str(npz), "keys": len(np.load(npz))}
    assert reuse["stage2"]["post_surgery_acc"] == pytest.approx(
        cross["stage2"]["post_surgery_acc"])
