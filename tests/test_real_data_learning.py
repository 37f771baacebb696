"""The real-data training recipe (scripts/train_real_pmr.py) LEARNS.

Reduced-size CPU companion to the full-size v5e run recorded in
BENCHMARKS.md ("Learning on real data"): real PMR examples from the
reference's val-ori.jsonl, the production featurizer/loader/train-step
path, self-split eval — and the assertion that accuracy on real data
rises far above the 0.25 chance floor within 60 optimizer steps.

Train-split accuracy is asserted (the 30-example held-out split at this
reduced scale is pure noise); the full-size held-out curve lives in
BENCHMARKS.md with the exact reproduction command.
"""

import os
import sys

import pytest

pytestmark = pytest.mark.slow


def test_recipe_learns_real_pmr_data(tmp_path):
    if not os.path.exists("/root/reference/pmr_data/val-ori.jsonl"):
        pytest.skip("reference pmr_data not mounted")
    sys.path.insert(0, "/root/repo")
    from scripts.train_real_pmr import main

    trainer = main([
        "--midsize", "--steps", "60", "--batch", "8", "--lr", "1e-3",
        "--warmup", "5", "--valid_steps", "30", "--limit", "150",
        "--dropout", "0.0", "--out", str(tmp_path),
        # this probe is calibrated for 1-token-per-word ids: subword
        # pieces inflate sequence length past the midsize caps and slow
        # 60-step memorization (measured 0.36 vs 0.48 train acc). The
        # corpus tokenizer's learning is covered by tests/test_subword.py
        # + the full-size TPU headline (BENCHMARKS.md).
        "--tokenizer", "hash",
    ])

    hist = trainer.history
    assert hist[0]["step"] == 0
    # random init scores ~chance on the held-out split
    assert 0.05 <= hist[0]["val_acc"] <= 0.45
    # by step 60 the train split is far above the 0.25 chance floor
    final = [h for h in hist if h["step"] > 0][-1]
    assert final["train_acc"] is not None and final["train_acc"] > 0.45, hist
    assert final["train_loss"] < 1.0, hist
    assert (tmp_path / "curve.json").exists()
