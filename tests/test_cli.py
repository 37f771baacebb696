"""CLI integration: run_pmr --do_test end-to-end in-process (tiny config,
real reference jsonl, synthetic features, both feature-store backends)."""

import json
import pickle

import numpy as np
import pytest

from multimodal_context_reasoning_tpu.cli.run_pmr import main as pmr_main

PMR_VAL = "/root/reference/pmr_data/val-ori.jsonl"


@pytest.fixture(scope="module")
def feature_pickle(tmp_path_factory):
    try:
        rows = [json.loads(l) for l in open(PMR_VAL)][:6]
    except FileNotFoundError:
        pytest.skip("reference pmr_data not mounted")
    rng = np.random.default_rng(0)
    feats = {
        str(d["img_id"]): {"features": rng.normal(size=(7, 20)).astype(np.float32)}
        for d in rows
    }
    path = tmp_path_factory.mktemp("feats") / "f.pkl"
    with open(path, "wb") as f:
        pickle.dump(feats, f)
    return str(path)


class TestRunPMR:
    def test_do_test_writes_predictions(self, feature_pickle, tmp_path):
        out = tmp_path / "out"
        acc = pmr_main([
            "--do_test", "--tiny", "--limit", "6",
            "--test_file", PMR_VAL,
            "--img_feat_file", feature_pickle,
            "--output_dir", str(out),
        ])
        assert 0.0 <= acc <= 1.0
        lines = [json.loads(l)
                 for l in open(out / "result_test_ModICR_pmr.json")]
        assert len(lines) == 6
        assert set(lines[0]) == {"total_id", "img_id", "prediction",
                                 "answer_type"}
        assert all(0 <= l["prediction"] < 4 for l in lines)

    def test_do_test_via_mcrpack(self, feature_pickle, tmp_path):
        """Same run through the native feature store."""
        from multimodal_context_reasoning_tpu.cli.pack_features import (
            main as pack_main,
        )

        pack = tmp_path / "f.mcrpack"
        pack_main(["--pickle", feature_pickle, "--out", str(pack)])
        out = tmp_path / "out2"
        acc = pmr_main([
            "--do_test", "--tiny", "--limit", "6",
            "--test_file", PMR_VAL,
            "--img_feat_file", str(pack),
            "--output_dir", str(out),
        ])
        assert 0.0 <= acc <= 1.0

    def test_requires_mode(self, feature_pickle, tmp_path):
        with pytest.raises(SystemExit):
            pmr_main([
                "--tiny", "--img_feat_file", feature_pickle,
                "--output_dir", str(tmp_path / "x"),
            ])


class TestQuantizeFlag:
    def test_quantize_rejected_for_training(self):
        """--quantize is inference-only (round() has zero gradient)."""
        from multimodal_context_reasoning_tpu.cli.common import (
            build_arg_parser,
            configs_from_args,
        )

        args = build_arg_parser("pmr").parse_args(
            ["--do_train", "--tiny", "--quantize", "int8"]
        )
        with pytest.raises(SystemExit, match="inference-only"):
            configs_from_args(args)

    def test_quantize_threads_into_every_tower(self):
        from multimodal_context_reasoning_tpu.cli.common import (
            build_arg_parser,
            configs_from_args,
        )

        args = build_arg_parser("pmr").parse_args(
            ["--do_test", "--tiny", "--quantize", "int8"]
        )
        cfg, _ = configs_from_args(args)
        assert cfg.global_encoder.quantize == "int8"
        assert cfg.seq_encoder.quantize == "int8"
        assert cfg.roberta.quantize == "int8"
