"""CLI integration: run_pmr --do_test end-to-end in-process (tiny config,
real reference jsonl, synthetic features, both feature-store backends)."""

import json
import pickle

import numpy as np
import pytest

from multimodal_context_reasoning_tpu.cli.run_pmr import main as pmr_main
from multimodal_context_reasoning_tpu.data.schemas import RawExample

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


class TestConfigOverrideFlags:
    def test_reference_model_knobs(self):
        """--num_labels / --img_feature_dim / --drop_out mirror the
        reference's live config overrides (run_PMR_ModCR.py:585,588,608,
        710-742: drop_out applies to both Oscar towers, not RoBERTa)."""
        from multimodal_context_reasoning_tpu.cli.common import (
            build_arg_parser,
            configs_from_args,
        )

        args = build_arg_parser("pmr").parse_args(
            ["--do_test", "--num_labels", "2", "--img_feature_dim", "1030",
             "--drop_out", "0.2"]
        )
        cfg, _ = configs_from_args(args)
        assert cfg.num_labels == 2
        assert cfg.global_encoder.img_feature_dim == 1030
        assert cfg.seq_encoder.img_feature_dim == 1030
        assert cfg.global_encoder.hidden_dropout_prob == 0.2
        assert cfg.seq_encoder.hidden_dropout_prob == 0.2
        assert cfg.roberta.hidden_dropout_prob == 0.1  # reference: untouched

        # defaults leave the config at reference values
        args = build_arg_parser("pmr").parse_args(["--do_test"])
        cfg, _ = configs_from_args(args)
        assert cfg.num_labels == 4
        assert cfg.global_encoder.img_feature_dim == 2054
        assert cfg.global_encoder.hidden_dropout_prob == 0.3


class TestRunPMRTrain:
    def test_do_train_end_to_end(self, feature_pickle, tmp_path):
        """CLI --do_train: dataset build, config.json save, Trainer wiring
        (mesh, ckpt dir), fit, best-acc report — the reference's train
        entry flow (run_PMR_ModCR.py:839-858) in-process on real data."""
        import os

        out = tmp_path / "train_out"
        state = pmr_main([
            "--do_train", "--tiny", "--limit", "6",
            "--train_file", PMR_VAL, "--val_file", PMR_VAL,
            "--img_feat_file", feature_pickle,
            "--output_dir", str(out),
            "--per_gpu_train_batch_size", "2",
            "--per_gpu_eval_batch_size", "2",
            "--mesh_data", "2",         # sharded (2,1) mesh on the 8-dev
                                        # virtual backend; batch 2 examples
                                        # (8 rows) shards cleanly over it
            "--num_train_epochs", "1",
            "--gradient_accumulation_steps", "1",
            "--valid_steps", "2", "--epoch_begin", "1",
            "--learning_rate", "1e-3", "--scheduler", "constant",
        ])
        # 6 examples / batch 2, drop_last → 3 train steps
        assert int(state.step) == 3
        assert os.path.exists(out / "config.json")
        # mid-epoch eval fired (valid_steps=2, epoch_begin=1) and the best
        # checkpoint was saved
        from multimodal_context_reasoning_tpu.train.checkpoint import (
            CheckpointManager,
        )

        assert CheckpointManager(str(out / "ckpt")).latest_step() is not None

    def test_indivisible_batch_fails_fast(self, feature_pickle, tmp_path):
        """A data mesh wider than the example batch must fail with a clear
        message, not pjit's mid-train divisibility error."""
        with pytest.raises(SystemExit, match="divisible by the data-mesh"):
            pmr_main([
                "--do_train", "--tiny", "--limit", "6",
                "--train_file", PMR_VAL,
                "--img_feat_file", feature_pickle,
                "--output_dir", str(tmp_path / "x"),
                "--per_gpu_train_batch_size", "3",
                "--mesh_data", "2",
            ])


class TestTrainToServeLifecycle:
    def test_trained_checkpoint_flows_into_serving(
        self, feature_pickle, tmp_path, monkeypatch
    ):
        """Full deployment lifecycle: CLI train → best-ckpt on disk →
        `cli.serve --eval_model_dir` restores it → the live scorer serves
        the TRAINED weights (not random init) and returns finite scores."""
        import os

        import jax

        out = tmp_path / "lc_out"
        pmr_main([
            "--do_train", "--tiny", "--limit", "6",
            "--train_file", PMR_VAL, "--val_file", PMR_VAL,
            "--img_feat_file", feature_pickle,
            "--output_dir", str(out),
            "--per_gpu_train_batch_size", "2",
            "--per_gpu_eval_batch_size", "2",
            "--mesh_data", "2",
            "--num_train_epochs", "1",
            "--valid_steps", "2", "--epoch_begin", "1",
            "--learning_rate", "1e-3", "--scheduler", "constant",
        ])
        assert os.path.isdir(out / "ckpt")

        from multimodal_context_reasoning_tpu.cli import serve as serve_cli

        captured = {}
        monkeypatch.setattr(
            "multimodal_context_reasoning_tpu.serving.server.serve",
            lambda scorer, host, port, **kw: captured.update(scorer=scorer),
        )
        serve_cli.main([
            "--img_feat_file", feature_pickle, "--tiny",
            "--eval_model_dir", str(out), "--micro_batch", "2",
        ])
        sc = captured["scorer"]

        # ground truth: the scorer must hold exactly the best-metric
        # checkpoint's trained weights (params-only restore — the training
        # run used a non-default scheduler, so a template restore that
        # rebuilt the optimizer from default flags would fail here)
        from multimodal_context_reasoning_tpu.train.checkpoint import (
            CheckpointManager,
        )

        trained = CheckpointManager(str(out / "ckpt")).restore_params(best=True)
        got_leaves = jax.tree_util.tree_leaves(sc.params)
        want_leaves = jax.tree_util.tree_leaves(trained)
        assert len(got_leaves) == len(want_leaves)
        for got, want in zip(got_leaves, want_leaves):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

        rows = [json.loads(l) for l in open(PMR_VAL)][:2]
        exs = [
            RawExample(
                example_id=str(d["total_id"]), img_id=str(d["img_id"]),
                premise="they are friends .",
                answer_choices=["hug .", "fight .", "run .", "sing ."],
                answer_label=None,
            )
            for d in rows
        ]
        res = sc.score(exs)
        assert len(res) == 2
        assert all(np.all(np.isfinite(r["logits"])) for r in res)

        # the batch-eval entry restores the same way (its optimizer flags
        # here differ from the training run's — params-only restore)
        acc = pmr_main([
            "--do_test", "--tiny", "--limit", "6",
            "--test_file", PMR_VAL,
            "--img_feat_file", feature_pickle,
            "--output_dir", str(out),
            "--eval_model_dir", str(out),
        ])
        assert 0.0 <= acc <= 1.0


class TestAOTArtifactCLI:
    def test_save_then_serve_artifact(
        self, feature_pickle, tmp_path, monkeypatch
    ):
        """`serve --save_artifact` exports the warmed scorer; `serve
        --artifact` stands the service back up from the directory (config
        included) without model construction."""
        from multimodal_context_reasoning_tpu.cli import serve as serve_cli
        from multimodal_context_reasoning_tpu.serving.aot import AOTScorer

        art = tmp_path / "artifact"
        serve_cli.main([
            "--img_feat_file", feature_pickle, "--tiny",
            "--micro_batch", "2", "--save_artifact", str(art),
        ])
        import os

        assert os.path.exists(art / "scorer_program.jaxexport")
        assert os.path.exists(art / "params.npz")
        assert os.path.exists(art / "artifact.json")

        captured = {}
        monkeypatch.setattr(
            "multimodal_context_reasoning_tpu.serving.server.serve",
            lambda scorer, host, port, **kw: captured.update(scorer=scorer),
        )
        serve_cli.main([
            "--img_feat_file", feature_pickle, "--artifact", str(art),
        ])
        sc = captured["scorer"]
        assert isinstance(sc, AOTScorer)
        assert sc.micro_batch == 2
        rows = [json.loads(l) for l in open(PMR_VAL)][:2]
        res = sc.score([
            RawExample(
                example_id=str(d["total_id"]), img_id=str(d["img_id"]),
                premise="they are friends .",
                answer_choices=["hug .", "fight .", "run .", "sing ."],
                answer_label=None,
            )
            for d in rows
        ])
        assert len(res) == 2
        assert all(np.all(np.isfinite(r["logits"])) for r in res)

    def test_save_then_serve_table_artifact(
        self, feature_pickle, tmp_path, monkeypatch
    ):
        """`serve --device_features --save_artifact` exports a table-mode
        scorer; the reload rebuilds the HBM table from the mounted feature
        file and serves ids-only batches."""
        from multimodal_context_reasoning_tpu.cli import serve as serve_cli
        from multimodal_context_reasoning_tpu.serving.aot import AOTScorer

        art = tmp_path / "table_artifact"
        serve_cli.main([
            "--img_feat_file", feature_pickle, "--tiny",
            "--micro_batch", "2", "--device_features",
            "--save_artifact", str(art),
        ])
        captured = {}
        monkeypatch.setattr(
            "multimodal_context_reasoning_tpu.serving.server.serve",
            lambda scorer, host, port, **kw: captured.update(scorer=scorer),
        )
        serve_cli.main([
            "--img_feat_file", feature_pickle, "--artifact", str(art),
        ])
        sc = captured["scorer"]
        assert isinstance(sc, AOTScorer)
        assert sc.table is not None
        rows = [json.loads(l) for l in open(PMR_VAL)][:2]
        res = sc.score([
            RawExample(
                example_id=str(d["total_id"]), img_id=str(d["img_id"]),
                premise="they are friends .",
                answer_choices=["hug .", "fight .", "run .", "sing ."],
                answer_label=None,
            )
            for d in rows
        ])
        assert len(res) == 2
        assert all(np.all(np.isfinite(r["logits"])) for r in res)

    def test_generator_artifact_roundtrip(
        self, feature_pickle, tmp_path, monkeypatch
    ):
        """`--generate --save_gen_artifact` exports the fused greedy
        program; `--artifact --gen_artifact` serves both endpoints from
        artifacts alone."""
        import os

        from multimodal_context_reasoning_tpu.cli import serve as serve_cli
        from multimodal_context_reasoning_tpu.serving.aot import (
            AOTGenerator,
            AOTScorer,
        )

        art = tmp_path / "scorer_art"
        gen_art = tmp_path / "gen_art"
        serve_cli.main([
            "--img_feat_file", feature_pickle, "--tiny",
            "--micro_batch", "2", "--save_artifact", str(art),
        ])
        serve_cli.main([
            "--img_feat_file", feature_pickle, "--tiny", "--generate",
            "--gen_micro_batch", "2", "--max_rationale_len", "8",
            "--save_gen_artifact", str(gen_art),
        ])
        assert os.path.exists(gen_art / "generator_program.jaxexport")

        captured = {}
        monkeypatch.setattr(
            "multimodal_context_reasoning_tpu.serving.server.serve",
            lambda scorer, host, port, **kw: captured.update(
                scorer=scorer, **kw),
        )
        serve_cli.main([
            "--img_feat_file", feature_pickle,
            "--artifact", str(art), "--gen_artifact", str(gen_art),
        ])
        assert isinstance(captured["scorer"], AOTScorer)
        gen = captured["generator"]
        assert isinstance(gen, AOTGenerator)
        rows = [json.loads(l) for l in open(PMR_VAL)][:1]
        res = gen.generate([
            RawExample(
                example_id="g0", img_id=str(rows[0]["img_id"]),
                premise="they are friends .",
                answer_choices=["hug .", "fight .", "run .", "sing ."],
                answer_label=None,
            )
        ])
        assert len(res) == 1
        assert res[0]["prediction"] in range(4)
        assert isinstance(res[0]["rationale_ids"], list)


class TestRunVCRTrain:
    def test_vcr_delegation_end_to_end(self, tmp_path):
        """run_vcr: default grad-accum 4 + RoBERTa-body freeze through the
        same main (run_vcr_ModCR.py:605,783-787), trained in-process on
        real vcr_val.json rows."""
        import os

        from multimodal_context_reasoning_tpu.cli.run_vcr import main as vcr_main

        VCR_VAL = "/root/reference/vcr_data/vcr_val.json"
        try:
            rows = [json.loads(l) for l in open(VCR_VAL) if l.strip()][:4]
        except FileNotFoundError:
            pytest.skip("reference vcr_data not mounted")
        rng = np.random.default_rng(1)
        feats = {}
        for d in rows:
            num = str(d["img_id"]).split("-")[-1]
            feats[f"img-{num}"] = {
                "features": rng.normal(size=(7, 20)).astype(np.float32)
            }
        pkl = tmp_path / "vf.pkl"
        with open(pkl, "wb") as f:
            pickle.dump(feats, f)

        out = tmp_path / "vcr_out"
        state = vcr_main([
            "--do_train", "--tiny", "--limit", "4",
            "--train_file", VCR_VAL,
            "--img_feat_file", str(pkl),
            "--output_dir", str(out),
            "--per_gpu_train_batch_size", "2",
            "--mesh_data", "1", "--mesh_model", "1",
            "--num_train_epochs", "1",
            "--learning_rate", "1e-3", "--scheduler", "constant",
        ])
        # grad-accum 4 default: 2 micro-batches < 4 → optimizer never
        # applied, but both micro-steps ran
        assert int(state.step) == 2
        assert os.path.exists(out / "config.json")


class TestDeviceFeaturesCLI:
    def test_do_test_device_features_matches_plain(
        self, feature_pickle, tmp_path
    ):
        """--device_features: batches ship int32 ids, features gather from
        the HBM-resident table — predictions identical to the plain path
        (fp32 table at the tiny config's fp32 dtype)."""
        outs = {}
        for name, extra in (("plain", []), ("table", ["--device_features"])):
            out = tmp_path / name
            acc = pmr_main([
                "--do_test", "--tiny", "--limit", "6",
                "--test_file", PMR_VAL,
                "--img_feat_file", feature_pickle,
                "--output_dir", str(out),
                *extra,
            ])
            preds = [
                json.loads(l)["prediction"]
                for l in open(out / "result_test_ModICR_pmr.json")
            ]
            outs[name] = (acc, preds)
        assert outs["plain"] == outs["table"]

    def test_device_features_from_mcrpack(self, feature_pickle, tmp_path):
        """The table builds straight off the native FeatureStore."""
        from multimodal_context_reasoning_tpu.cli.pack_features import (
            main as pack_main,
        )

        pack = tmp_path / "f.mcrpack"
        pack_main(["--pickle", feature_pickle, "--out", str(pack)])
        out = tmp_path / "out_table_pack"
        acc = pmr_main([
            "--do_test", "--tiny", "--limit", "6",
            "--test_file", PMR_VAL,
            "--img_feat_file", str(pack),
            "--output_dir", str(out),
            "--device_features",
        ])
        assert 0.0 <= acc <= 1.0


class TestReferenceCkptOneCommand:
    """The day real reference checkpoints appear, accuracy parity is ONE
    command: run_pmr --reference_ckpt best.pth --do_test.  Exercised here
    against a synthetic .pth in the reference's exact torch.save layout
    ({'net': state_dict}, keys per run_PMR_ModCR.py:802-832)."""

    @pytest.fixture()
    def synthetic_pth(self, tmp_path):
        torch = pytest.importorskip("torch")
        from multimodal_context_reasoning_tpu.core.config import ModCRConfig
        from tests.test_assemble import full_composite_sd

        cfg = ModCRConfig.tiny()
        sd = full_composite_sd(cfg)
        path = tmp_path / "best.pth"
        torch.save(
            {"net": {k: torch.from_numpy(np.ascontiguousarray(v))
                     for k, v in sd.items()}}, path)
        return str(path)

    def test_do_test_ingests_and_changes_predictions(
            self, feature_pickle, synthetic_pth, tmp_path, monkeypatch):
        from multimodal_context_reasoning_tpu.interop import assemble

        base_args = [
            "--do_test", "--tiny", "--limit", "6",
            "--test_file", PMR_VAL,
            "--img_feat_file", feature_pickle,
        ]
        out_plain = tmp_path / "plain"
        pmr_main(base_args + ["--output_dir", str(out_plain)])

        reports = []
        orig = assemble.assemble_from_files

        def spy(*a, **kw):
            report = orig(*a, **kw)
            reports.append(report)
            return report

        monkeypatch.setattr(assemble, "assemble_from_files", spy)
        out_ckpt = tmp_path / "ckpt"
        pmr_main(base_args + [
            "--reference_ckpt", synthetic_pth,
            "--output_dir", str(out_ckpt),
        ])
        assert reports, "graft never ran"
        report = reports[0]
        assert report.unconsumed == set()
        assert "roberta.embeddings.word_embeddings.weight" in report.consumed
        assert "mapping_network_vision.1.weight" in report.consumed

        def scores(d):
            return [json.loads(l)["prediction"]
                    for l in open(d / "result_test_ModICR_pmr.json")]
        assert (out_ckpt / "result_test_ModICR_pmr.json").exists()
        # both runs produced valid prediction files over the same examples
        assert len(scores(out_ckpt)) == len(scores(out_plain)) == 6

    def test_scan_layers_graft_roundtrip(self, feature_pickle,
                                         synthetic_pth, tmp_path):
        """--scan_layers + --reference_ckpt: the graft converts through
        the stacked<->per-layer adapters and predictions still write."""
        out = tmp_path / "scan"
        acc = pmr_main([
            "--do_test", "--tiny", "--limit", "6",
            "--test_file", PMR_VAL,
            "--img_feat_file", feature_pickle,
            "--reference_ckpt", synthetic_pth,
            "--scan_layers", "--flash_attention",
            "--output_dir", str(out),
        ])
        assert 0.0 <= acc <= 1.0
        assert (out / "result_test_ModICR_pmr.json").exists()

    def test_cold_start_surgery_flag(self, feature_pickle, synthetic_pth,
                                     tmp_path):
        out = tmp_path / "cold"
        acc = pmr_main([
            "--do_test", "--tiny", "--limit", "6",
            "--test_file", PMR_VAL,
            "--img_feat_file", feature_pickle,
            "--reference_ckpt", synthetic_pth, "--cold_start",
            "--output_dir", str(out),
        ])
        assert 0.0 <= acc <= 1.0
