"""AOT serving artifact: export → reload → identical scores, no model code.

The artifact must reproduce the live scorer's logits bit-for-bit (same
program, same weights), work as a drop-in behind the HTTP server's
MicroBatcher, and support weight swapping without re-export (the program
closes over shapes only).
"""

import json
import urllib.request

import jax
import numpy as np
import pytest

from multimodal_context_reasoning_tpu.core.config import ModCRConfig
from multimodal_context_reasoning_tpu.data.collate import (
    BatchSpec,
    collate_candidates,
)
from multimodal_context_reasoning_tpu.data.pmr import PMRDataset
from multimodal_context_reasoning_tpu.data.schemas import ImageFeatures, RawExample
from multimodal_context_reasoning_tpu.data.tokenization import (
    HashTokenizer,
    RobertaHashTokenizer,
)
from multimodal_context_reasoning_tpu.models.modcr import ModCRModel
from multimodal_context_reasoning_tpu.serving.aot import (
    AOTScorer,
    save_scorer_artifact,
)
from multimodal_context_reasoning_tpu.serving.scorer import ModCRScorer


def _example(i):
    return RawExample(
        example_id=f"e{i}", img_id=f"img-{i % 4}",
        premise="they are friends .",
        answer_choices=["hug .", "fight .", "leave .", "sing ."],
        answer_label=None,
    )


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import jax.numpy as jnp

    cfg = ModCRConfig.tiny()
    rng = np.random.default_rng(0)
    feats = {
        f"img-{i}": ImageFeatures(
            features=rng.normal(
                size=(5, cfg.global_encoder.img_feature_dim)
            ).astype(np.float32),
            num_regions=5,
        )
        for i in range(4)
    }
    bert = HashTokenizer(vocab_size=cfg.global_encoder.vocab_size)
    rob = RobertaHashTokenizer(vocab_size=cfg.roberta.vocab_size)
    spec = BatchSpec(
        text_len=cfg.text_len, img_len=cfg.img_len,
        roberta_len=cfg.roberta_len,
        img_feature_dim=cfg.global_encoder.img_feature_dim,
    )
    ds = PMRDataset([], feats, bert, rob, spec=spec, max_chunks=cfg.max_chunks)
    ex = RawExample("w", "img-0", "warm .", ["a ."] * 4, 0)
    batch = collate_candidates([ds.featurize(ex)], [ds.get_image(ex)], spec)
    model = ModCRModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0), {k: jnp.asarray(v) for k, v in batch.items()}
    )
    scorer = ModCRScorer(cfg, params, bert, rob, feats, micro_batch=2)

    art_dir = str(tmp_path_factory.mktemp("artifact"))
    save_scorer_artifact(art_dir, scorer)
    aot = AOTScorer(art_dir, bert, rob, feats)
    return scorer, aot, art_dir, (bert, rob, feats)


class TestArtifactRoundTrip:
    def test_logits_bit_identical(self, setup):
        scorer, aot, _, _ = setup
        examples = [_example(i) for i in range(3)]
        live = scorer.score(examples)
        reloaded = aot.score(examples)
        assert [r["example_id"] for r in reloaded] == ["e0", "e1", "e2"]
        for a, b in zip(live, reloaded):
            np.testing.assert_array_equal(
                np.asarray(a["logits"], np.float32),
                np.asarray(b["logits"], np.float32),
            )
            assert a["prediction"] == b["prediction"]

    def test_params_committed_and_dtypes_restored(self, setup):
        scorer, aot, _, _ = setup
        live = jax.tree_util.tree_leaves(scorer.params)
        art = jax.tree_util.tree_leaves(aot.params)
        assert len(live) == len(art)
        for l, a in zip(live, art):
            assert isinstance(a, jax.Array)
            assert l.dtype == a.dtype
            assert l.shape == a.shape

    def test_weight_swap_without_reexport(self, setup):
        """The program closes over shapes only: swapped weights change the
        scores without touching the serialized blob."""
        scorer, aot, art_dir, (bert, rob, feats) = setup
        zeroed = jax.tree_util.tree_map(
            lambda a: np.zeros_like(np.asarray(a)), scorer.params
        )
        aot2 = AOTScorer.__new__(AOTScorer)
        aot2.__dict__.update(aot.__dict__)
        aot2.params = jax.device_put(zeroed)
        base = aot.score([_example(0)])[0]["logits"]
        swapped = aot2.score([_example(0)])[0]["logits"]
        assert not np.allclose(base, swapped)
        # all-zero weights → identical candidate logits
        np.testing.assert_allclose(
            swapped, [swapped[0]] * len(swapped), rtol=0, atol=1e-6
        )

    def test_serves_behind_http_microbatcher(self, setup):
        _, aot, _, _ = setup
        from multimodal_context_reasoning_tpu.serving.server import serve

        server = serve(aot, port=8499, block=False, batching=True)
        try:
            body = json.dumps({
                "examples": [{
                    "example_id": "h0", "img_id": "img-0",
                    "premise": "they are friends .",
                    "answer_choices": ["hug .", "fight .", "leave .", "sing ."],
                }]
            }).encode()
            req = urllib.request.Request(
                "http://127.0.0.1:8499/score", data=body,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                assert r.status == 200
                out = json.loads(r.read())
            assert out["results"][0]["example_id"] == "h0"
            assert len(out["results"][0]["logits"]) == 4
        finally:
            server.modcr_close()

    def test_mesh_mode_refused(self, setup):
        scorer, _, _, _ = setup
        scorer_like = ModCRScorer.__new__(ModCRScorer)
        scorer_like.__dict__.update(scorer.__dict__)
        scorer_like.mesh = object()
        with pytest.raises(NotImplementedError):
            save_scorer_artifact("/tmp/never-written", scorer_like)


class TestDeviceTableArtifact:
    """Table-mode scorers export too: the resident feat tables travel as
    program INPUTS, so the reload rebuilds them from its own feature
    source (padded to the row capacity baked into the program)."""

    @pytest.fixture(scope="class")
    def table_setup(self, setup, tmp_path_factory):
        scorer, _, _, (bert, rob, feats) = setup
        table_scorer = ModCRScorer(
            scorer.config, scorer.params, bert, rob, feats,
            micro_batch=2, use_device_table=True,
        )
        art_dir = str(tmp_path_factory.mktemp("table_artifact"))
        save_scorer_artifact(art_dir, table_scorer)
        return table_scorer, art_dir, (bert, rob, feats)

    def test_round_trip_matches_live_and_plain(self, setup, table_setup):
        plain_scorer, _, _, _ = setup
        table_scorer, art_dir, (bert, rob, feats) = table_setup
        aot = AOTScorer(art_dir, bert, rob, feats)
        assert aot.table is not None
        examples = [_example(i) for i in range(3)]
        live = table_scorer.score(examples)
        reloaded = aot.score(examples)
        plain = plain_scorer.score(examples)
        for a, b, c in zip(live, reloaded, plain):
            np.testing.assert_array_equal(
                np.asarray(a["logits"], np.float32),
                np.asarray(b["logits"], np.float32),
            )
            # table-vs-plain tolerance: the table stores what the forward
            # would cast anyway (for_config matches the compute dtype)
            np.testing.assert_allclose(
                np.asarray(b["logits"], np.float32),
                np.asarray(c["logits"], np.float32),
                rtol=0, atol=1e-5,
            )

    def test_smaller_feature_pack_pads_to_capacity(self, table_setup):
        """A serving box mounting FEWER images than the export still loads:
        the rebuilt table zero-pads to the program's baked row capacity."""
        table_scorer, art_dir, (bert, rob, feats) = table_setup
        subset = {k: feats[k] for k in ["img-0", "img-1", "img-2"]}
        aot = AOTScorer(art_dir, bert, rob, subset)
        assert aot.table.table.shape[0] == table_scorer.table.table.shape[0]
        live = table_scorer.score([_example(1)])[0]["logits"]
        sub = aot.score([_example(1)])[0]["logits"]
        np.testing.assert_array_equal(
            np.asarray(live, np.float32), np.asarray(sub, np.float32)
        )

    def test_oversized_feature_pack_refused(self, table_setup):
        _, art_dir, (bert, rob, feats) = table_setup
        import copy

        bigger = dict(feats)
        for i in range(4, 7):
            bigger[f"img-{i}"] = copy.deepcopy(feats["img-0"])
        with pytest.raises(ValueError, match="capacity"):
            AOTScorer(art_dir, bert, rob, bigger, warm=False)


class TestGeneratorArtifact:
    @pytest.fixture(scope="class")
    def gen_setup(self, tmp_path_factory):
        import jax.numpy as jnp

        from multimodal_context_reasoning_tpu.core.config import (
            ChunkAlignConfig,
            EncoderConfig,
            GPT2Config,
        )
        from multimodal_context_reasoning_tpu.models.rationale import (
            RationaleModel,
            rationale_init_batch,
        )
        from multimodal_context_reasoning_tpu.serving.aot import (
            AOTGenerator,
            save_generator_artifact,
        )
        from multimodal_context_reasoning_tpu.serving.generator import (
            RationaleGenerator,
        )

        enc = EncoderConfig(
            vocab_size=256, hidden_size=32, num_hidden_layers=4,
            num_attention_heads=4, intermediate_size=64,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            max_position_embeddings=128, img_feature_dim=20,
        )
        sched = ChunkAlignConfig(chunk_layers_end=1, full_layers_end=2)
        gpt = GPT2Config(
            vocab_size=128, n_positions=128, n_embd=32, n_layer=2, n_head=4,
            resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0, pad_token_id=0,
        )
        spec = BatchSpec(text_len=16, img_len=6, roberta_len=16,
                         img_feature_dim=20)
        rng = np.random.default_rng(0)
        feats = {
            f"img-{i}": ImageFeatures(
                features=rng.normal(size=(5, 20)).astype(np.float32),
                num_regions=5,
            )
            for i in range(4)
        }
        bert = HashTokenizer(vocab_size=256)
        gpt_tok = HashTokenizer(vocab_size=128)
        model = RationaleModel(enc, sched, gpt, max_chunks=8)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            {k: jnp.asarray(v) for k, v in
             rationale_init_batch(enc, gpt, spec, expl_len=6).items()},
        )
        live = RationaleGenerator(
            enc, sched, gpt, params, bert, gpt_tok, feats,
            spec=spec, max_chunks=8, micro_batch=2, max_rationale_len=8,
        )
        art = str(tmp_path_factory.mktemp("gen_artifact"))
        save_generator_artifact(art, live)
        reloaded = AOTGenerator(art, bert, gpt_tok, feats)
        return live, reloaded, art

    def test_generate_identical(self, gen_setup):
        live, reloaded, _ = gen_setup
        exs = [
            RawExample(f"q{i}", f"img-{i}", "two people talk .",
                       ["hug .", "fight .", "leave .", "sing ."], None)
            for i in range(3)  # 3 questions over micro_batch=2: chunk+pad
        ]
        a = live.generate(exs)
        b = reloaded.generate(exs)
        assert [r["example_id"] for r in b] == ["q0", "q1", "q2"]
        for x, y in zip(a, b):
            assert x["prediction"] == y["prediction"]
            assert x["rationale_ids"] == y["rationale_ids"]
            np.testing.assert_array_equal(
                np.asarray(x["probs"], np.float32),
                np.asarray(y["probs"], np.float32),
            )

    def test_marker_mismatch_refused(self, gen_setup):
        from multimodal_context_reasoning_tpu.serving.aot import AOTGenerator

        live, _, art = gen_setup
        other_tok = HashTokenizer(vocab_size=64)  # maps markers differently
        _, _, feats = None, None, live.features
        bert = HashTokenizer(vocab_size=256)
        with pytest.raises(ValueError, match="marker"):
            AOTGenerator(art, bert, other_tok, feats, warm=False)

    def test_kind_crosscheck(self, gen_setup, setup):
        from multimodal_context_reasoning_tpu.serving.aot import AOTGenerator

        _, _, gen_art = gen_setup
        scorer, _, scorer_art, (bert, rob, feats) = setup
        with pytest.raises(ValueError, match="artifact"):
            AOTScorer(gen_art, bert, rob, feats, warm=False)
        live_gen, _, _ = gen_setup
        with pytest.raises(ValueError, match="artifact"):
            AOTGenerator(
                scorer_art, bert,
                HashTokenizer(vocab_size=128), feats, warm=False,
            )


class TestExecutableFastPath:
    """Round-4: the artifact can carry the serialized COMPILED PJRT
    executable; a fingerprint-matching box then skips the XLA compile at
    standup entirely.  Export SELF-VERIFIES the fast path (serialize →
    reload → reproduce) and drops it when the backend can't round-trip
    (XLA:CPU AOT is partial; the TPU target round-trips) — so these tests
    exercise both branches wherever they run."""

    def test_artifact_fast_path_or_clean_fallback(self, setup):
        import os

        scorer, aot, art_dir, _ = setup
        with open(f"{art_dir}/artifact.json") as f:
            meta = json.load(f)
        if meta["executable"] is not None:
            # backend round-tripped at export: reload MUST use it
            assert aot.loaded_from_executable
            assert os.path.exists(f"{art_dir}/scorer_exec.pjrt")
        else:
            # self-verification rejected it: no stale blob, clean fallback
            assert not aot.loaded_from_executable
            assert not os.path.exists(f"{art_dir}/scorer_exec.pjrt")
        live = scorer.score([_example(i) for i in range(2)])
        reloaded = aot.score([_example(i) for i in range(2)])
        for a, b in zip(live, reloaded):
            np.testing.assert_allclose(a["logits"], b["logits"],
                                       rtol=1e-6, atol=1e-6)

    def test_meta_batch_keys_record_real_signature(self, setup):
        """ADVICE r3: batch_keys must list the traced program's actual
        inputs (in table mode that includes the resident table buffers)."""
        _, _, art_dir, _ = setup
        with open(f"{art_dir}/artifact.json") as f:
            meta = json.load(f)
        assert "img_feat" in meta["batch_keys"]
        assert "label" not in meta["batch_keys"]

    def test_helpers_roundtrip_small_program(self, tmp_path):
        """serialize → reload → identical outputs, on a program small
        enough that every backend's executable AOT handles it."""
        import jax.numpy as jnp

        from multimodal_context_reasoning_tpu.serving.aot import (
            _load_executable,
            _save_executable,
        )

        f = jax.jit(lambda x: (x * 2 + 1).sum(axis=-1))
        x = jnp.arange(12.0).reshape(3, 4)
        path = str(tmp_path / "small.pjrt")
        fp = _save_executable(path, f, (x,))
        if fp is None:
            pytest.skip("backend cannot serialize executables")
        loaded = _load_executable(path, fp)
        assert loaded is not None
        np.testing.assert_allclose(np.asarray(loaded(x)), np.asarray(f(x)))

    def test_helper_fingerprint_mismatch_returns_none(self, tmp_path):
        import jax.numpy as jnp

        from multimodal_context_reasoning_tpu.serving.aot import (
            _load_executable,
            _save_executable,
        )

        f = jax.jit(lambda x: x + 1)
        x = jnp.ones((4,))
        path = str(tmp_path / "small.pjrt")
        fp = _save_executable(path, f, (x,))
        if fp is None:
            pytest.skip("backend cannot serialize executables")
        wrong = dict(fp, device_kind="TPU v9 imaginary")
        assert _load_executable(path, wrong) is None
        assert _load_executable(path, None) is None  # no fingerprint

    def test_helper_corrupt_file_returns_none(self, tmp_path):
        from multimodal_context_reasoning_tpu.serving.aot import (
            _device_fingerprint,
            _load_executable,
        )

        path = str(tmp_path / "garbage.pjrt")
        with open(path, "wb") as f:
            f.write(b"not a pickle")
        assert _load_executable(path, _device_fingerprint()) is None

    def test_missing_exec_file_loads_stablehlo(self, setup, tmp_path):
        """Artifacts without a (valid) executable load via StableHLO."""
        import os
        import shutil

        scorer, _, art_dir, (bert, rob, feats) = setup
        dst = str(tmp_path / "artifact_copy")
        shutil.copytree(art_dir, dst)
        if os.path.exists(f"{dst}/scorer_exec.pjrt"):
            os.remove(f"{dst}/scorer_exec.pjrt")
        with open(f"{dst}/artifact.json") as f:
            meta = json.load(f)
        meta["executable"] = None
        with open(f"{dst}/artifact.json", "w") as f:
            json.dump(meta, f)
        aot = AOTScorer(dst, bert, rob, feats)
        assert not aot.loaded_from_executable
        live = scorer.score([_example(2)])
        fb = aot.score([_example(2)])
        np.testing.assert_array_equal(
            np.asarray(live[0]["logits"], np.float32),
            np.asarray(fb[0]["logits"], np.float32))
