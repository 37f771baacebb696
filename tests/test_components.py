"""Component tests: ensembles, TSV storage, ITM eval, feature store,
promptfuse prefix, tensorboard fallback."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_context_reasoning_tpu.data.feature_store import (
    FeatureStore,
    write_pack,
)
from multimodal_context_reasoning_tpu.data.tsv import (
    TSVFile,
    concat_tsv_files,
    reorder_tsv_keys,
    tsv_writer,
)
from multimodal_context_reasoning_tpu.models.ensemble import (
    CandidateEnsemble,
    VoteEnsemble,
    pairwise_hinge_loss,
)
from multimodal_context_reasoning_tpu.utils.itm_eval import itm_eval


class TestEnsembles:
    def _views(self, Q=3, K=4):
        rng = np.random.default_rng(0)
        label = np.zeros((Q * K,), np.float32)
        label[:: K] = 1.0
        return (
            {
                "calec": jnp.asarray(rng.normal(size=(Q * K, 8)), jnp.float32),
                "roberta": jnp.asarray(rng.normal(size=(Q * K, 12)), jnp.float32),
            },
            jnp.asarray(label),
        )

    @pytest.mark.parametrize("fusion", ["concat", "add"])
    @pytest.mark.parametrize("loss", ["ce", "hinge", "ce+hinge"])
    def test_vector_fusions(self, fusion, loss):
        views, label = self._views()
        model = CandidateEnsemble(fusion=fusion, loss=loss)
        params = model.init(jax.random.PRNGKey(0), views, label)
        out = model.apply(params, views, label)
        assert out.logits.shape == (3, 4)
        assert np.isfinite(float(out.loss))

    @pytest.mark.parametrize("fusion", ["logit_add", "learned_add"])
    def test_logit_fusions(self, fusion):
        rng = np.random.default_rng(1)
        Q, K = 3, 4
        views = {
            "a": jnp.asarray(rng.normal(size=(Q, K)), jnp.float32),
            "b": jnp.asarray(rng.normal(size=(Q, K)), jnp.float32),
        }
        label = np.zeros((Q * K,), np.float32)
        label[:: K] = 1.0
        model = CandidateEnsemble(fusion=fusion)
        params = model.init(jax.random.PRNGKey(0), views, jnp.asarray(label))
        out = model.apply(params, views, jnp.asarray(label))
        if fusion == "logit_add":
            np.testing.assert_allclose(
                np.asarray(out.logits),
                np.asarray(views["a"] + views["b"]), rtol=1e-6,
            )
        assert np.isfinite(float(out.loss))

    def test_vote(self):
        rng = np.random.default_rng(2)
        ml = jnp.asarray(rng.normal(size=(5, 3, 4)), jnp.float32)
        label = jnp.asarray(np.eye(4)[[0, 1, 2]], jnp.float32)
        model = VoteEnsemble()
        params = model.init(jax.random.PRNGKey(0), ml, label)
        out = model.apply(params, ml, label)
        assert out.logits.shape == (3, 4)
        assert np.isfinite(float(out.loss))

    def test_hinge_zero_when_gold_dominates(self):
        logits = jnp.asarray([[100.0, 0.0, 0.0, 0.0]])
        targets = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
        # every competitor prob ~0, gold ~1: hinge = sum relu(0.5 + p - 1)
        # = relu(0.5) for the gold itself -> 0.5; competitors -> 0
        val = float(pairwise_hinge_loss(logits, targets, margin=0.5))
        np.testing.assert_allclose(val, 0.5, atol=1e-3)


class TestTSV:
    def test_roundtrip_and_seek(self, tmp_path):
        path = str(tmp_path / "t.tsv")
        rows = [["k0", "a", "1"], ["k1", "b", "2"], ["k2", "c", "3"]]
        tsv_writer(rows, path)
        f = TSVFile(path)
        assert len(f) == 3
        assert f[1] == ["k1", "b", "2"]
        assert f[0] == ["k0", "a", "1"]

    def test_concat_and_reorder(self, tmp_path):
        a, b = str(tmp_path / "a.tsv"), str(tmp_path / "b.tsv")
        tsv_writer([["x", "1"]], a)
        tsv_writer([["y", "2"]], b)
        out = str(tmp_path / "c.tsv")
        concat_tsv_files([a, b], out)
        f = TSVFile(out)
        assert [f[i][0] for i in range(len(f))] == ["x", "y"]
        out2 = str(tmp_path / "d.tsv")
        reorder_tsv_keys(out, ["y", "x"], out2)
        f2 = TSVFile(out2)
        assert [f2[i][0] for i in range(2)] == ["y", "x"]

    def test_lineidx_regenerated(self, tmp_path):
        path = str(tmp_path / "t.tsv")
        with open(path, "w") as f:
            f.write("a\t1\nb\t2\n")
        f = TSVFile(path)  # no sidecar: generated on demand
        assert f[1] == ["b", "2"]


class TestITMEval:
    def test_perfect_scores(self):
        n = 6
        scores = np.eye(n) * 10 + np.random.default_rng(0).normal(size=(n, n))
        res = itm_eval(scores, list(range(n)))
        assert res["txt_r1"] == 1.0 and res["img_r1"] == 1.0
        assert res["rsum"] == 6.0

    def test_random_scores_bounded(self):
        rng = np.random.default_rng(1)
        res = itm_eval(rng.normal(size=(20, 20)), list(range(20)))
        assert 0.0 <= res["txt_r1"] <= res["txt_r5"] <= res["txt_r10"] <= 1.0


class TestFeatureStore:
    def test_pack_roundtrip_both_readers(self, tmp_path):
        rng = np.random.default_rng(0)
        data = {
            f"img-{i}": rng.normal(size=(4 + i % 5, 16)).astype(np.float32)
            for i in range(20)
        }
        path = str(tmp_path / "f.mcrpack")
        write_pack(data, path)
        for prefer in (True, False):
            fs = FeatureStore(path, prefer_native=prefer)
            assert len(fs) == 20 and fs.dim == 16
            got = fs["img-13"]
            np.testing.assert_array_equal(got.features, data["img-13"])
            assert got.num_regions == data["img-13"].shape[0]
            assert "missing" not in fs
            with pytest.raises(KeyError):
                fs["missing"]
            fs.close()

    def test_native_view_is_readonly_and_anchors_reader(self, tmp_path):
        """ADVICE r1: the native zero-copy view must refuse in-place writes
        (PROT_READ mapping) and keep the mmap owner alive."""
        from multimodal_context_reasoning_tpu.data.feature_store import (
            _find_native_lib,
        )

        if _find_native_lib() is None:
            pytest.skip("native lib not built")
        rng = np.random.default_rng(0)
        data = {"img-0": rng.normal(size=(3, 8)).astype(np.float32)}
        path = str(tmp_path / "f.mcrpack")
        write_pack(data, path)
        fs = FeatureStore(path, prefer_native=True)
        assert fs.native
        arr = fs["img-0"].features
        assert not arr.flags.writeable
        with pytest.raises((ValueError, RuntimeError)):
            arr[0, 0] = 1.0
        # the view carries a reference chain back to the reader
        base = arr
        while getattr(base, "base", None) is not None and getattr(
            base, "_mcr_reader", None) is None:
            base = base.base
        assert getattr(base, "_mcr_reader", None) is not None
        fs.close()


class TestPromptfuse:
    def test_promptfuse_prefix_mode(self):
        import dataclasses

        from multimodal_context_reasoning_tpu.core.config import ModCRConfig
        from multimodal_context_reasoning_tpu.models.modcr import ModCRModel
        from tests.test_models import make_batch

        cfg = dataclasses.replace(ModCRConfig.tiny(), prefix_mode="promptfuse")
        model = ModCRModel(cfg)
        batch = make_batch(cfg)
        params = model.init(jax.random.PRNGKey(0), batch)
        assert "promptfuse" in params["params"]
        out = model.apply(params, batch)
        assert out.logits.shape == (2, 4)
        assert np.isfinite(float(out.loss))


class TestTensorboardFallback:
    def test_jsonl_fallback_or_tb(self, tmp_path):
        from multimodal_context_reasoning_tpu.utils.metrics import MetricLogger
        from multimodal_context_reasoning_tpu.utils.tensorboard import (
            TensorboardLogger,
        )

        tb = TensorboardLogger(str(tmp_path / "tb"))
        m = MetricLogger()
        m.update(loss=1.0, acc=0.5)
        tb.log_meters(m, step=1)
        tb.log_scalar("lr", 1e-4, step=1)
        tb.close()
        # either real TB event files or the JSONL fallback must exist
        import glob

        files = glob.glob(str(tmp_path / "tb" / "**" / "*"), recursive=True)
        assert files


class TestClipEnsembles:
    """CLIP-gated ablations over precomputed CLIP embeddings
    (models/clip_ensemble.py; reference classes in modeling_ensemble.py)."""

    def _embs(self, Q=3, K=4, D=8, seed=0):
        rng = np.random.default_rng(seed)
        img = rng.normal(size=(Q, D)).astype(np.float32)
        txt = rng.normal(size=(Q, K, D)).astype(np.float32)
        return img, txt

    def test_top2_gate_semantics(self):
        import jax.numpy as jnp

        from multimodal_context_reasoning_tpu.models.clip_ensemble import (
            clip_similarity,
            clip_top2_gate,
        )

        img, txt = self._embs()
        sim = np.asarray(clip_similarity(jnp.asarray(img), jnp.asarray(txt)))
        gate = np.asarray(clip_top2_gate(jnp.asarray(sim)))
        for q in range(sim.shape[0]):
            top2 = np.argsort(-sim[q])[:2]
            want = np.mean(sim[q][top2])
            for k in range(sim.shape[1]):
                if k in top2:
                    np.testing.assert_allclose(gate[q, k], want, rtol=1e-5)
                else:
                    assert gate[q, k] == 1.0

    def test_gated_ensemble_and_similarity_fusion(self):
        import jax
        import jax.numpy as jnp

        from multimodal_context_reasoning_tpu.models.clip_ensemble import (
            ClipGatedEnsemble,
            ClipSimilarityFusion,
            clip_similarity,
        )

        rng = np.random.default_rng(1)
        Q, K = 3, 4
        img, txt = self._embs(Q, K)
        calec = rng.normal(size=(Q * K, 6)).astype(np.float32)
        rob = rng.normal(size=(Q * K, 10)).astype(np.float32)
        label = np.zeros((Q * K,), np.float32)
        label[::K] = 1.0

        m = ClipGatedEnsemble(num_labels=K)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(calec),
                        jnp.asarray(rob), jnp.asarray(img), jnp.asarray(txt))
        out = m.apply(params, jnp.asarray(calec), jnp.asarray(rob),
                      jnp.asarray(img), jnp.asarray(txt),
                      label=jnp.asarray(label))
        assert out.logits.shape == (Q, K)
        assert np.isfinite(float(out.loss))

        f = ClipSimilarityFusion(num_labels=K)
        base = rng.normal(size=(Q, K)).astype(np.float32)
        fp = f.init(jax.random.PRNGKey(0), jnp.asarray(base),
                    jnp.asarray(img), jnp.asarray(txt))
        fout = f.apply(fp, jnp.asarray(base), jnp.asarray(img),
                       jnp.asarray(txt), label=jnp.asarray(label))
        sim = np.asarray(clip_similarity(jnp.asarray(img), jnp.asarray(txt)))
        np.testing.assert_allclose(
            np.asarray(fout.logits), (base + sim) / 2.0, rtol=1e-5
        )

    def test_clip_only_variants(self):
        import jax
        import jax.numpy as jnp

        from multimodal_context_reasoning_tpu.models.clip_ensemble import (
            ClipOnlyModel,
        )

        img, txt = self._embs()
        for variant in ("fusion", "product"):
            m = ClipOnlyModel(num_labels=4, variant=variant, clip_dim=8)
            params = m.init(jax.random.PRNGKey(0), jnp.asarray(img),
                            jnp.asarray(txt))
            out = m.apply(params, jnp.asarray(img), jnp.asarray(txt))
            assert out.logits.shape == (3, 4)
            assert np.all(np.isfinite(np.asarray(out.logits)))
import numpy as np


class _DictDs:
    """Minimal dataset: batch(idx) -> dict of arrays."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def batch(self, idx):
        idx = np.asarray(idx, np.int64)
        return {"x": idx.astype(np.float32)[:, None]}


class TestShardedLoaderSymmetry:
    """Rank-symmetric batch counts (data/loader.py __len__): sharded ranks
    must emit the SAME number of batches or a lifted psum deadlocks."""

    def test_uneven_shards_equal_batch_count_eval(self):
        from multimodal_context_reasoning_tpu.data.loader import DataLoader

        # 65 examples over 2 ranks -> shards of 33/32; bs=32 would give
        # 2 vs 1 batches without the symmetry rule
        ds = _DictDs(65)
        loaders = [DataLoader(ds, 32, shard=(r, 2), prefetch=False)
                   for r in range(2)]
        lens = [len(dl) for dl in loaders]
        assert lens[0] == lens[1] == 2
        seen = []
        masks = []
        for dl in loaders:
            batches = list(dl)
            assert len(batches) == len(dl)
            for b in batches:
                seen.extend(b["x"][b["example_mask"] > 0, 0].tolist())
                masks.append(b["example_mask"].sum())
        # disjoint full coverage, no duplicates among real rows
        assert sorted(int(v) for v in seen) == list(range(65))

    def test_uneven_shards_equal_batch_count_train_drop_last(self):
        from multimodal_context_reasoning_tpu.data.loader import DataLoader

        # 65 over 2 ranks with bs=33: naive per-shard drop_last gives
        # 1 vs 0 batches; the min-shard rule gives 0 everywhere
        ds = _DictDs(65)
        loaders = [DataLoader(ds, 33, shard=(r, 2), drop_last=True,
                              prefetch=False)
                   for r in range(2)]
        assert [len(dl) for dl in loaders] == [0, 0]
        assert [len(list(dl)) for dl in loaders] == [0, 0]

        # bs=16: floor(32/16)=2 batches per rank, extras on rank 0 dropped
        loaders = [DataLoader(ds, 16, shard=(r, 2), drop_last=True,
                              prefetch=False)
                   for r in range(2)]
        assert [len(dl) for dl in loaders] == [2, 2]
        assert [len(list(dl)) for dl in loaders] == [2, 2]

    def test_empty_symmetry_batch_is_fully_masked(self):
        from multimodal_context_reasoning_tpu.data.loader import DataLoader

        ds = _DictDs(33)           # shards 17/16; bs=16 -> 2 batches, rank1
        dl = DataLoader(ds, 16, shard=(1, 2), prefetch=False)
        batches = list(dl)
        assert len(batches) == 2
        assert batches[-1]["example_mask"].sum() == 0
        assert batches[-1]["x"].shape == (16, 1)


class TestDedupInvariantGuard:
    def test_accepts_collate_layout_and_rejects_shuffled(self):
        from multimodal_context_reasoning_tpu.data.collate import (
            assert_dedup_invariant,
        )

        rng = np.random.default_rng(0)
        K, E, I, F = 4, 3, 5, 7
        feat_ex = rng.normal(size=(E, 1, I, F))
        batch = {
            "img_feat": np.repeat(feat_ex, K, axis=1).reshape(E * K, I, F),
            "img_mask": np.ones((E * K, I), np.float32),
        }
        assert_dedup_invariant(batch, K)        # collate layout: fine

        bad = dict(batch)
        # roll by one row: each 4-row group now mixes two examples
        bad["img_feat"] = np.roll(batch["img_feat"], 1, axis=0)
        try:
            assert_dedup_invariant(bad, K)
        except ValueError as e:
            assert "dedup_vision_prefix" in str(e)
        else:
            raise AssertionError("shuffled layout not caught")

        try:
            assert_dedup_invariant({"img_feat": batch["img_feat"][:-1],
                                    "img_mask": batch["img_mask"][:-1]}, K)
        except ValueError as e:
            assert "divisible" in str(e)
        else:
            raise AssertionError("non-divisible batch not caught")


class TestFeatCacheLRU:
    def _dataset(self, cache_size):
        from multimodal_context_reasoning_tpu.core.config import ModCRConfig
        from multimodal_context_reasoning_tpu.cli.common import batch_spec
        from multimodal_context_reasoning_tpu.data.pmr import PMRDataset
        from multimodal_context_reasoning_tpu.data.schemas import (
            ImageFeatures,
            RawExample,
        )
        from multimodal_context_reasoning_tpu.data.tokenization import (
            HashTokenizer,
        )

        cfg = ModCRConfig.tiny()
        rng = np.random.default_rng(0)
        examples = [
            RawExample(f"e{i}", "img-0", f"premise {i} .",
                       [f"answer {i} {j} ." for j in range(4)], 0)
            for i in range(6)
        ]
        feats = {"img-0": ImageFeatures(
            features=rng.normal(
                size=(5, cfg.global_encoder.img_feature_dim)
            ).astype(np.float32),
            num_regions=5,
        )}
        return PMRDataset(
            examples, feats,
            HashTokenizer(vocab_size=cfg.global_encoder.vocab_size),
            HashTokenizer(vocab_size=cfg.roberta.vocab_size),
            spec=batch_spec(cfg), max_chunks=cfg.max_chunks,
            feat_cache_size=cache_size,
        )

    def test_cache_is_lru_bounded(self):
        ds = self._dataset(cache_size=3)
        for i in range(6):
            ds._featurize_cached(i)
        assert len(ds._feat_cache) == 3
        assert set(ds._feat_cache) == {3, 4, 5}
        # a hit refreshes recency: 3 survives the next insertion, 4 doesn't
        ds._featurize_cached(3)
        ds._featurize_cached(0)
        assert 3 in ds._feat_cache and 4 not in ds._feat_cache
        # values identical whether cached or refeaturized
        a = ds._featurize_cached(4)[0]
        b = ds.featurize(ds.examples[4])[0]
        np.testing.assert_array_equal(a.input_ids, b.input_ids)

    def test_cache_disabled(self):
        ds = self._dataset(cache_size=0)
        ds._featurize_cached(0)
        assert len(ds._feat_cache) == 0
