"""End-to-end PMR accuracy fixture on REAL reference data.

The one flow that exercises loader + featurizer + model + metrics together
(the reference's eval loop, run_PMR_ModCR.py:243-280): load
``pmr_data/val-ori.jsonl``, featurize with the hash tokenizer, batch with
static shapes, run ``make_eval_step`` at random init, and check

- accuracy ≈ 0.25 (4-way chance at random init),
- the padded final batch contributes a FRACTIONAL ``count`` (example_mask
  keeps padding out of the metrics),
- the counted total equals the real example count exactly.
"""

import json

import numpy as np
import pytest

import jax

PMR_VAL = "/root/reference/pmr_data/val-ori.jsonl"
N_EXAMPLES = 21          # deliberately not divisible by the batch size
BATCH = 4


@pytest.fixture(scope="module")
def pmr_setup():
    from multimodal_context_reasoning_tpu.cli.common import batch_spec
    from multimodal_context_reasoning_tpu.core.config import ModCRConfig
    from multimodal_context_reasoning_tpu.data.loader import DataLoader
    from multimodal_context_reasoning_tpu.data.pmr import (
        PMRDataset,
        load_pmr_jsonl,
    )
    from multimodal_context_reasoning_tpu.data.schemas import ImageFeatures
    from multimodal_context_reasoning_tpu.data.tokenization import HashTokenizer
    from multimodal_context_reasoning_tpu.models.modcr import ModCRModel

    try:
        examples = load_pmr_jsonl(PMR_VAL, limit=N_EXAMPLES)
    except FileNotFoundError:
        pytest.skip("reference pmr_data not mounted")

    cfg = ModCRConfig.tiny()
    rng = np.random.default_rng(0)
    feats = {
        ex.img_id: ImageFeatures(
            features=rng.normal(
                size=(7, cfg.global_encoder.img_feature_dim)
            ).astype(np.float32),
            num_regions=7,
        )
        for ex in examples
    }
    # tokenizer vocabs MUST match the model config: out-of-range token ids
    # make nn.Embed emit NaN inside jit (jnp.take fill mode) — silently,
    # since argmax over an all-NaN row returns 0 and still looks
    # "chance-like" to an accuracy assertion
    ds = PMRDataset(
        examples, feats,
        HashTokenizer(vocab_size=cfg.global_encoder.vocab_size),
        HashTokenizer(vocab_size=cfg.roberta.vocab_size),
        spec=batch_spec(cfg), max_chunks=cfg.max_chunks,
    )
    model = ModCRModel(cfg)
    return cfg, model, ds, DataLoader(ds, BATCH, shuffle=False)


class TestE2EPMR:
    def test_random_init_accuracy_and_fractional_final_count(self, pmr_setup):
        from multimodal_context_reasoning_tpu.train.step import make_eval_step

        cfg, model, ds, loader = pmr_setup
        first = next(iter(loader))
        inputs = {k: v for k, v in first.items() if k != "example_mask"}
        params = jax.jit(model.init)(jax.random.PRNGKey(0), inputs)

        eval_step = make_eval_step(model)
        correct = 0.0
        count = 0.0
        batch_counts = []
        for batch in loader:
            out = eval_step(params, batch)
            assert np.all(np.isfinite(np.asarray(out["logits"]))), (
                "non-finite logits — check tokenizer/model vocab match"
            )
            batch_counts.append(float(out["count"]))
            correct += float(out["correct"])
            count += float(out["count"])

        # the last batch is padded (21 % 4 == 1) → its count is fractional
        assert batch_counts[-1] == N_EXAMPLES % BATCH
        assert count == N_EXAMPLES
        acc = correct / count
        # random init, 4-way choice: chance with slack for 21 examples
        assert 0.0 <= acc <= 0.62, f"accuracy {acc} not chance-like"

    def test_deterministic_across_runs(self, pmr_setup):
        from multimodal_context_reasoning_tpu.train.step import make_eval_step

        cfg, model, ds, loader = pmr_setup
        first = next(iter(loader))
        inputs = {k: v for k, v in first.items() if k != "example_mask"}
        params = jax.jit(model.init)(jax.random.PRNGKey(0), inputs)
        eval_step = make_eval_step(model)
        a = np.asarray(eval_step(params, first)["logits"])
        b = np.asarray(eval_step(params, first)["logits"])
        np.testing.assert_array_equal(a, b)

    def test_real_rows_have_expected_schema(self):
        rows = [json.loads(l) for l in open(PMR_VAL)][:3]
        for r in rows:
            assert {"premise", "answer_choices", "answer_label",
                    "img_id"} <= set(r)


class TestE2EVCR:
    """Same end-to-end flow on the real VCR validation data
    (run_vcr_ModCR.py eval path; dataset loader data/vcr.py)."""

    def test_vcr_flow_counts_and_chance_accuracy(self):
        from multimodal_context_reasoning_tpu.cli.common import batch_spec
        from multimodal_context_reasoning_tpu.core.config import ModCRConfig
        from multimodal_context_reasoning_tpu.data.loader import DataLoader
        from multimodal_context_reasoning_tpu.data.schemas import ImageFeatures
        from multimodal_context_reasoning_tpu.data.tokenization import (
            HashTokenizer,
        )
        from multimodal_context_reasoning_tpu.data.vcr import (
            VCRDataset,
            load_vcr_json,
        )
        from multimodal_context_reasoning_tpu.models.modcr import ModCRModel
        from multimodal_context_reasoning_tpu.train.step import make_eval_step

        try:
            examples = load_vcr_json(
                "/root/reference/vcr_data/vcr_val.json", limit=9)
        except FileNotFoundError:
            pytest.skip("reference vcr_data not mounted")

        cfg = ModCRConfig.tiny()
        rng = np.random.default_rng(0)
        feats = {
            ex.img_id: ImageFeatures(
                features=rng.normal(
                    size=(6, cfg.global_encoder.img_feature_dim)
                ).astype(np.float32),
                num_regions=6,
            )
            for ex in examples
        }
        ds = VCRDataset(
            examples, feats,
            HashTokenizer(vocab_size=cfg.global_encoder.vocab_size),
            HashTokenizer(vocab_size=cfg.roberta.vocab_size),
            spec=batch_spec(cfg), max_chunks=cfg.max_chunks,
        )
        loader = DataLoader(ds, 4, shuffle=False)
        model = ModCRModel(cfg)
        first = next(iter(loader))
        inputs = {k: v for k, v in first.items() if k != "example_mask"}
        params = jax.jit(model.init)(jax.random.PRNGKey(0), inputs)
        eval_step = make_eval_step(model)
        correct = count = 0.0
        for batch in loader:
            out = eval_step(params, batch)
            assert np.all(np.isfinite(np.asarray(out["logits"])))
            correct += float(out["correct"])
            count += float(out["count"])
        assert count == 9                     # 9 % 4 == 1: padded final batch
        assert 0.0 <= correct / count <= 0.8
