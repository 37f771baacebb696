"""Static-shape hardening at odd geometries.

The production paths are compiled at the reference's geometry (4
candidates, text 140, 50 regions), but nothing in the design should
require 'nice' sizes: binary choice (num_labels=2), more candidates than
the reference (5), a single image region, odd sequence lengths, and
micro_batch=1 serving must all work end-to-end — model init, a real
optimizer update, eval metrics over a fractional final batch, and the
serving chunk/pad protocol.  Guards reshape/broadcast assumptions that a
4/140/50-only suite would never exercise.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_context_reasoning_tpu.core.config import ModCRConfig, TrainConfig
from multimodal_context_reasoning_tpu.data.collate import BatchSpec
from multimodal_context_reasoning_tpu.data.loader import DataLoader
from multimodal_context_reasoning_tpu.data.pmr import PMRDataset
from multimodal_context_reasoning_tpu.data.schemas import ImageFeatures, RawExample
from multimodal_context_reasoning_tpu.data.tokenization import (
    HashTokenizer,
    RobertaHashTokenizer,
)
from multimodal_context_reasoning_tpu.models.modcr import ModCRModel
from multimodal_context_reasoning_tpu.train.optim import make_optimizer
from multimodal_context_reasoning_tpu.train.state import TrainState
from multimodal_context_reasoning_tpu.train.step import make_eval_step, make_train_step

GEOMS = [
    # binary choice, a single image region, odd lengths
    dict(num_labels=2, text_len=13, img_len=1, roberta_len=17, prefix_len=2),
    # more candidates than the reference's 4, odd lengths
    dict(num_labels=5, text_len=19, img_len=3, roberta_len=23, prefix_len=3),
]
N_EXAMPLES = 5  # not divisible by the loader batch → fractional last batch


def _setup(geom):
    cfg = dataclasses.replace(ModCRConfig.tiny(), max_chunks=3, **geom)
    K = cfg.num_labels
    rng = np.random.default_rng(1)
    feats = {
        f"img-{i}": ImageFeatures(
            features=rng.normal(
                size=(cfg.img_len, cfg.global_encoder.img_feature_dim)
            ).astype(np.float32),
            num_regions=cfg.img_len,
        )
        for i in range(N_EXAMPLES)
    }
    examples = [
        RawExample(
            example_id=f"e{i}", img_id=f"img-{i}",
            premise=f"premise number {i} about the scene .",
            answer_choices=[f"answer option {j} ." for j in range(K)],
            answer_label=i % K,
        )
        for i in range(N_EXAMPLES)
    ]
    spec = BatchSpec(
        text_len=cfg.text_len, img_len=cfg.img_len,
        roberta_len=cfg.roberta_len, num_labels=K,
        img_feature_dim=cfg.global_encoder.img_feature_dim,
    )
    ds = PMRDataset(
        examples, feats,
        HashTokenizer(vocab_size=cfg.global_encoder.vocab_size),
        RobertaHashTokenizer(vocab_size=cfg.roberta.vocab_size),
        spec=spec, max_chunks=cfg.max_chunks,
    )
    return cfg, feats, ds


@pytest.mark.parametrize(
    "geom", GEOMS, ids=["K2-img1-odd-lens", "K5-img3-odd-lens"]
)
def test_train_update_and_fractional_eval(geom):
    cfg, _, ds = _setup(geom)
    model = ModCRModel(cfg)
    dl = DataLoader(ds, batch_size=2, shuffle=False)
    b0 = next(iter(dl))
    jb0 = {k: jnp.asarray(v) for k, v in b0.items()}
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        {k: v for k, v in jb0.items() if k != "example_mask"},
    )

    tx = make_optimizer(
        TrainConfig(learning_rate=1e-3, scheduler="constant", warmup_steps=0),
        total_steps=10, params=params,
    )
    state = TrainState.create(params, tx)
    step = make_train_step(model, donate=False)
    state, metrics = step(state, jb0, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1

    estep = make_eval_step(model)
    tot_correct = tot_count = 0.0
    for b in dl:
        out = estep(state.params, {k: jnp.asarray(v) for k, v in b.items()})
        logits = np.asarray(out["logits"])
        assert logits.shape[-1] == cfg.num_labels
        assert np.isfinite(logits).all()
        tot_correct += float(out["correct"])
        tot_count += float(out["count"])
    # 5 examples over batches of 2 → the padded final batch must contribute
    # a fractional count (example_mask working at odd geometry)
    assert tot_count == float(N_EXAMPLES)
    assert 0.0 <= tot_correct <= tot_count


def test_scorer_micro_batch_1_binary_choice():
    """Serving at the smallest geometry: micro_batch=1, num_labels=2."""
    from multimodal_context_reasoning_tpu.data.collate import collate_candidates
    from multimodal_context_reasoning_tpu.serving.scorer import ModCRScorer

    cfg, feats, ds = _setup(GEOMS[0])
    model = ModCRModel(cfg)
    ex = ds.examples[0]
    batch = collate_candidates([ds.featurize(ex)], [ds.get_image(ex)], ds.spec)
    params = model.init(
        jax.random.PRNGKey(0), {k: jnp.asarray(v) for k, v in batch.items()}
    )
    # hand the scorer a HOST numpy tree (what restore_params returns): the
    # constructor must commit it to device once — jit doesn't cache numpy
    # args, so an uncommitted tree would re-ship on every call
    np_params = jax.tree_util.tree_map(np.asarray, params)
    scorer = ModCRScorer(
        cfg, np_params,
        HashTokenizer(vocab_size=cfg.global_encoder.vocab_size),
        RobertaHashTokenizer(vocab_size=cfg.roberta.vocab_size),
        feats, micro_batch=1,
    )
    assert all(
        isinstance(leaf, jax.Array)
        for leaf in jax.tree_util.tree_leaves(scorer.params)
    )
    results = scorer.score(list(ds.examples[:3]))  # 3 single-example calls
    assert [r["example_id"] for r in results] == ["e0", "e1", "e2"]
    for r in results:
        assert len(r["logits"]) == 2
        assert r["prediction"] in (0, 1)
        np.testing.assert_allclose(sum(r["probs"]), 1.0, rtol=1e-4)
