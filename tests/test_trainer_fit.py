"""Trainer.fit end to end on REAL PMR data: epoch loop, device-resident
metric accumulation (no per-micro-step host syncs), epoch_begin/valid_steps
eval gating, best-accuracy checkpointing, and resume — the host-loop
behaviors of run_PMR_ModCR.py:115-241 that unit tests on the jitted step
can't see."""

import logging

import numpy as np
import pytest

import jax

PMR_VAL = "/root/reference/pmr_data/val-ori.jsonl"
N_EXAMPLES = 8
BATCH = 4


@pytest.fixture(scope="module")
def loaders():
    from multimodal_context_reasoning_tpu.cli.common import batch_spec
    from multimodal_context_reasoning_tpu.core.config import ModCRConfig
    from multimodal_context_reasoning_tpu.data.loader import DataLoader
    from multimodal_context_reasoning_tpu.data.pmr import (
        PMRDataset,
        load_pmr_jsonl,
    )
    from multimodal_context_reasoning_tpu.data.schemas import ImageFeatures
    from multimodal_context_reasoning_tpu.data.tokenization import HashTokenizer

    try:
        examples = load_pmr_jsonl(PMR_VAL, limit=N_EXAMPLES)
    except FileNotFoundError:
        pytest.skip("reference pmr_data not mounted")

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
    ds = PMRDataset(
        examples, feats,
        HashTokenizer(vocab_size=cfg.global_encoder.vocab_size),
        HashTokenizer(vocab_size=cfg.roberta.vocab_size),
        spec=batch_spec(cfg), max_chunks=cfg.max_chunks,
    )
    return cfg, DataLoader(ds, BATCH, shuffle=True, seed=5), \
        DataLoader(ds, BATCH, shuffle=False)


class TestTrainerFit:
    def test_fit_evals_saves_best_and_resumes(self, loaders, tmp_path):
        from multimodal_context_reasoning_tpu.core.config import TrainConfig
        from multimodal_context_reasoning_tpu.models.modcr import ModCRModel
        from multimodal_context_reasoning_tpu.train.trainer import Trainer

        cfg, train_loader, val_loader = loaders
        tcfg = TrainConfig(
            learning_rate=1e-3, scheduler="constant", weight_decay=0.0,
            num_train_epochs=2, gradient_accumulation_steps=2,
            valid_steps=1, epoch_begin=1, per_device_batch_size=BATCH,
        )
        records = []

        class _Capture(logging.Handler):
            def emit(self, rec):
                records.append(rec.getMessage())

        logger = logging.getLogger("modcr-test-fit")
        logger.setLevel(logging.INFO)
        logger.addHandler(_Capture())

        trainer = Trainer(
            ModCRModel(cfg), tcfg, train_loader, val_loader,
            checkpoint_dir=str(tmp_path / "ckpt"), logger=logger,
        )
        state = trainer.fit()

        # 2 epochs x 2 batches, metrics drained at every eval/epoch end
        assert int(state.step) == 2 * len(train_loader)
        # 2 micro-batches/epoch at accum=2 → 1 optimizer step per epoch;
        # epoch_begin=1 + valid_steps=1 → one eval per epoch
        evals = [m for m in records if "val accuracy" in m]
        assert len(evals) == 2
        assert 0.0 <= trainer.best_acc <= 1.0
        # the meter drained real (finite) training metrics
        epoch_lines = [m for m in records if "done:" in m]
        assert len(epoch_lines) == 2 and "nan" not in epoch_lines[-1]

        # best-accuracy checkpoint landed and resumes
        assert trainer.ckpt.latest_step() is not None
        trainer2 = Trainer(
            ModCRModel(cfg), tcfg, train_loader, val_loader,
            checkpoint_dir=str(tmp_path / "ckpt"), logger=logger,
        )
        fresh = trainer2.init_state()
        resumed = trainer2.resume(fresh)
        assert int(resumed.step) > 0
        # resumed params equal the saved ones, not the fresh init
        saved_leaf = jax.tree.leaves(resumed.params)[0]
        fresh_leaf = jax.tree.leaves(fresh.params)[0]
        assert not np.array_equal(np.asarray(saved_leaf),
                                  np.asarray(fresh_leaf))

    def test_max_steps_caps_training(self, loaders, tmp_path):
        from multimodal_context_reasoning_tpu.core.config import TrainConfig
        from multimodal_context_reasoning_tpu.models.modcr import ModCRModel
        from multimodal_context_reasoning_tpu.train.trainer import Trainer

        cfg, train_loader, val_loader = loaders
        tcfg = TrainConfig(
            learning_rate=1e-3, scheduler="constant", weight_decay=0.0,
            num_train_epochs=50, max_steps=2,
            gradient_accumulation_steps=1, valid_steps=10**6,
            per_device_batch_size=BATCH,
        )
        trainer = Trainer(ModCRModel(cfg), tcfg, train_loader, None)
        state = trainer.fit()
        # HARD cap: max_steps=2 is an exact multiple of steps-per-epoch —
        # the epoch loop must not enter a further epoch and train one more
        # optimizer step past the cap (at an LR-schedule position beyond
        # t_total)
        assert int(state.step) == tcfg.max_steps


class TestLoaderAbandonment:
    def test_abandoned_iterator_releases_producer_thread(self, loaders):
        """next(iter(loader)) for a sample batch (init_state does this)
        must not leave the prefetch thread parked on a full queue."""
        import threading
        import time

        cfg, train_loader, _ = loaders
        before = threading.active_count()
        for _ in range(5):
            next(iter(train_loader))
        # producers notice the abandoned consumer within their put timeout
        deadline = time.time() + 5.0
        while time.time() < deadline:
            if threading.active_count() <= before + 1:
                break
            time.sleep(0.2)
        assert threading.active_count() <= before + 1, (
            f"{threading.active_count() - before} leaked prefetch threads"
        )


def test_profile_dir_captures_trace(tmp_path):
    """Trainer(profile_dir=...): a jax.profiler trace of the configured
    micro-step window lands on disk (TensorBoard/xprof layout)."""
    import os

    import numpy as np

    from __graft_entry__ import _synthetic_batch
    from multimodal_context_reasoning_tpu.core.config import (
        ModCRConfig, TrainConfig,
    )
    from multimodal_context_reasoning_tpu.models.modcr import ModCRModel

    cfg = ModCRConfig.tiny()
    batches = [
        {k: np.asarray(v) for k, v in _synthetic_batch(cfg, 2, seed=s).items()}
        for s in range(4)
    ]

    class Loader:
        def __iter__(self):
            return iter(batches)

        def __len__(self):
            return len(batches)

    tcfg = TrainConfig(learning_rate=1e-3, scheduler="constant",
                       num_train_epochs=1, per_device_batch_size=2,
                       valid_steps=10_000, epoch_begin=99)
    from multimodal_context_reasoning_tpu.train.trainer import Trainer

    prof = tmp_path / "trace"
    trainer = Trainer(ModCRModel(cfg), tcfg, Loader(),
                      profile_dir=str(prof), profile_start=1,
                      profile_steps=2)
    trainer.fit()
    found = [
        os.path.join(r, f) for r, _, fs in os.walk(prof) for f in fs
    ]
    assert any("trace" in f or f.endswith(".pb") or ".xplane" in f
               for f in found), found


def test_tensorboard_dir_streams_scalars(tmp_path):
    """Trainer(tensorboard_dir=...): validation + epoch meters land as
    TensorBoard event files (or the JSONL fallback) with a val_acc
    scalar."""
    import os

    import numpy as np

    from __graft_entry__ import _synthetic_batch
    from multimodal_context_reasoning_tpu.core.config import (
        ModCRConfig, TrainConfig,
    )
    from multimodal_context_reasoning_tpu.models.modcr import ModCRModel
    from multimodal_context_reasoning_tpu.train.trainer import Trainer

    cfg = ModCRConfig.tiny()
    batches = [
        {k: np.asarray(v) for k, v in _synthetic_batch(cfg, 2, seed=s).items()}
        for s in range(2)
    ]

    class Loader:
        def __iter__(self):
            return iter(batches)

        def __len__(self):
            return len(batches)

    tcfg = TrainConfig(learning_rate=1e-3, scheduler="constant",
                       num_train_epochs=1, per_device_batch_size=2,
                       valid_steps=1, epoch_begin=1)
    tb = tmp_path / "tb"
    trainer = Trainer(ModCRModel(cfg), tcfg, Loader(), Loader(),
                      tensorboard_dir=str(tb))
    trainer.fit()
    found = [os.path.join(r, f) for r, _, fs in os.walk(tb) for f in fs]
    assert found, "no tensorboard/JSONL output written"
    assert any("tfevents" in f or f.endswith("metrics.jsonl")
               for f in found), found
