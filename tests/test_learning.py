"""Learning integration: the full ModCR training stack must overfit a tiny
separable problem — evidence that gradients flow end-to-end through the
prefix path (the only trainable route from the image to the decision)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_context_reasoning_tpu.core.config import ModCRConfig, TrainConfig
from multimodal_context_reasoning_tpu.models.modcr import ModCRModel
from multimodal_context_reasoning_tpu.train.optim import make_optimizer
from multimodal_context_reasoning_tpu.train.state import TrainState
from multimodal_context_reasoning_tpu.train.step import make_train_step
from tests.test_models import make_batch


@pytest.mark.slow
def test_overfits_fixed_batch():
    cfg = ModCRConfig.tiny()
    model = ModCRModel(cfg)
    batch = make_batch(cfg, n_examples=2, seed=3)
    params = model.init(jax.random.PRNGKey(0), batch)
    tcfg = TrainConfig(
        learning_rate=3e-3, scheduler="constant", warmup_steps=0,
        gradient_accumulation_steps=1, weight_decay=0.0,
    )
    tx = make_optimizer(tcfg, total_steps=200, params=params)
    state = TrainState.create(params, tx)
    step = make_train_step(model, donate=False)

    rng = jax.random.PRNGKey(1)
    first = last = None
    for i in range(60):
        rng, k = jax.random.split(rng)
        state, m = step(state, batch, k)
        if i == 0:
            first = float(m["loss"])
        last = float(m["loss"])
    acc = float(m["correct"]) / float(m["count"])
    assert last < first * 0.5, (first, last)
    assert acc == 1.0, acc
