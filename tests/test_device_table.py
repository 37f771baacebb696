"""Device-resident feature table (data/device_table.py): on-device gather
must be bit-equivalent to host-materialized features, end to end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_context_reasoning_tpu.cli.common import batch_spec
from multimodal_context_reasoning_tpu.core.config import ModCRConfig, TrainConfig
from multimodal_context_reasoning_tpu.data.device_table import DeviceFeatureTable
from multimodal_context_reasoning_tpu.data.loader import DataLoader
from multimodal_context_reasoning_tpu.data.pmr import PMRDataset
from multimodal_context_reasoning_tpu.data.schemas import ImageFeatures, RawExample
from multimodal_context_reasoning_tpu.data.tokenization import HashTokenizer
from multimodal_context_reasoning_tpu.models.modcr import ModCRModel
from multimodal_context_reasoning_tpu.train.optim import make_optimizer
from multimodal_context_reasoning_tpu.train.state import TrainState
from multimodal_context_reasoning_tpu.train.step import make_eval_step, make_train_step


@pytest.fixture(scope="module")
def setup():
    cfg = ModCRConfig.tiny()
    rng = np.random.default_rng(0)
    examples = [
        RawExample(f"e{i}", f"img-{i % 3}", f"premise {i} about people .",
                   [f"answer {i} {j} ." for j in range(4)], i % 4)
        for i in range(6)
    ]
    feats = {
        f"img-{i}": ImageFeatures(
            features=rng.normal(
                size=(3 + i, cfg.global_encoder.img_feature_dim)
            ).astype(np.float32),
            num_regions=3 + i,
        )
        for i in range(3)
    }
    bert = HashTokenizer(vocab_size=cfg.global_encoder.vocab_size)
    rob = HashTokenizer(vocab_size=cfg.roberta.vocab_size)

    def mk(device_table):
        ds = PMRDataset(examples, feats, bert, rob, spec=batch_spec(cfg),
                        max_chunks=cfg.max_chunks)
        if device_table is not None:
            ds.use_device_table(device_table)
        return ds

    # fp32 table: the equality below is then exact (prod uses bf16 — the
    # same cast the bf16 compute path applies anyway)
    table = DeviceFeatureTable(feats, img_len=cfg.img_len, dtype="float32")
    model = ModCRModel(cfg)
    host_b = mk(None).batch(range(4))
    dev_b = mk(table).batch(range(4))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), {k: jnp.asarray(v) for k, v in host_b.items()}
    )
    return cfg, model, params, mk, table, host_b, dev_b


class TestDeviceTable:
    def test_batch_schema(self, setup):
        cfg, model, params, mk, table, host_b, dev_b = setup
        assert "img_feat" not in dev_b and "img_mask" not in dev_b
        assert dev_b["img_row"].shape == (16,)
        # candidate rows of one example share the image row (dedup contract)
        assert len(set(dev_b["img_row"][:4].tolist())) == 1
        # the table reference is the SAME device buffer every batch
        assert mk(table).batch(range(2))["feat_table"] is table.table

    def test_eval_logits_equal(self, setup):
        cfg, model, params, mk, table, host_b, dev_b = setup
        step = make_eval_step(model)
        a = step(params, {k: jnp.asarray(v) for k, v in host_b.items()})
        b = step(params, {k: jnp.asarray(v) for k, v in dev_b.items()})
        np.testing.assert_allclose(
            np.asarray(a["logits"]), np.asarray(b["logits"]),
            rtol=1e-6, atol=1e-6,
        )

    def test_train_step_loss_and_grads_equal(self, setup):
        cfg, model, params, mk, table, host_b, dev_b = setup
        tcfg = TrainConfig(learning_rate=1e-3, scheduler="constant",
                           per_device_batch_size=4)
        losses = {}
        for name, b in (("host", host_b), ("dev", dev_b)):
            tx = make_optimizer(tcfg, 10, params)
            state = TrainState.create(params, tx)
            step = make_train_step(model, donate=False)
            _, m = step(state, {k: jnp.asarray(v) for k, v in b.items()},
                        jax.random.PRNGKey(1))
            losses[name] = (float(m["loss"]), float(m["grad_norm"]))
        np.testing.assert_allclose(losses["host"], losses["dev"], rtol=1e-6)

    def test_mesh_train_step_with_replicated_table(self, setup):
        """8-device mesh: batch rows shard over 'data', the table
        replicates (parallel/partition.py _REPLICATED_BATCH_KEYS)."""
        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device virtual mesh")
        from multimodal_context_reasoning_tpu.parallel.mesh import make_mesh

        cfg, model, params, mk, table, host_b, dev_b = setup
        mesh = make_mesh((4, 2))
        tcfg = TrainConfig(learning_rate=1e-3, scheduler="constant",
                           per_device_batch_size=4)
        tx = make_optimizer(tcfg, 10, params)
        state = TrainState.create(params, tx)
        step = make_train_step(model, mesh=mesh, donate=False)
        _, m = step(state, {k: jnp.asarray(v) for k, v in dev_b.items()},
                    jax.random.PRNGKey(1))
        assert np.isfinite(float(m["loss"]))

    def test_multihost_lift_replicates_table(self, setup):
        """global_batch lifts table keys replicated (cached — the table
        ships once, not per step), rows sharded over 'data', and the
        lifted batch scores identically."""
        from multimodal_context_reasoning_tpu.parallel.mesh import make_mesh
        from multimodal_context_reasoning_tpu.parallel.multihost import (
            global_batch,
        )

        cfg, model, params, mk, table, host_b, dev_b = setup
        mesh = make_mesh((len(jax.devices()), 1))
        g1 = global_batch(dev_b, mesh)
        g2 = global_batch(mk(table).batch(range(2)), mesh)
        assert g1["feat_table"].sharding.is_fully_replicated
        assert g1["feat_table"] is g2["feat_table"]  # cached lift
        assert "data" in (g1["img_row"].sharding.spec or ())
        a = make_eval_step(model)(
            params, {k: jnp.asarray(v) for k, v in dev_b.items()}
        )
        b = make_eval_step(model, mesh=mesh)(params, g1)
        np.testing.assert_allclose(
            np.asarray(a["logits"]), np.asarray(b["logits"]),
            rtol=1e-6, atol=1e-6,
        )

    def test_row_for_reference_key_quirk(self, setup):
        cfg, model, params, mk, table, host_b, dev_b = setup
        assert table.row_for("img-1") == table.row_for("somesplit-1")
