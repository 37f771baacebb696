"""Train-harness tests: param labeling, schedules, train step, checkpoint."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_context_reasoning_tpu.core.config import ModCRConfig, TrainConfig
from multimodal_context_reasoning_tpu.models.modcr import ModCRModel
from multimodal_context_reasoning_tpu.parallel.mesh import make_mesh, mesh_shape_for
from multimodal_context_reasoning_tpu.parallel.partition import param_shardings
from multimodal_context_reasoning_tpu.train.optim import (
    label_params,
    make_optimizer,
    make_schedule,
)
from multimodal_context_reasoning_tpu.train.state import TrainState
from multimodal_context_reasoning_tpu.train.step import make_train_step
from tests.test_models import make_batch


@pytest.fixture(scope="module")
def setup():
    cfg = ModCRConfig.tiny()
    model = ModCRModel(cfg)
    batch = make_batch(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    return cfg, model, batch, params


class TestLabels:
    def test_freezing_labels(self, setup):
        _, _, _, params = setup
        labels = label_params(params, freeze_encoders=True)
        flat = jax.tree_util.tree_leaves_with_path(labels)
        seen = set()
        for path, lab in flat:
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            seen.add(lab)
            if "global_enc" in name or "seq_enc" in name:
                assert lab == "frozen", name
            else:
                assert lab == "main", name
        assert seen == {"frozen", "main"}

    def test_roberta_body_freeze(self, setup):
        _, _, _, params = setup
        labels = label_params(
            params, freeze_encoders=True, freeze_roberta_body=True
        )
        for path, lab in jax.tree_util.tree_leaves_with_path(labels):
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            if "roberta" in name:
                if "embeddings" in name or "pooler" in name:
                    assert lab == "main", name
                else:
                    assert lab == "frozen", name


class TestSchedule:
    def test_linear_warmup_decay(self):
        cfg = TrainConfig(scheduler="linear", warmup_steps=10)
        s = make_schedule(cfg, total_steps=110)
        assert float(s(0)) == 0.0
        np.testing.assert_allclose(float(s(10)), 1.0, atol=1e-6)
        assert 0.0 < float(s(60)) < 1.0
        np.testing.assert_allclose(float(s(110)), 0.0, atol=1e-6)

    def test_constant(self):
        cfg = TrainConfig(scheduler="constant", warmup_steps=0)
        s = make_schedule(cfg, total_steps=100)
        assert float(s(0)) == float(s(50)) == 1.0

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            make_schedule(TrainConfig(scheduler="cosine"), 10)


class TestTrainStep:
    def test_loss_decreases_and_frozen_params_fixed(self, setup):
        cfg, model, batch, params = setup
        tcfg = TrainConfig(
            learning_rate=5e-3, scheduler="constant", warmup_steps=0,
            gradient_accumulation_steps=1,
        )
        tx = make_optimizer(tcfg, total_steps=100, params=params)
        state = TrainState.create(params, tx)
        step = make_train_step(model, donate=False)

        frozen_before = jax.tree_util.tree_leaves(
            state.params["params"]["global_enc"]
        )[0].copy()
        losses = []
        rng = jax.random.PRNGKey(0)
        for i in range(5):
            rng, k = jax.random.split(rng)
            state, metrics = step(state, batch, k)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses
        frozen_after = jax.tree_util.tree_leaves(
            state.params["params"]["global_enc"]
        )[0]
        np.testing.assert_array_equal(
            np.asarray(frozen_before), np.asarray(frozen_after)
        )
        assert int(state.step) == 5

    def test_grad_accumulation_steps_updates_every_n(self, setup):
        cfg, model, batch, params = setup
        tcfg = TrainConfig(
            learning_rate=5e-3, scheduler="constant",
            gradient_accumulation_steps=2,
        )
        tx = make_optimizer(tcfg, total_steps=100, params=params)
        state = TrainState.create(params, tx)
        step = make_train_step(model, donate=False)

        p0 = jax.tree_util.tree_leaves(state.params["params"]["roberta"])[0].copy()
        state, _ = step(state, batch, jax.random.PRNGKey(1))
        p1 = jax.tree_util.tree_leaves(state.params["params"]["roberta"])[0]
        # first micro-batch: accumulated, no update yet
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
        state, _ = step(state, batch, jax.random.PRNGKey(2))
        p2 = jax.tree_util.tree_leaves(state.params["params"]["roberta"])[0]
        assert float(jnp.max(jnp.abs(p2 - p0))) > 0.0


class TestMesh:
    def test_mesh_shape_for(self):
        assert mesh_shape_for(8, 2) == (4, 2)
        with pytest.raises(ValueError):
            mesh_shape_for(6, 4)

    def test_param_shardings_rules(self, setup):
        _, _, _, params = setup
        mesh = make_mesh(model_parallelism=2)
        sh = param_shardings(params, mesh)
        # attention kernels are model-sharded, biases replicated
        q = sh["params"]["roberta"]["layer_0"]["attention"]["query"]
        assert q["kernel"].spec == jax.sharding.PartitionSpec(None, "model")
        assert q["bias"].spec == jax.sharding.PartitionSpec()


class TestCheckpoint:
    def test_save_restore_roundtrip(self, setup, tmp_path):
        cfg, model, batch, params = setup
        from multimodal_context_reasoning_tpu.train.checkpoint import (
            CheckpointManager,
        )

        tcfg = TrainConfig(gradient_accumulation_steps=1)
        tx = make_optimizer(tcfg, total_steps=10, params=params)
        state = TrainState.create(params, tx)
        step = make_train_step(model, donate=False)
        state, _ = step(state, batch, jax.random.PRNGKey(0))

        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(state, {"accuracy": 0.5})
        mgr.wait()
        assert mgr.latest_step() == 1

        fresh = TrainState.create(params, tx)
        restored = mgr.restore(fresh)
        assert int(restored.step) == 1
        a = jax.tree_util.tree_leaves(state.params)[0]
        b = jax.tree_util.tree_leaves(restored.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        mgr.close()

    def test_params_only_mode(self, setup, tmp_path):
        """params_only saves drop opt_state (3x smaller D2H per save);
        restore_params round-trips, restore() refuses to resume."""
        cfg, model, batch, params = setup
        from multimodal_context_reasoning_tpu.train.checkpoint import (
            CheckpointManager,
        )

        tcfg = TrainConfig(gradient_accumulation_steps=1)
        tx = make_optimizer(tcfg, total_steps=10, params=params)
        state = TrainState.create(params, tx)
        step = make_train_step(model, donate=False)
        state, _ = step(state, batch, jax.random.PRNGKey(0))

        mgr = CheckpointManager(str(tmp_path / "ckpt"), params_only=True)
        mgr.save(state, {"accuracy": 0.5})
        mgr.wait()

        raw = mgr._mgr.restore(mgr.latest_step())
        assert set(raw.keys()) == {"params", "step"}  # no opt_state on disk

        got = mgr.restore_params(best=True)
        a = jax.tree_util.tree_leaves(state.params)[0]
        b = jax.tree_util.tree_leaves(got)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        with pytest.raises(ValueError, match="params-only"):
            mgr.restore(TrainState.create(params, tx))
        mgr.close()


class TestMaskedMultiSteps:
    def test_updates_match_optax_multisteps(self):
        """masked_multisteps (all-True mask) emits bit-identical updates to
        optax.MultiSteps(use_grad_mean=True) over several windows."""
        import optax

        from multimodal_context_reasoning_tpu.train.optim import (
            masked_multisteps,
        )

        inner = optax.adam(1e-2)
        params = {"a": jnp.arange(4.0), "b": jnp.ones((2, 3))}
        mask = jax.tree.map(lambda _: True, params)
        ours = masked_multisteps(inner, 3, mask)
        ref = optax.MultiSteps(inner, 3, use_grad_mean=True)

        s_o, s_r = ours.init(params), ref.init(params)
        rng = np.random.default_rng(0)
        p_o = p_r = params
        for t in range(7):
            g = jax.tree.map(
                lambda p: jnp.asarray(
                    rng.normal(size=p.shape).astype(np.float32)
                ),
                params,
            )
            u_o, s_o = ours.update(g, s_o, p_o)
            u_r, s_r = ref.update(g, s_r, p_r)
            for k in params:
                np.testing.assert_allclose(
                    np.asarray(u_o[k]), np.asarray(u_r[k]),
                    rtol=1e-6, atol=1e-7,
                )
            p_o = optax.apply_updates(p_o, u_o)
            p_r = optax.apply_updates(p_r, u_r)

    def test_frozen_leaves_store_no_accumulator(self, setup):
        """The production optimizer's accumulation state holds MaskedNode
        (no array) for every frozen-tower leaf."""
        import optax

        from multimodal_context_reasoning_tpu.train.optim import (
            MaskedMultiStepsState,
        )

        cfg, model, batch, params = setup
        tcfg = TrainConfig(gradient_accumulation_steps=4)
        tx = make_optimizer(tcfg, total_steps=10, params=params)
        state = tx.init(params)
        assert isinstance(state, MaskedMultiStepsState)
        acc = state.acc_grads["params"]
        frozen_leaves = jax.tree.leaves(
            acc["global_enc"],
            is_leaf=lambda x: isinstance(x, optax.MaskedNode),
        )
        assert frozen_leaves and all(
            isinstance(l, optax.MaskedNode) for l in frozen_leaves
        )
        # trainable tower keeps a real accumulator
        live = jax.tree.leaves(acc["roberta"])
        assert live and hasattr(live[0], "shape")


class TestRematEquivalence:
    def test_remat_policies_do_not_change_loss_or_grads(self):
        """remat is a scheduling choice, never a numerics choice: loss and
        gradients must be identical across remat=False / 'full' / 'dots'
        (models/roberta.py routes nn.remat with an optional
        dots_with_no_batch_dims_saveable policy)."""
        import dataclasses

        import jax
        import numpy as np

        from __graft_entry__ import _synthetic_batch
        from multimodal_context_reasoning_tpu.core.config import ModCRConfig
        from multimodal_context_reasoning_tpu.models.modcr import ModCRModel

        base = ModCRConfig.tiny()
        base = dataclasses.replace(base, compute_alignment=False)
        batch = _synthetic_batch(base, n_examples=2)

        results = {}
        for name, (remat, policy) in {
            "none": (False, "full"),
            "full": (True, "full"),
            "dots": (True, "dots"),
        }.items():
            cfg = dataclasses.replace(
                base,
                roberta=dataclasses.replace(
                    base.roberta, remat=remat, remat_policy=policy
                ),
            )
            model = ModCRModel(cfg)
            params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

            def loss_fn(p):
                return model.apply(p, batch, deterministic=True).loss

            loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
            gnorm = jax.jit(
                lambda g: sum(
                    jax.numpy.sum(jax.numpy.square(x))
                    for x in jax.tree_util.tree_leaves(g)
                )
            )(grads)
            results[name] = (float(loss), float(gnorm))

        for name in ("full", "dots"):
            np.testing.assert_allclose(
                results[name][0], results["none"][0], rtol=1e-6, err_msg=name
            )
            np.testing.assert_allclose(
                results[name][1], results["none"][1], rtol=1e-5, err_msg=name
            )
