"""Scan-over-layers reasoner (RobertaConfig.scan_layers).

The scanned tower must be a pure re-layout of the Python-loop tower:
identical forward outputs and identical gradients once the per-layer
params are stacked (stack_layer_params), with the TP sharding rules
extending to the stacked kernels.  The memory motivation (sequential
scan backward vs XLA hoisting every loop layer's recompute) is measured
on the v5e in BENCHMARKS.md "Batch-size headroom (round 5)".
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_context_reasoning_tpu.core.config import ModCRConfig, RobertaConfig
from multimodal_context_reasoning_tpu.models.roberta import (
    PrefixRoberta,
    stack_layer_params,
    unstack_layer_params,
)


def _tiny_rob(**kw) -> RobertaConfig:
    return RobertaConfig(
        vocab_size=97, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, **kw,
    )


def _inputs(rng, B=2, L=9, P=3, H=32, vocab=97):
    ids = rng.integers(1, vocab, size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), np.int32)
    mask[1, L - 2:] = 0
    prefix = rng.normal(size=(B, P, H)).astype(np.float32)
    pmask = np.ones((B, P), np.float32)
    pmask[0, -1] = 0.0
    return (jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(prefix),
            jnp.asarray(pmask))


@pytest.fixture(scope="module")
def loop_setup():
    cfg = _tiny_rob()
    model = PrefixRoberta(cfg)
    rng = np.random.default_rng(0)
    ids, mask, prefix, pmask = _inputs(rng)
    params = model.init(
        jax.random.PRNGKey(0), ids, mask,
        prompt_embeddings=prefix, prompt_mask=pmask)
    return cfg, params, (ids, mask, prefix, pmask)


class TestStackRoundtrip:
    def test_roundtrip_identity(self, loop_setup):
        cfg, params, _ = loop_setup
        tower = params["params"]
        stacked = stack_layer_params(tower, cfg.num_hidden_layers)
        assert "layer_0" not in stacked and "layers" in stacked
        k = jax.tree.leaves(stacked["layers"])[0]
        assert k.shape[0] == cfg.num_hidden_layers
        back = unstack_layer_params(stacked, cfg.num_hidden_layers)
        jax.tree.map(
            np.testing.assert_array_equal,
            jax.tree.map(np.asarray, back),
            jax.tree.map(np.asarray, tower))


class TestScanEquivalence:
    @pytest.mark.parametrize("remat", [False, True])
    def test_forward_identical(self, loop_setup, remat):
        cfg, params, (ids, mask, prefix, pmask) = loop_setup
        loop_cfg = dataclasses.replace(cfg, remat=remat)
        scan_cfg = dataclasses.replace(cfg, scan_layers=True, remat=remat)
        want = PrefixRoberta(loop_cfg).apply(
            params, ids, mask, prompt_embeddings=prefix, prompt_mask=pmask)
        sp = {"params": stack_layer_params(
            params["params"], cfg.num_hidden_layers)}
        got = PrefixRoberta(scan_cfg).apply(
            sp, ids, mask, prompt_embeddings=prefix, prompt_mask=pmask)
        np.testing.assert_allclose(np.asarray(got.sequence),
                                   np.asarray(want.sequence),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got.pooled),
                                   np.asarray(want.pooled),
                                   rtol=1e-6, atol=1e-6)

    def test_forward_identical_no_prefix(self, loop_setup):
        cfg, params, (ids, mask, _, _) = loop_setup
        scan_cfg = dataclasses.replace(cfg, scan_layers=True)
        want = PrefixRoberta(cfg).apply(params, ids, mask)
        sp = {"params": stack_layer_params(
            params["params"], cfg.num_hidden_layers)}
        got = PrefixRoberta(scan_cfg).apply(sp, ids, mask)
        np.testing.assert_allclose(np.asarray(got.pooled),
                                   np.asarray(want.pooled),
                                   rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("remat,flash", [(False, False), (True, True)])
    def test_grads_identical(self, loop_setup, remat, flash):
        """Same function, same params → same gradients: loop grads stacked
        must equal scan grads (incl. remat + mem-efficient attention)."""
        cfg, params, (ids, mask, prefix, pmask) = loop_setup
        loop_cfg = dataclasses.replace(
            cfg, remat=remat, mem_efficient_attention=flash)
        scan_cfg = dataclasses.replace(loop_cfg, scan_layers=True)

        def loss(p, model_cfg):
            out = PrefixRoberta(model_cfg).apply(
                p, ids, mask, prompt_embeddings=prefix, prompt_mask=pmask)
            return jnp.sum(out.pooled ** 2) + jnp.sum(out.sequence ** 2)

        g_loop = jax.grad(loss)(params, loop_cfg)["params"]
        sp = {"params": stack_layer_params(
            params["params"], cfg.num_hidden_layers)}
        g_scan = jax.grad(loss)(sp, scan_cfg)["params"]
        g_loop_stacked = stack_layer_params(g_loop, cfg.num_hidden_layers)
        # rtol accommodates fp32 accumulation-order differences (the scan
        # body fuses differently than the unrolled loop); structure and
        # magnitudes must agree
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-5),
            g_scan, g_loop_stacked)

    def test_scan_init_shapes_match_stacked(self, loop_setup):
        """Direct init under scan produces exactly the stacked layout."""
        cfg, params, (ids, mask, prefix, pmask) = loop_setup
        scan_cfg = dataclasses.replace(cfg, scan_layers=True)
        sp_direct = PrefixRoberta(scan_cfg).init(
            jax.random.PRNGKey(1), ids, mask,
            prompt_embeddings=prefix, prompt_mask=pmask)
        sp_conv = {"params": stack_layer_params(
            params["params"], cfg.num_hidden_layers)}
        jax.tree.map(
            lambda a, b: (np.testing.assert_array_equal(a.shape, b.shape),
                          np.testing.assert_array_equal(
                              str(a.dtype), str(b.dtype))),
            sp_direct, sp_conv)


class TestScanSharding:
    def test_stacked_kernels_get_tp_specs(self, loop_setup):
        from jax.sharding import PartitionSpec as P

        from multimodal_context_reasoning_tpu.parallel.mesh import make_mesh
        from multimodal_context_reasoning_tpu.parallel.partition import (
            param_shardings,
        )

        cfg, params, _ = loop_setup
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        mesh = make_mesh(model_parallelism=2)
        sp = {"params": stack_layer_params(
            params["params"], cfg.num_hidden_layers)}
        sh = param_shardings(sp, mesh)
        q = sh["params"]["layers"]["layer"]["attention"]["query"]["kernel"]
        assert q.spec == P(None, None, "model")
        out = sh["params"]["layers"]["layer"]["attention"]["out"]["kernel"]
        assert out.spec == P(None, "model", None)
        qb = sh["params"]["layers"]["layer"]["attention"]["query"]["bias"]
        assert qb.spec == P()


class TestModCRScan:
    def test_train_step_runs_and_matches_loop(self):
        """Full composite: 3 train steps with the scanned reasoner match
        the loop reasoner step-for-step (dropout 0, fp32)."""
        from __graft_entry__ import _synthetic_batch
        from multimodal_context_reasoning_tpu.core.config import TrainConfig
        from multimodal_context_reasoning_tpu.models.modcr import ModCRModel
        from multimodal_context_reasoning_tpu.train.optim import make_optimizer
        from multimodal_context_reasoning_tpu.train.state import TrainState
        from multimodal_context_reasoning_tpu.train.step import make_train_step

        cfg = ModCRConfig.tiny()
        batch = _synthetic_batch(cfg, n_examples=2)
        model_loop = ModCRModel(cfg)
        params = jax.jit(model_loop.init)(jax.random.PRNGKey(0), batch)

        scan_cfg = dataclasses.replace(
            cfg, roberta=dataclasses.replace(
                cfg.roberta, scan_layers=True, remat=True,
                mem_efficient_attention=True))
        nl = cfg.roberta.num_hidden_layers
        sp = dict(params)
        sp["params"] = dict(params["params"])
        sp["params"]["roberta"] = stack_layer_params(
            params["params"]["roberta"], nl)

        def run(model, p):
            tcfg = TrainConfig(learning_rate=1e-3, scheduler="constant",
                               per_device_batch_size=2)
            tx = make_optimizer(tcfg, total_steps=10, params=p)
            state = TrainState.create(p, tx)
            step = make_train_step(model, donate=False)
            losses = []
            for i in range(3):
                state, m = step(state, batch, jax.random.PRNGKey(i))
                losses.append(float(m["loss"]))
            return losses

        losses_loop = run(model_loop, params)
        losses_scan = run(ModCRModel(scan_cfg), sp)
        np.testing.assert_allclose(losses_scan, losses_loop,
                                   rtol=1e-5, atol=1e-6)
