"""int8 W8A8 inference path (ops/quant.py).

No reference analogue (the reference is fp32 torch throughout) — this is a
TPU-first performance feature; the tests pin its numerics and its drop-in
param compatibility with nn.Dense.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestInt8Matmul:
    def test_quantize_roundtrip(self):
        from multimodal_context_reasoning_tpu.ops.quant import quantize_symmetric

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
        q, s = quantize_symmetric(x, axis=1)
        assert q.dtype == jnp.int8
        recon = np.asarray(q, np.float32) * np.asarray(s)
        err = np.abs(recon - np.asarray(x)).max()
        # max quantization error is scale/2 = amax/254 per row
        bound = (np.abs(np.asarray(x)).max(axis=1, keepdims=True) / 254.0)
        assert (np.abs(recon - np.asarray(x)) <= bound + 1e-7).all()
        assert err > 0  # it did quantize

    def test_zero_rows_are_safe(self):
        from multimodal_context_reasoning_tpu.ops.quant import int8_matmul

        x = jnp.zeros((4, 8))
        w = jnp.ones((8, 3))
        y = np.asarray(int8_matmul(x, w))
        assert np.all(y == 0) and np.all(np.isfinite(y))

    def test_matches_fp32_dense_within_quant_error(self):
        from multimodal_context_reasoning_tpu.ops.quant import int8_matmul

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
        w = jnp.asarray(
            (rng.normal(size=(128, 96)) / np.sqrt(128)).astype(np.float32)
        )
        b = jnp.asarray(rng.normal(size=(96,)).astype(np.float32))
        ref = np.asarray(x @ w + b)
        got = np.asarray(int8_matmul(x, w, b))
        # W8A8 with per-token/per-channel scales: ~1% relative error on
        # gaussian data
        denom = np.abs(ref).mean()
        assert np.abs(got - ref).mean() / denom < 0.02

    def test_quantdense_param_tree_matches_nn_dense(self):
        import flax.linen as nn

        from multimodal_context_reasoning_tpu.ops.quant import QuantDense

        x = jnp.ones((2, 8))
        pd = QuantDense(5).init(jax.random.PRNGKey(0), x)
        pn = nn.Dense(5).init(jax.random.PRNGKey(0), x)
        assert jax.tree.structure(pd) == jax.tree.structure(pn)
        shapes_d = jax.tree.map(lambda a: a.shape, pd)
        shapes_n = jax.tree.map(lambda a: a.shape, pn)
        assert shapes_d == shapes_n
        # same init stream → identical fp params: a checkpoint trained for
        # nn.Dense loads into QuantDense verbatim
        np.testing.assert_array_equal(
            np.asarray(pd["params"]["kernel"]), np.asarray(pn["params"]["kernel"])
        )


class TestQuantizedModel:
    def test_int8_forward_close_to_fp32(self):
        """Full tiny ModCR with quantize='int8': same params, finite logits,
        close to the fp32 forward (the three towers re-quantize per step)."""
        import sys

        sys.path.insert(0, "/root/repo/tests")
        from test_models import make_batch

        from multimodal_context_reasoning_tpu.core.config import ModCRConfig
        from multimodal_context_reasoning_tpu.models.modcr import ModCRModel

        cfg = ModCRConfig.tiny()
        batch = make_batch(cfg)
        model = ModCRModel(cfg)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
        fp = model.apply(params, batch, deterministic=True)

        qcfg = cfg.with_quantize("int8")
        qmodel = ModCRModel(qcfg)
        q = qmodel.apply(params, batch, deterministic=True)  # same params!

        fp_l = np.asarray(fp.logits)
        q_l = np.asarray(q.logits)
        assert np.all(np.isfinite(q_l))
        assert not np.array_equal(fp_l, q_l)  # it actually quantized
        # logits stay close enough that 4-way decisions are stable on
        # clearly-separated rows; assert a loose numeric envelope here
        assert np.abs(q_l - fp_l).max() < 0.25 * max(np.abs(fp_l).max(), 1.0)

    def test_quantize_config_roundtrips_json(self):
        from multimodal_context_reasoning_tpu.core.config import ModCRConfig

        cfg = ModCRConfig.tiny().with_quantize("int8")
        back = ModCRConfig.from_json(cfg.to_json())
        assert back.roberta.quantize == "int8"
        assert back.global_encoder.quantize == "int8"
