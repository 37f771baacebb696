"""Memory-efficient (recompute-in-backward) attention: ops/flash.py.

The contract under test: ``mem_efficient_attention`` is a drop-in for
``ops.attention.dot_product_attention`` (the chain rebuilt from
modeling_vcr_chunkalign_v10.py:83-100) whose forward is bit-identical —
same einsum/softmax/bernoulli sequence, same rng draw — and whose
hand-written VJP matches autodiff of the einsum path to numerical
tolerance, while saving only O(L·D) residuals.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_context_reasoning_tpu.ops.attention import dot_product_attention
from multimodal_context_reasoning_tpu.ops.flash import mem_efficient_attention


def _qkvb(key, B=2, Lq=9, Lk=13, H=4, Dh=8, dtype=jnp.float32, with_bias=True):
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (B, Lq, H, Dh), dtype)
    k = jax.random.normal(ks[1], (B, Lk, H, Dh), dtype)
    v = jax.random.normal(ks[2], (B, Lk, H, Dh), dtype)
    bias = None
    if with_bias:
        # head-shared padding-style bias, as every mask in the framework
        valid = jax.random.bernoulli(ks[3], 0.8, (B, Lk))
        bias = jnp.where(valid, 0.0, -1e9)[:, None, None, :].astype(jnp.float32)
    return q, k, v, bias


class TestForwardIdentity:
    def test_no_dropout_bitexact(self):
        q, k, v, bias = _qkvb(jax.random.PRNGKey(0))
        ref, _ = dot_product_attention(q, k, v, bias)
        got = mem_efficient_attention(q, k, v, bias)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_dropout_bitexact_same_rng(self):
        q, k, v, bias = _qkvb(jax.random.PRNGKey(1))
        rng = jax.random.PRNGKey(42)
        ref, _ = dot_product_attention(
            q, k, v, bias, dropout_rate=0.1, dropout_rng=rng,
            deterministic=False)
        got = mem_efficient_attention(
            q, k, v, bias, dropout_rate=0.1, dropout_rng=rng,
            deterministic=False)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_no_bias(self):
        q, k, v, _ = _qkvb(jax.random.PRNGKey(2), with_bias=False)
        ref, _ = dot_product_attention(q, k, v, None)
        got = mem_efficient_attention(q, k, v, None)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


class TestGradEquivalence:
    @pytest.mark.parametrize("dropout", [0.0, 0.3])
    def test_grads_match_autodiff(self, dropout):
        q, k, v, bias = _qkvb(jax.random.PRNGKey(3))
        rng = jax.random.PRNGKey(7)
        cot = jax.random.normal(jax.random.PRNGKey(9), q.shape)
        det = dropout == 0.0

        def loss_ref(q, k, v, bias):
            out, _ = dot_product_attention(
                q, k, v, bias, dropout_rate=dropout, dropout_rng=rng,
                deterministic=det)
            return jnp.sum(out * cot)

        def loss_mea(q, k, v, bias):
            out = mem_efficient_attention(
                q, k, v, bias, dropout_rate=dropout, dropout_rng=rng,
                deterministic=det)
            return jnp.sum(out * cot)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g_mea = jax.grad(loss_mea, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for a, b, name in zip(g_ref, g_mea, "qkv bias".split()):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5,
                err_msg=f"grad mismatch for {name}")

    def test_grads_match_bf16(self):
        q, k, v, bias = _qkvb(jax.random.PRNGKey(4), dtype=jnp.bfloat16)
        cot = jax.random.normal(jax.random.PRNGKey(5), q.shape, jnp.bfloat16)

        def mk(fn):
            def loss(q, k, v):
                out = fn(q, k, v)
                return jnp.sum(out.astype(jnp.float32) * cot.astype(jnp.float32))
            return jax.grad(loss, argnums=(0, 1, 2))

        g_ref = mk(lambda q, k, v: dot_product_attention(q, k, v, bias)[0])(q, k, v)
        g_mea = mk(lambda q, k, v: mem_efficient_attention(q, k, v, bias))(q, k, v)
        for a, b in zip(g_ref, g_mea):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=2e-2, atol=2e-2)

    def test_bias_broadcast_lq_dim(self):
        # a [B, 1, Lq, Lk] bias (stage-mask shape) gets a correctly-reduced grad
        q, k, v, _ = _qkvb(jax.random.PRNGKey(6), with_bias=False)
        B, Lq, Lk = q.shape[0], q.shape[1], k.shape[1]
        bias = jax.random.normal(jax.random.PRNGKey(8), (B, 1, Lq, Lk))

        def loss(fn, bias):
            return jnp.sum(fn(q, k, v, bias) ** 2)

        g_ref = jax.grad(lambda b: loss(
            lambda *a: dot_product_attention(*a)[0], b))(bias)
        g_mea = jax.grad(lambda b: loss(
            lambda *a: mem_efficient_attention(*a), b))(bias)
        assert g_mea.shape == bias.shape
        np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_mea),
                                   rtol=2e-5, atol=2e-5)


class TestResidualFootprint:
    def test_no_quadratic_residuals(self):
        """The saved residuals between fwd and bwd must be O(L·D): no
        [B, H, Lq, Lk]-shaped array may appear in the linearized jaxpr's
        constants (that is the OOM class this op exists to kill)."""
        q, k, v, bias = _qkvb(jax.random.PRNGKey(10), Lq=32, Lk=40)
        B, H = q.shape[0], q.shape[2]
        Lq, Lk = q.shape[1], k.shape[1]

        def f(q, k, v):
            return jnp.sum(mem_efficient_attention(q, k, v, bias) ** 2)

        # residuals of the VJP = consts of the transposed jaxpr
        _, vjp = jax.vjp(f, q, k, v)
        quad = [
            x.shape for x in jax.tree_util.tree_leaves(vjp)
            if hasattr(x, "shape") and (B, H, Lq, Lk) == tuple(x.shape)
        ]
        assert quad == [], f"quadratic residuals saved: {quad}"

    def test_einsum_path_does_save_quadratic(self):
        """Sanity: the plain path DOES save [B,H,Lq,Lk] residuals —
        proving the previous test measures the right thing."""
        q, k, v, bias = _qkvb(jax.random.PRNGKey(10), Lq=32, Lk=40)
        B, H = q.shape[0], q.shape[2]
        Lq, Lk = q.shape[1], k.shape[1]

        def f(q, k, v):
            out, _ = dot_product_attention(q, k, v, bias)
            return jnp.sum(out ** 2)

        _, vjp = jax.vjp(f, q, k, v)
        quad = [
            x for x in jax.tree_util.tree_leaves(vjp)
            if hasattr(x, "shape") and (B, H, Lq, Lk) == tuple(x.shape)
        ]
        assert quad, "expected the einsum path to save quadratic residuals"


class TestModelIntegration:
    def test_roberta_tower_grads_match(self):
        """PrefixRoberta with mem_efficient_attention on vs off: identical
        loss and near-identical grads through 2 layers with dropout active
        (same rng stream => same masks)."""
        from multimodal_context_reasoning_tpu.core.config import RobertaConfig
        from multimodal_context_reasoning_tpu.models.roberta import PrefixRoberta

        def run(mea: bool):
            cfg = RobertaConfig(
                vocab_size=128, hidden_size=32, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=64,
                max_position_embeddings=64, mem_efficient_attention=mea)
            model = PrefixRoberta(cfg)
            ids = jnp.array([[5, 6, 7, 8, 1, 1], [9, 10, 11, 12, 13, 1]],
                            dtype=jnp.int32)
            mask = (ids != 1).astype(jnp.int32)
            prefix = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 32))
            params = model.init(jax.random.PRNGKey(0), ids, mask,
                                prompt_embeddings=prefix)

            def loss(p):
                out = model.apply(
                    p, ids, mask, prompt_embeddings=prefix,
                    deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
                return jnp.sum(out.pooled ** 2)

            return jax.value_and_grad(loss)(params)

        (l0, g0), (l1, g1) = run(False), run(True)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        flat0 = jax.tree_util.tree_leaves(g0)
        flat1 = jax.tree_util.tree_leaves(g1)
        for a, b in zip(flat0, flat1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-5)

    def test_modcr_train_trajectory_matches(self):
        """Full ModCR train steps with the flash backward on vs off: the
        loss trajectory matches at tolerance (same data, rngs, optimizer).
        This is the production composition — trainable mapping nets feed
        prefix vectors into the rematted 24-layer (here 2-layer) RoBERTa
        reasoner, with attention dropout active."""
        import dataclasses

        from multimodal_context_reasoning_tpu.core.config import (
            ModCRConfig, TrainConfig,
        )
        from multimodal_context_reasoning_tpu.models.modcr import ModCRModel
        from multimodal_context_reasoning_tpu.train.optim import make_optimizer
        from multimodal_context_reasoning_tpu.train.state import TrainState
        from multimodal_context_reasoning_tpu.train.step import make_train_step
        from tests.test_models import make_batch

        def trajectory(mea: bool):
            base = ModCRConfig.tiny()
            cfg = dataclasses.replace(
                base,
                roberta=dataclasses.replace(
                    base.roberta, mem_efficient_attention=mea,
                    attention_probs_dropout_prob=0.1, remat=True),
            )
            model = ModCRModel(cfg)
            batch = make_batch(cfg)
            params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
            tcfg = TrainConfig(learning_rate=1e-3, scheduler="constant",
                               weight_decay=0.0, per_device_batch_size=4)
            tx = make_optimizer(tcfg, total_steps=10, params=params)
            state = TrainState.create(params, tx)
            step = make_train_step(model, donate=False)
            losses = []
            for i in range(4):
                state, metrics = step(state, batch, jax.random.PRNGKey(100 + i))
                losses.append(float(metrics["loss"]))
            return losses

        ref, mea = trajectory(False), trajectory(True)
        np.testing.assert_allclose(ref, mea, rtol=1e-4, atol=1e-5)


class TestPallasBackward:
    """The fused VMEM-resident backward (impl="pallas", interpret mode on
    CPU) must match the jnp recompute backward exactly in semantics."""

    @pytest.mark.parametrize("with_bias", [True, False])
    def test_matches_jnp_backward(self, with_bias):
        q, k, v, bias = _qkvb(jax.random.PRNGKey(20), with_bias=with_bias)
        cot = jax.random.normal(jax.random.PRNGKey(21), q.shape)

        def mk(impl):
            def loss(q, k, v, bias):
                out = mem_efficient_attention(q, k, v, bias, impl=impl)
                return jnp.sum(out * cot)
            return jax.grad(loss, argnums=(0, 1, 2) + ((3,) if with_bias else ()))

        g_jnp = mk("jnp")(q, k, v, bias)
        g_pal = mk("pallas")(q, k, v, bias)
        for a, b in zip(g_jnp, g_pal):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5)

    def test_bias_grad_reduces_to_padding_shape(self):
        # [B,1,1,Lk] padding bias — the trainable reasoner's exact shape
        q, k, v, bias = _qkvb(jax.random.PRNGKey(22))
        g = jax.grad(
            lambda b: jnp.sum(
                mem_efficient_attention(q, k, v, b, impl="pallas") ** 2)
        )(bias)
        g_ref = jax.grad(
            lambda b: jnp.sum(
                mem_efficient_attention(q, k, v, b, impl="jnp") ** 2)
        )(bias)
        assert g.shape == bias.shape
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=2e-5, atol=2e-5)

    def test_pallas_rejects_dropout(self):
        q, k, v, bias = _qkvb(jax.random.PRNGKey(23))
        with pytest.raises(ValueError):
            jax.grad(lambda x: jnp.sum(mem_efficient_attention(
                x, k, v, bias, dropout_rate=0.1,
                dropout_rng=jax.random.PRNGKey(0), deterministic=False,
                impl="pallas")))(q)
