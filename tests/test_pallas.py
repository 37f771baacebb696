"""Pallas fused-attention kernel vs the einsum reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_context_reasoning_tpu.ops.attention import dot_product_attention
from multimodal_context_reasoning_tpu.ops.pallas_attention import fused_attention


@pytest.mark.parametrize("B,Lq,Lk,H,Dh", [
    (2, 130, 130, 4, 64),    # ModCR encoder shape (text+img = 130)
    (1, 138, 148, 2, 64),    # prefix-roberta shape (10 prefix KV slots)
    (2, 8, 16, 2, 32),       # tiny unaligned
])
def test_matches_reference(B, Lq, Lk, H, Dh):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, Lq, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Lk, H, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Lk, H, Dh)), jnp.float32)
    # random padding bias on keys
    keep = rng.random((B, Lk)) > 0.2
    keep[:, 0] = True
    bias = jnp.asarray(
        np.where(keep, 0.0, -10000.0)[:, None, None, :], jnp.float32
    )
    want, _ = dot_product_attention(q, k, v, bias)
    got = fused_attention(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_fully_masked_rows_are_finite():
    """A query row whose keys are all masked must not NaN (uniform attn)."""
    B, L, H, Dh = 1, 8, 1, 32
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, L, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, H, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, H, Dh)), jnp.float32)
    bias = jnp.full((B, 1, L, L), -10000.0)
    got = fused_attention(q, k, v, bias, interpret=True)
    assert np.isfinite(np.asarray(got)).all()
