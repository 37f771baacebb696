"""Memory-efficient (flash-style) attention: recompute-in-backward.

The single-chip training ceiling of this framework is HBM, not FLOPs:
a batch-48 PMR train step OOMs at 20.25/15.75 GB with the largest
allocations being the fp32 attention temporaries of the 24 RoBERTa
reasoner layers at [192 rows, 16 heads, 128, 138] — ~217 MB *per layer*
of softmax scores/probabilities kept alive for the backward pass
(BENCHMARKS.md "Batch-size headroom"; the attention itself rebuilds the
reference's modeling_vcr_chunkalign_v10.py:45-107 per-layer chain).

``mem_efficient_attention`` removes that residual class entirely with a
``jax.custom_vjp``:

- forward: the same fp32-softmax chain as ops.attention
  (bit-identical numerics, including the dropout mask — the same
  ``jax.random.bernoulli(rng, shape)`` draw), but the ONLY residuals
  saved are the O(L·D) inputs ``(q, k, v, bias, rng)``.
- backward: scores, probabilities and the dropout mask are *recomputed*
  (rng replay gives the identical mask), then the standard attention
  backward runs:

      dV = Pᵀ·dO,  dP = dO·Vᵀ,
      dS = P ∘ (dP − Σₖ dP∘P)        (softmax VJP)
      dQ = dS·K·scale,  dK = dSᵀ·Q·scale,  dBias = Σ_broadcast dS

  The [B, H, Lq, Lk] arrays exist only transiently inside one layer's
  backward — XLA frees them before the next layer's backward runs — so
  the peak is ~1 layer's worth instead of ``num_layers`` worth.

This is the "recompute scores in the bwd" half of FlashAttention.  The
streaming/online-softmax half is pointless in this regime: ModCR
sequences are ≤190 tokens, so a whole [Lq, Lk] tile fits VMEM and a
single-pass kernel is optimal (see ops/pallas_attention.py, and
``flash_attention_bwd_pallas`` below for the fused-backward variant that
keeps the recomputed tile in VMEM on the no-dropout path).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _forward(q, k, v, bias, rng, *, dropout_rate: float, probs_dtype):
    """The exact ops.attention.dot_product_attention chain (fwd only)."""
    head_dim = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, dtype=jnp.float32))
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(probs_dtype) * scale
    if bias is not None:
        scores = scores + bias.astype(probs_dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    attn = probs
    if dropout_rate > 0.0:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, probs.shape)
        attn = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(v.dtype), v)
    return out, probs, attn


def _reduce_to_bias(d4, bias):
    """Sum a full [B, H|1, Lq, Lk] gradient down to ``bias``'s shape."""
    reduce_axes = tuple(
        ax for ax in range(4) if bias.shape[ax] == 1 and d4.shape[ax] != 1
    )
    out = jnp.sum(d4, axis=reduce_axes, keepdims=True) if reduce_axes else d4
    return out.astype(bias.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _mea(q, k, v, bias, rng, dropout_rate, probs_dtype, impl):
    out, _, _ = _forward(q, k, v, bias, rng,
                         dropout_rate=dropout_rate, probs_dtype=probs_dtype)
    return out


def _mea_fwd(q, k, v, bias, rng, dropout_rate, probs_dtype, impl):
    out, _, _ = _forward(q, k, v, bias, rng,
                         dropout_rate=dropout_rate, probs_dtype=probs_dtype)
    # O(L·D) residuals only — the whole point.
    return out, (q, k, v, bias, rng)


def _mea_bwd(dropout_rate, probs_dtype, impl, res, d_out):
    q, k, v, bias, rng = res

    head_shared = bias is None or bias.shape[1] == 1
    use_pallas = impl == "pallas" or (
        impl == "auto" and dropout_rate == 0.0 and head_shared
        and jax.default_backend() == "tpu"
    )
    if use_pallas:
        if dropout_rate > 0.0 or not head_shared:
            raise ValueError(
                "pallas flash backward supports the no-dropout, "
                "head-shared-bias regime only")
        d_q, d_k, d_v, dbias_plane = flash_attention_bwd_pallas(
            q, k, v, bias, d_out,
            interpret=jax.default_backend() == "cpu")
        d_bias = None
        if bias is not None:
            d_bias = _reduce_to_bias(dbias_plane[:, None], bias)
        return (d_q, d_k, d_v, d_bias, None)

    _, probs, attn = _forward(q, k, v, bias, rng,
                              dropout_rate=dropout_rate,
                              probs_dtype=probs_dtype)
    head_dim = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, dtype=jnp.float32))

    # out = attn.astype(v.dtype) @ v   (einsum "bhqk,bkhd->bqhd")
    d_attn = jnp.einsum("bqhd,bkhd->bhqk", d_out, v).astype(probs_dtype)
    d_v = jnp.einsum("bhqk,bqhd->bkhd", attn.astype(d_out.dtype), d_out)

    if dropout_rate > 0.0:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, probs.shape)
        d_probs = jnp.where(keep, d_attn / (1.0 - dropout_rate), 0.0)
    else:
        d_probs = d_attn

    # softmax VJP: dS = P ∘ (dP − Σ_k dP∘P)
    d_scores = probs * (d_probs - jnp.sum(d_probs * probs, axis=-1, keepdims=True))

    d_bias = None
    if bias is not None:
        d_bias = _reduce_to_bias(d_scores, bias)

    d_scores = d_scores * scale
    d_q = jnp.einsum("bhqk,bkhd->bqhd", d_scores.astype(k.dtype), k).astype(q.dtype)
    d_k = jnp.einsum("bhqk,bqhd->bkhd", d_scores.astype(q.dtype), q).astype(k.dtype)

    return (d_q, d_k, d_v.astype(v.dtype), d_bias, None)


_mea.defvjp(_mea_fwd, _mea_bwd)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, *, scale: float):
    """One batch element, all heads: recompute scores/probs in VMEM and
    produce dq/dk/dv (+ the head-summed dbias plane) — the per-head
    [Lq, Lk] tile never exists in HBM.

    Head loop is unrolled (H 2-D matmuls): Mosaic rejects strided per-head
    slices as 3-D operands (same constraint as the forward _spec_kernel).
    """
    q_all = q_ref[0]                               # [H, Lq, Dh]
    k_all = k_ref[0]                               # [H, Lk, Dh]
    v_all = v_ref[0]
    do_all = do_ref[0]
    bias = bias_ref[0].astype(jnp.float32)         # [Lq, Lk]
    n_heads = q_all.shape[0]
    dbias_acc = jnp.zeros(bias.shape, jnp.float32)
    for h in range(n_heads):
        q, k, v, do = q_all[h], k_all[h], v_all[h], do_all[h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias                           # [Lq, Lk] fp32
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)

        # dv = pᵀ · do
        dv_ref[0, h] = jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        # dp = do · vᵀ
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                          # [Lq, Lk] fp32
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dbias_acc = dbias_acc + ds                 # pre-scale: dS/dbias = 1
        ds = ds * scale
        dq_ref[0, h] = jnp.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype)
        dk_ref[0, h] = jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)
    dbias_ref[0] = dbias_acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention_bwd_pallas(
    q: jnp.ndarray,            # [B, Lq, H, Dh]
    k: jnp.ndarray,            # [B, Lk, H, Dh]
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],  # [B or 1, 1, Lq or 1, Lk] head-shared
    d_out: jnp.ndarray,        # [B, Lq, H, Dh]
    *,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused attention backward: returns (dq, dk, dv, dbias_plane
    [B, Lq, Lk]); the recomputed per-head [Lq, Lk] score tile lives only
    in VMEM.  No-dropout, head-shared-bias regime (every mask in this
    framework)."""
    from jax.experimental import pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu
        mem = dict(memory_space=pltpu.VMEM)
    except Exception:  # pragma: no cover
        mem = {}
    if interpret or jax.default_backend() == "cpu":
        mem = {}

    B, Lq, H, Dh = q.shape
    Lk = k.shape[1]
    scale = 1.0 / (Dh ** 0.5)
    if bias is None:
        bias_p = jnp.zeros((B, Lq, Lk), jnp.float32)
    else:
        if bias.shape[1] != 1:
            raise ValueError("flash bwd requires head-shared bias")
        bias_p = jnp.broadcast_to(bias[:, 0], (B, Lq, Lk)).astype(jnp.float32)

    qp = q.transpose(0, 2, 1, 3)
    kp = k.transpose(0, 2, 1, 3)
    vp = v.transpose(0, 2, 1, 3)
    dop = d_out.transpose(0, 2, 1, 3)

    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Lq, Dh), q.dtype),
            jax.ShapeDtypeStruct((B, H, Lk, Dh), k.dtype),
            jax.ShapeDtypeStruct((B, H, Lk, Dh), v.dtype),
            jax.ShapeDtypeStruct((B, Lq, Lk), jnp.float32),
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, Lq, Dh), lambda b: (b, 0, 0, 0), **mem),
            pl.BlockSpec((1, H, Lk, Dh), lambda b: (b, 0, 0, 0), **mem),
            pl.BlockSpec((1, H, Lk, Dh), lambda b: (b, 0, 0, 0), **mem),
            pl.BlockSpec((1, Lq, Lk), lambda b: (b, 0, 0), **mem),
            pl.BlockSpec((1, H, Lq, Dh), lambda b: (b, 0, 0, 0), **mem),
        ],
        out_specs=(
            pl.BlockSpec((1, H, Lq, Dh), lambda b: (b, 0, 0, 0), **mem),
            pl.BlockSpec((1, H, Lk, Dh), lambda b: (b, 0, 0, 0), **mem),
            pl.BlockSpec((1, H, Lk, Dh), lambda b: (b, 0, 0, 0), **mem),
            pl.BlockSpec((1, Lq, Lk), lambda b: (b, 0, 0), **mem),
        ),
        interpret=interpret,
    )(qp, kp, vp, bias_p, dop)

    return (dq.transpose(0, 2, 1, 3), dk.transpose(0, 2, 1, 3),
            dv.transpose(0, 2, 1, 3), dbias)


def mem_efficient_attention(
    q: jnp.ndarray,            # [B, Lq, H, Dh]
    k: jnp.ndarray,            # [B, Lk, H, Dh]
    v: jnp.ndarray,            # [B, Lk, H, Dh]
    bias: Optional[jnp.ndarray] = None,   # broadcastable to [B, H, Lq, Lk]
    *,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    probs_dtype=jnp.float32,
    impl: str = "auto",
) -> jnp.ndarray:
    """Drop-in for ops.attention.dot_product_attention (no-probs path)
    whose backward never holds per-layer [B, H, Lq, Lk] residuals.

    Forward numerics are bit-identical to dot_product_attention — same
    einsum/softmax/bernoulli sequence, same rng draw.  Gradients are the
    analytically identical VJP, recomputed from the saved inputs.

    ``impl`` selects the backward: "jnp" recomputes via XLA (any dropout,
    any bias); "pallas" uses the fused VMEM-resident kernel (no-dropout,
    head-shared bias — the eval/frozen-tower regime); "auto" picks pallas
    on TPU when its constraints hold, jnp otherwise.
    """
    rate = float(dropout_rate) if not deterministic else 0.0
    if rate > 0.0 and dropout_rng is None:
        raise ValueError("dropout_rate > 0 requires dropout_rng")
    rng = dropout_rng if dropout_rng is not None else jax.random.PRNGKey(0)
    return _mea(q, k, v, bias, rng, rate, probs_dtype, impl)
