"""Dynamic W8A8 int8 matmul path for inference.

TPU-first performance feature with no reference analogue (the reference is
fp32 torch on GPU/CPU throughout): the v5e MXU executes int8×int8→int32
matmuls at 394.5 TOPS — 2× its bf16 peak — so the big projection/FFN
matmuls in the three frozen towers can run through int8 with dynamic
per-token activation scales and per-channel weight scales (the standard
"SmoothQuant-free" W8A8 recipe for BERT-family encoders).

Design:

- **Params stay fp32/bf16** — :class:`QuantDense` declares the exact same
  ``kernel``/``bias`` tree as ``nn.Dense``, so checkpoints, the torch
  bridge, and the partitioning rules are untouched; quantization happens
  inside the jitted graph.  The per-step weight-quantize cost is
  O(in·out) — three orders of magnitude below the matmul's O(rows·in·out)
  at production batch sizes.
- **Symmetric scales**: weights per-output-channel, activations per-token
  (dynamic).  No calibration pass needed.
- **Inference-only**: ``round`` has zero gradient; the trainer never
  enables it (``quantize="none"`` default).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def quantize_symmetric(x: jnp.ndarray, axis) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization along ``axis`` (reduced away in scale).

    Returns ``(q, scale)`` with ``x ≈ q.astype(f32) * scale`` and
    ``q`` in [-127, 127].  All-zero slices get scale 1 (q = 0).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_matmul(
    x: jnp.ndarray,          # [..., IN] float
    kernel: jnp.ndarray,     # [IN, OUT] float
    bias: Optional[jnp.ndarray] = None,   # [OUT]
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """x @ kernel with both sides dynamically quantized to int8.

    The int32 accumulator is rescaled by (per-token activation scale ×
    per-channel weight scale) in fp32, then cast to ``out_dtype``.
    """
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    xq, xs = quantize_symmetric(x2, axis=1)       # [R, IN], [R, 1]
    wq, ws = quantize_symmetric(kernel, axis=0)   # [IN, OUT], [1, OUT]
    acc = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * xs * ws
    if bias is not None:
        y = y + bias.astype(jnp.float32)[None]
    return y.astype(out_dtype).reshape(*shape[:-1], kernel.shape[1])


class QuantDense(nn.Module):
    """Drop-in ``nn.Dense`` with the int8 compute path.

    Identical parameter tree (``kernel`` [in, out], ``bias`` [out], same
    initializers) — swapping ``nn.Dense`` ↔ ``QuantDense`` changes only the
    compiled compute, never the checkpoint.
    """

    features: int
    use_bias: bool = True
    dtype: object = None
    kernel_init: object = nn.initializers.lecun_normal()
    bias_init: object = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features)
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,))
            if self.use_bias else None
        )
        out_dtype = self.dtype or x.dtype
        return int8_matmul(x, kernel, bias, out_dtype=out_dtype)
