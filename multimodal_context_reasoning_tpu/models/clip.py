"""Flax CLIP ViT-B/16 — image and text towers.

Rebuilds the frozen OpenAI CLIP the reference loads at import time
(run_PMR_ModCR.py:450, ``clip.load('ViT-B/16')``) and calls inside the
``clip_model`` / ``clip_model_r`` ablation forwards
(modeling_ensemble.py:804-806, 833-835: ``encode_image`` on pixel batches,
``encode_text`` on 77-token id batches).  With this module the CLIP
ensembles (models/clip_ensemble.py) run from pixels with no out-of-band
software; the production path still precomputes the frozen embeddings
offline (cli/precompute_clip.py) because a frozen tower's outputs are
features, not compute.

Architecture (pinned by the activation-parity test against the torch
transcription in interop/clip_torch.py, tests/test_clip.py):

- **Vision**: Conv(3→W, 16×16 stride 16, no bias) patchify → prepend a
  learned class embedding → add learned positional embeddings → ``ln_pre``
  → L pre-LN residual attention blocks → ``ln_post`` on the class token →
  ``proj`` [W, E] (no bias).
- **Text**: token embedding [49408, 512] → add positional embeddings →
  L causal pre-LN blocks → ``ln_final`` → take the hidden at each row's
  argmax token id (the EOT token has the highest id in CLIP's vocab) →
  ``text_projection`` [W, E].
- **Blocks**: pre-LN; fused QKV projection (one [W, 3W] matmul — the MXU
  formulation, and the exact layout of torch ``in_proj_weight``); QuickGELU
  ``x·σ(1.702x)`` MLP.
- Softmax in fp32 (ops/attention.py), causal mask additive −1e4 (the
  framework convention; e^{-1e4} underflows to 0 exactly like −inf).

TPU notes: everything is static-shape; 197/77-token sequences at width
768/512 run entirely in one fused XLA program.  Compute dtype comes from
``CLIPConfig.dtype`` (params stay fp32); the reference's fp16-features →
fp32-fusion cast point is reproduced downstream in clip_ensemble.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_context_reasoning_tpu.core.config import CLIPConfig
from multimodal_context_reasoning_tpu.ops.attention import dot_product_attention


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """OpenAI CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    """One pre-LN CLIP block: x += attn(ln_1(x)); x += mlp(ln_2(x))."""

    width: int
    heads: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,                      # [B, L, W]
        bias: Optional[jnp.ndarray] = None,  # broadcastable [B, H, L, L]
    ) -> jnp.ndarray:
        W, H = self.width, self.heads
        Dh = W // H
        B, L, _ = x.shape

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        qkv = nn.Dense(3 * W, dtype=self.dtype, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out, _ = dot_product_attention(
            q.reshape(B, L, H, Dh), k.reshape(B, L, H, Dh),
            v.reshape(B, L, H, Dh), bias,
        )
        x = x + nn.Dense(W, dtype=self.dtype, name="out_proj")(
            out.reshape(B, L, W))

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(4 * W, dtype=self.dtype, name="mlp_c_fc")(h)
        h = quick_gelu(h)
        x = x + nn.Dense(W, dtype=self.dtype, name="mlp_c_proj")(h)
        return x


class CLIPVisionTower(nn.Module):
    """ViT image encoder → [B, embed_dim] (OpenAI ``VisualTransformer``)."""

    config: CLIPConfig

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """pixels: [B, image_size, image_size, 3] NHWC, already normalized
        (data/clip_preprocess.py)."""
        c = self.config
        W, P, dt = c.vision_width, c.patch_size, c.jnp_dtype
        B = pixels.shape[0]
        G = c.grid_size

        x = nn.Conv(W, (P, P), strides=(P, P), use_bias=False, dtype=dt,
                    name="conv1")(pixels.astype(dt))       # [B, G, G, W]
        x = x.reshape(B, G * G, W)

        scale = W ** -0.5
        cls = self.param("class_embedding",
                         nn.initializers.normal(scale), (W,))
        pos = self.param("positional_embedding",
                         nn.initializers.normal(scale), (G * G + 1, W))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(dt)[None, None], (B, 1, W)), x],
            axis=1)
        x = x + pos.astype(dt)[None]

        x = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="ln_pre")(x)
        for i in range(c.vision_layers):
            x = ResidualAttentionBlock(W, c.vision_heads, dtype=dt,
                                       name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="ln_post")(x[:, 0])

        proj = self.param("proj", nn.initializers.normal(scale),
                          (W, c.embed_dim))
        return x @ proj.astype(dt)                         # [B, E]


class CLIPTextTower(nn.Module):
    """Causal text encoder → [B, embed_dim] (OpenAI ``encode_text``)."""

    config: CLIPConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """input_ids: [B, T] int32, T ≤ context_length, 0-padded after the
        EOT token (data/clip_tokenizer.py).  The pooled hidden is taken at
        argmax(ids) — EOT has the highest id, so 0-padding never wins."""
        c = self.config
        W, dt = c.text_width, c.jnp_dtype
        B, T = input_ids.shape

        x = nn.Embed(c.vocab_size, W,
                     embedding_init=nn.initializers.normal(0.02),
                     dtype=dt, name="token_embedding")(input_ids)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (c.context_length, W))
        x = x + pos.astype(dt)[None, :T]

        # Causal mask, additive −1e4 (framework convention; OpenAI fills
        # −inf — identical after fp32 softmax).
        causal = jnp.tril(jnp.ones((T, T), dtype=jnp.float32))
        bias = (1.0 - causal)[None, None] * -1e4

        for i in range(c.text_layers):
            x = ResidualAttentionBlock(W, c.text_heads, dtype=dt,
                                       name=f"block_{i}")(x, bias)
        x = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="ln_final")(x)

        eot = jnp.argmax(input_ids, axis=-1)               # [B]
        pooled = jnp.take_along_axis(
            x, eot[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        tproj = self.param("text_projection",
                           nn.initializers.normal(W ** -0.5),
                           (W, c.embed_dim))
        return pooled @ tproj.astype(dt)                   # [B, E]


class CLIP(nn.Module):
    """Both towers + temperature, with the OpenAI call surface.

    ``encode_image`` / ``encode_text`` match the reference's frozen-CLIP
    calls (modeling_ensemble.py:804-806); ``__call__`` returns the scaled
    cosine-similarity logit pair of OpenAI ``CLIP.forward``.
    """

    config: CLIPConfig

    def setup(self):
        self.visual = CLIPVisionTower(self.config)
        self.text = CLIPTextTower(self.config)
        # exp(logit_scale) is the temperature; OpenAI init ln(1/0.07).
        self.logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, jnp.log(1.0 / 0.07)), ())

    def encode_image(self, pixels: jnp.ndarray) -> jnp.ndarray:
        return self.visual(pixels)

    def encode_text(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        return self.text(input_ids)

    def __call__(
        self, pixels: jnp.ndarray, input_ids: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        img = self.encode_image(pixels)
        txt = self.encode_text(input_ids)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale).astype(img.dtype)
        logits_per_image = scale * img @ txt.T
        return logits_per_image, logits_per_image.T
