"""Torch transcription of OpenAI CLIP (ViT family) for the parity suite.

The reference depends on the external ``clip`` package
(run_PMR_ModCR.py:27,450) which is not vendored in its repo; this module
reconstructs the two towers its ablations call
(``encode_image``/``encode_text``, modeling_ensemble.py:804-806,833-835)
in plain PyTorch, with a state-dict layout identical to OpenAI's published
checkpoints (``visual.conv1.weight``, ``…resblocks.N.attn.in_proj_weight``,
``token_embedding.weight``, ``text_projection``, ``logit_scale``, …).

Purpose — same pattern as interop/prefix_roberta_torch.py: random-init this
model, bridge its state dict through ``torch_bridge.convert_clip``, and
assert the Flax towers (models/clip.py) produce the same activations
(tests/test_clip.py).  Because the layout matches OpenAI's, the same bridge
then consumes real ViT-B/16 checkpoints unchanged.

Numerics: fp32 throughout (the parity baseline); attention is
``nn.MultiheadAttention`` exactly as OpenAI's ``ResidualAttentionBlock``
uses it; QuickGELU activation; pre-LN blocks; causal mask additive −1e4 to
mirror the framework convention (OpenAI fills −inf — identical post-softmax
in fp32).
"""

from __future__ import annotations

from collections import OrderedDict

import torch
import torch.nn as nn

from multimodal_context_reasoning_tpu.core.config import CLIPConfig


class QuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    def __init__(self, d_model: int, n_head: int,
                 attn_mask: torch.Tensor = None):
        super().__init__()
        self.attn = nn.MultiheadAttention(d_model, n_head)
        self.ln_1 = nn.LayerNorm(d_model, eps=1e-5)
        self.mlp = nn.Sequential(OrderedDict([
            ("c_fc", nn.Linear(d_model, 4 * d_model)),
            ("gelu", QuickGELU()),
            ("c_proj", nn.Linear(4 * d_model, d_model)),
        ]))
        self.ln_2 = nn.LayerNorm(d_model, eps=1e-5)
        self.attn_mask = attn_mask

    def forward(self, x):                      # x: [L, B, W] (seq-first)
        mask = None
        if self.attn_mask is not None:
            L = x.shape[0]
            mask = self.attn_mask[:L, :L].to(dtype=x.dtype, device=x.device)
        x = x + self.attn(self.ln_1(x), self.ln_1(x), self.ln_1(x),
                          need_weights=False, attn_mask=mask)[0]
        x = x + self.mlp(self.ln_2(x))
        return x


class Transformer(nn.Module):
    def __init__(self, width: int, layers: int, heads: int,
                 attn_mask: torch.Tensor = None):
        super().__init__()
        self.resblocks = nn.Sequential(*[
            ResidualAttentionBlock(width, heads, attn_mask)
            for _ in range(layers)
        ])

    def forward(self, x):
        return self.resblocks(x)


class VisionTransformer(nn.Module):
    def __init__(self, input_resolution: int, patch_size: int, width: int,
                 layers: int, heads: int, output_dim: int):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, kernel_size=patch_size,
                               stride=patch_size, bias=False)
        scale = width ** -0.5
        grid = input_resolution // patch_size
        self.class_embedding = nn.Parameter(scale * torch.randn(width))
        self.positional_embedding = nn.Parameter(
            scale * torch.randn(grid * grid + 1, width))
        self.ln_pre = nn.LayerNorm(width, eps=1e-5)
        self.transformer = Transformer(width, layers, heads)
        self.ln_post = nn.LayerNorm(width, eps=1e-5)
        self.proj = nn.Parameter(scale * torch.randn(width, output_dim))

    def forward(self, x):                      # x: [B, 3, R, R] NCHW
        x = self.conv1(x)                      # [B, W, G, G]
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        cls = self.class_embedding.to(x.dtype).expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1)
        x = x + self.positional_embedding.to(x.dtype)
        x = self.ln_pre(x)
        x = self.transformer(x.permute(1, 0, 2)).permute(1, 0, 2)
        x = self.ln_post(x[:, 0, :])
        return x @ self.proj


class CLIPTorch(nn.Module):
    """OpenAI-layout CLIP: ``visual.*`` + text stack at the top level."""

    def __init__(self, c: CLIPConfig):
        super().__init__()
        self.config = c
        self.visual = VisionTransformer(
            c.image_size, c.patch_size, c.vision_width, c.vision_layers,
            c.vision_heads, c.embed_dim)
        mask = torch.full((c.context_length, c.context_length), -1e4)
        mask.triu_(1)
        self.transformer = Transformer(c.text_width, c.text_layers,
                                       c.text_heads, attn_mask=mask)
        self.token_embedding = nn.Embedding(c.vocab_size, c.text_width)
        self.positional_embedding = nn.Parameter(
            0.01 * torch.randn(c.context_length, c.text_width))
        self.ln_final = nn.LayerNorm(c.text_width, eps=1e-5)
        self.text_projection = nn.Parameter(
            c.text_width ** -0.5 * torch.randn(c.text_width, c.embed_dim))
        self.logit_scale = nn.Parameter(
            torch.tensor(float(torch.log(torch.tensor(1.0 / 0.07)))))
        nn.init.normal_(self.token_embedding.weight, std=0.02)

    def encode_image(self, image):
        return self.visual(image)

    def encode_text(self, text):               # text: [B, T] int64
        c = self.config
        x = self.token_embedding(text)
        x = x + self.positional_embedding[: text.shape[1]]
        x = self.transformer(x.permute(1, 0, 2)).permute(1, 0, 2)
        x = self.ln_final(x)
        x = x[torch.arange(x.shape[0]), text.argmax(dim=-1)]
        return x @ self.text_projection

    def forward(self, image, text):
        img = self.encode_image(image)
        txt = self.encode_text(text)
        img = img / img.norm(dim=-1, keepdim=True)
        txt = txt / txt.norm(dim=-1, keepdim=True)
        scale = self.logit_scale.exp()
        logits_per_image = scale * img @ txt.t()
        return logits_per_image, logits_per_image.t()
