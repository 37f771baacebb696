"""Torch shim for the reference's MISSING prefix-RoBERTa blob.

The reference imports ``RobertaModel`` from a vendored ``local_transformers``
("adapter_transformers") fork that is absent from the repo
(`.MISSING_LARGE_BLOBS:1`); its forward accepts ``prompt_embeddings=`` and
``input_mask=`` kwargs (only call site: modeling/modeling_ensemble.py:501-503)
and its ``outputs[1]`` is the pooled CLS.

This module implements that contract in PyTorch with the SAME reconstruction
this framework uses for ``models/roberta.py::PrefixRoberta`` — per-layer KV
prepend: every attention layer projects the raw prefix vectors through its own
key/value weights and prepends them to the token K/V stream (the vendored
BERT's ``history_state`` mechanism, a_transformers modeling_bert.py
``BertSelfAttention``).  Its purpose is to let the parity suite instantiate
the reference's LITERAL ``Abstract_Specific`` (modeling_ensemble.py:424-539)
end-to-end and compare logits/losses against ``ModCRModel``
(tests/test_reference_parity.py::TestCompositeParity) — pinning the
mapping-network reshape, the vision‖alignment concat order, the prefix
masking, the pooler choice, and the scorer, which were previously validated
only piecewise.

State-dict layout is HF-RoBERTa (``embeddings.…``, ``encoder.layer.N.…``,
``pooler.dense``) so ``interop/torch_bridge.py::convert_roberta`` consumes it
unchanged.

Numerics mirror the framework exactly: additive ``(1-mask)·(-10000)`` bias
(the reference's convention, modeling_transfomres.py:648-653), scores scaled
by 1/sqrt(head_dim), fp32 softmax, tanh-approximated GELU (the framework's
``ACT['gelu']``), RoBERTa position ids ``cumsum(non-pad)·mask + pad_id``.
"""

from __future__ import annotations

import dataclasses
import math

import torch
import torch.nn as nn
import torch.nn.functional as F


@dataclasses.dataclass
class PrefixRobertaTorchConfig:
    vocab_size: int = 50265
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    max_position_embeddings: int = 514
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1


class _Embeddings(nn.Module):
    def __init__(self, c: PrefixRobertaTorchConfig):
        super().__init__()
        self.word_embeddings = nn.Embedding(c.vocab_size, c.hidden_size)
        self.position_embeddings = nn.Embedding(
            c.max_position_embeddings, c.hidden_size)
        self.token_type_embeddings = nn.Embedding(
            c.type_vocab_size, c.hidden_size)
        self.LayerNorm = nn.LayerNorm(c.hidden_size, eps=c.layer_norm_eps)
        self.dropout = nn.Dropout(c.hidden_dropout_prob)
        self.pad_token_id = c.pad_token_id

    def forward(self, input_ids, token_type_ids):
        mask = (input_ids != self.pad_token_id).long()
        position_ids = torch.cumsum(mask, dim=1) * mask + self.pad_token_id
        if token_type_ids is None:
            token_type_ids = torch.zeros_like(input_ids)
        x = (self.word_embeddings(input_ids)
             + self.position_embeddings(position_ids)
             + self.token_type_embeddings(token_type_ids))
        return self.dropout(self.LayerNorm(x))


class _SelfAttention(nn.Module):
    def __init__(self, c: PrefixRobertaTorchConfig):
        super().__init__()
        self.query = nn.Linear(c.hidden_size, c.hidden_size)
        self.key = nn.Linear(c.hidden_size, c.hidden_size)
        self.value = nn.Linear(c.hidden_size, c.hidden_size)
        self.num_heads = c.num_attention_heads
        self.head_dim = c.hidden_size // c.num_attention_heads
        self.dropout = nn.Dropout(c.attention_probs_dropout_prob)

    def forward(self, hidden, bias, prefix):
        B, L, D = hidden.shape
        q = self.query(hidden)
        kv_src = hidden if prefix is None else torch.cat([prefix, hidden], 1)
        k = self.key(kv_src)
        v = self.value(kv_src)
        Lk = kv_src.shape[1]
        q = q.view(B, L, self.num_heads, self.head_dim).transpose(1, 2)
        k = k.view(B, Lk, self.num_heads, self.head_dim).transpose(1, 2)
        v = v.view(B, Lk, self.num_heads, self.head_dim).transpose(1, 2)
        scores = torch.matmul(q, k.transpose(-1, -2)) / math.sqrt(self.head_dim)
        probs = torch.softmax(scores + bias, dim=-1)
        out = torch.matmul(self.dropout(probs), v)
        return out.transpose(1, 2).reshape(B, L, D)


class _AttnOutput(nn.Module):
    def __init__(self, c: PrefixRobertaTorchConfig):
        super().__init__()
        self.dense = nn.Linear(c.hidden_size, c.hidden_size)
        self.LayerNorm = nn.LayerNorm(c.hidden_size, eps=c.layer_norm_eps)
        self.dropout = nn.Dropout(c.hidden_dropout_prob)

    def forward(self, x, residual):
        return self.LayerNorm(self.dropout(self.dense(x)) + residual)


class _Attention(nn.Module):
    def __init__(self, c: PrefixRobertaTorchConfig):
        super().__init__()
        self.self = _SelfAttention(c)
        self.output = _AttnOutput(c)

    def forward(self, hidden, bias, prefix):
        return self.output(self.self(hidden, bias, prefix), hidden)


class _Intermediate(nn.Module):
    def __init__(self, c: PrefixRobertaTorchConfig):
        super().__init__()
        self.dense = nn.Linear(c.hidden_size, c.intermediate_size)

    def forward(self, x):
        return F.gelu(self.dense(x), approximate="tanh")


class _Output(nn.Module):
    def __init__(self, c: PrefixRobertaTorchConfig):
        super().__init__()
        self.dense = nn.Linear(c.intermediate_size, c.hidden_size)
        self.LayerNorm = nn.LayerNorm(c.hidden_size, eps=c.layer_norm_eps)
        self.dropout = nn.Dropout(c.hidden_dropout_prob)

    def forward(self, x, residual):
        return self.LayerNorm(self.dropout(self.dense(x)) + residual)


class _Layer(nn.Module):
    def __init__(self, c: PrefixRobertaTorchConfig):
        super().__init__()
        self.attention = _Attention(c)
        self.intermediate = _Intermediate(c)
        self.output = _Output(c)

    def forward(self, hidden, bias, prefix):
        h = self.attention(hidden, bias, prefix)
        return self.output(self.intermediate(h), h)


class _Encoder(nn.Module):
    def __init__(self, c: PrefixRobertaTorchConfig):
        super().__init__()
        self.layer = nn.ModuleList(
            [_Layer(c) for _ in range(c.num_hidden_layers)])

    def forward(self, hidden, bias, prefix):
        for layer in self.layer:
            hidden = layer(hidden, bias, prefix)
        return hidden


class _Pooler(nn.Module):
    def __init__(self, c: PrefixRobertaTorchConfig):
        super().__init__()
        self.dense = nn.Linear(c.hidden_size, c.hidden_size)

    def forward(self, hidden):
        return torch.tanh(self.dense(hidden[:, 0]))


class PrefixRobertaTorch(nn.Module):
    """Drop-in for the missing blob's ``RobertaModel`` at its one call site."""

    def __init__(self, config: PrefixRobertaTorchConfig):
        super().__init__()
        self.config = config
        self.embeddings = _Embeddings(config)
        self.encoder = _Encoder(config)
        self.pooler = _Pooler(config)

    def forward(self, input_ids=None, token_type_ids=None,
                attention_mask=None, prompt_embeddings=None, input_mask=None):
        if attention_mask is None:
            attention_mask = torch.ones_like(input_ids, dtype=torch.float32)
        token_bias = (1.0 - attention_mask.float()) * -10000.0
        if prompt_embeddings is not None:
            if input_mask is None:
                input_mask = torch.ones(
                    prompt_embeddings.shape[:2],
                    dtype=torch.float32, device=prompt_embeddings.device)
            prefix_bias = (1.0 - input_mask.float()) * -10000.0
            bias = torch.cat([prefix_bias, token_bias], dim=-1)
        else:
            bias = token_bias
        bias = bias[:, None, None, :]
        h = self.embeddings(input_ids, token_type_ids)
        h = self.encoder(h, bias, prompt_embeddings)
        return h, self.pooler(h)
