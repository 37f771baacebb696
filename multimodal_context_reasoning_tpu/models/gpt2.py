"""GPT-2 decoder with cross-attention, KV-cached for jitted decode.

Capability parity with the vendored GPT-2
(modeling/modeling_transfomres.py:266-968): pre-LN blocks, causal
self-attention, optional per-block cross-attention over an encoder memory,
tied-embedding LM head.  Differences by design (TPU-first):

- The reference caches KV as dynamically growing per-step tensors
  (``past`` tuples, modeling_transfomres.py:830-840); here the cache is a
  *static* ``[B, L_max, H, Dh]`` buffer per layer written with
  ``dynamic_update_slice`` so the whole decode loop compiles once
  (lax.scan over steps, see generation/decode.py).
- The reference stores fused qkv as Conv1D ``[in, 3*out]`` weights; we keep
  three plain Dense kernels (the torch bridge splits + transposes,
  interop/torch_bridge.py).
- Naive layer-wise ``model_parallel``/``device_map`` placement
  (modeling_transfomres.py:894-950) is replaced by the mesh partitioning
  rules in parallel/partition.py.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_context_reasoning_tpu.core.config import GPT2Config
from multimodal_context_reasoning_tpu.models.layers import ACT
from multimodal_context_reasoning_tpu.ops.attention import dot_product_attention
from multimodal_context_reasoning_tpu.ops.masks import NEG_INF


class KVCache(NamedTuple):
    """Static decode cache: one [B, L_max, H, Dh] pair per layer."""

    k: jnp.ndarray  # [n_layer, B, L_max, H, Dh]
    v: jnp.ndarray

    @classmethod
    def zeros(cls, cfg: GPT2Config, batch: int, max_len: int, dtype=jnp.float32):
        shape = (cfg.n_layer, batch, max_len, cfg.n_head, cfg.head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


class GPT2SelfAttention(nn.Module):
    """Causal self-attention with optional static KV cache."""

    config: GPT2Config

    @nn.compact
    def __call__(
        self,
        hidden: jnp.ndarray,                 # [B, L, D]
        *,
        cache_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,  # [B, Lc, H, Dh]
        cache_index: Optional[jnp.ndarray] = None,   # scalar int32: write offset
        cache_valid: Optional[jnp.ndarray] = None,   # [B, Lc] {0,1}: readable
        attn_mask: Optional[jnp.ndarray] = None,     # [B, L] {0,1} over inputs
        deterministic: bool = True,
    ):
        c = self.config
        B, L, D = hidden.shape
        H, Dh = c.n_head, c.head_dim

        q = nn.Dense(D, name="q")(hidden).reshape(B, L, H, Dh)
        k = nn.Dense(D, name="k")(hidden).reshape(B, L, H, Dh)
        v = nn.Dense(D, name="v")(hidden).reshape(B, L, H, Dh)

        if cache_kv is not None:
            ck, cv = cache_kv
            Lc = ck.shape[1]
            ck = jax.lax.dynamic_update_slice(ck, k, (0, cache_index, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v, (0, cache_index, 0, 0))
            # causal-by-position mask over the full cache
            pos = jnp.arange(Lc)[None, :]                       # [1, Lc]
            valid = pos <= (cache_index + jnp.arange(L))[:, None]  # [L, Lc]
            bias = jnp.where(valid, 0.0, NEG_INF)[None, None]   # [1, 1, L, Lc]
            if cache_valid is not None:
                # kill right-padded prompt slots: their K/V were written into
                # the cache and would otherwise be attended by every later
                # token (the positional mask alone cannot see padding)
                bias = bias + ((1.0 - cache_valid.astype(jnp.float32))
                               * NEG_INF)[:, None, None, :]
            out, _ = dot_product_attention(q, ck, cv, bias,
                                           deterministic=deterministic)
            new_cache = (ck, cv)
        else:
            causal = jnp.tril(jnp.ones((L, L), bool))
            bias = jnp.where(causal, 0.0, NEG_INF)[None, None]
            if attn_mask is not None:
                bias = bias + ((1.0 - attn_mask) * NEG_INF)[:, None, None, :]
            rng = None
            if not deterministic and c.attn_pdrop > 0:
                rng = self.make_rng("dropout")
            out, _ = dot_product_attention(
                q, k, v, bias,
                dropout_rate=c.attn_pdrop, dropout_rng=rng,
                deterministic=deterministic,
            )
            new_cache = None

        out = nn.Dense(D, name="out")(out.reshape(B, L, D))
        out = nn.Dropout(c.resid_pdrop)(out, deterministic=deterministic)
        return out, new_cache


class GPT2CrossAttention(nn.Module):
    """Cross-attention over an encoder memory (is_cross_attention branch,
    modeling_transfomres.py:300-320)."""

    config: GPT2Config

    @nn.compact
    def __call__(
        self,
        hidden: jnp.ndarray,            # [B, L, D]
        memory: jnp.ndarray,            # [B, M, Dm]
        memory_mask: Optional[jnp.ndarray] = None,  # [B, M]
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        c = self.config
        B, L, D = hidden.shape
        M = memory.shape[1]
        H, Dh = c.n_head, c.head_dim

        q = nn.Dense(D, name="q")(hidden).reshape(B, L, H, Dh)
        k = nn.Dense(D, name="k")(memory).reshape(B, M, H, Dh)
        v = nn.Dense(D, name="v")(memory).reshape(B, M, H, Dh)
        bias = None
        if memory_mask is not None:
            bias = ((1.0 - memory_mask.astype(jnp.float32)) * NEG_INF)[:, None, None, :]
        out, _ = dot_product_attention(q, k, v, bias, deterministic=deterministic)
        out = nn.Dense(D, name="out")(out.reshape(B, L, D))
        return nn.Dropout(c.resid_pdrop)(out, deterministic=deterministic)


class GPT2Block(nn.Module):
    """Pre-LN block: ln1→self-attn→res, [ln_cross→cross-attn→res,] ln2→MLP→res
    (modeling_transfomres.py:405-469)."""

    config: GPT2Config

    @nn.compact
    def __call__(
        self,
        hidden: jnp.ndarray,
        *,
        memory: Optional[jnp.ndarray] = None,
        memory_mask: Optional[jnp.ndarray] = None,
        cache_kv=None,
        cache_index=None,
        cache_valid=None,
        attn_mask=None,
        deterministic: bool = True,
    ):
        c = self.config
        h = nn.LayerNorm(epsilon=c.layer_norm_epsilon, name="ln_1")(hidden)
        attn, new_cache = GPT2SelfAttention(c, name="attn")(
            h, cache_kv=cache_kv, cache_index=cache_index,
            cache_valid=cache_valid,
            attn_mask=attn_mask, deterministic=deterministic,
        )
        hidden = hidden + attn
        if c.add_cross_attention and memory is not None:
            h = nn.LayerNorm(epsilon=c.layer_norm_epsilon, name="ln_cross")(hidden)
            hidden = hidden + GPT2CrossAttention(c, name="crossattention")(
                h, memory, memory_mask, deterministic=deterministic
            )
        h = nn.LayerNorm(epsilon=c.layer_norm_epsilon, name="ln_2")(hidden)
        h = nn.Dense(c.inner_dim, name="mlp_c_fc")(h)
        h = ACT[c.activation_function](h)
        h = nn.Dense(c.n_embd, name="mlp_c_proj")(h)
        h = nn.Dropout(c.resid_pdrop)(h, deterministic=deterministic)
        return hidden + h, new_cache


class GPT2Decoder(nn.Module):
    """GPT-2 LM with cross-attention and tied-embedding head."""

    config: GPT2Config

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,          # [B, L]
        *,
        position_offset: Optional[jnp.ndarray] = None,  # scalar for decode
        memory: Optional[jnp.ndarray] = None,
        memory_mask: Optional[jnp.ndarray] = None,
        cache: Optional[KVCache] = None,
        cache_index: Optional[jnp.ndarray] = None,
        cache_valid: Optional[jnp.ndarray] = None,   # [B, L_cache] {0,1}
        attn_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        output_hidden: bool = False,
    ):
        c = self.config
        B, L = input_ids.shape
        wte = nn.Embed(c.vocab_size, c.n_embd,
                       embedding_init=nn.initializers.normal(c.initializer_range),
                       name="wte")
        wpe = nn.Embed(c.n_positions, c.n_embd,
                       embedding_init=nn.initializers.normal(c.initializer_range),
                       name="wpe")
        pos = jnp.arange(L, dtype=jnp.int32)[None]
        if position_offset is not None:
            # Accept a scalar or a per-example [B] offset.  A [B] offset must
            # broadcast per-ROW ([B, 1]): naked `pos + offset` would produce
            # [1, B] and cross every example with every offset, silently
            # blowing hiddens up to [B, B, D] when L == 1.
            off = jnp.asarray(position_offset, jnp.int32)
            pos = pos + (off[:, None] if off.ndim == 1 else off)
        h = wte(input_ids) + wpe(pos)
        h = nn.Dropout(c.embd_pdrop)(h, deterministic=deterministic)

        new_k = []
        new_v = []
        for i in range(c.n_layer):
            layer_cache = None
            if cache is not None:
                layer_cache = (cache.k[i], cache.v[i])
            h, updated = GPT2Block(c, name=f"block_{i}")(
                h,
                memory=memory, memory_mask=memory_mask,
                cache_kv=layer_cache, cache_index=cache_index,
                cache_valid=cache_valid,
                attn_mask=attn_mask, deterministic=deterministic,
            )
            if updated is not None:
                new_k.append(updated[0])
                new_v.append(updated[1])
        h = nn.LayerNorm(epsilon=c.layer_norm_epsilon, name="ln_f")(h)
        if c.tie_word_embeddings:
            logits = wte.attend(h)       # tied LM head (HF GPT-2)
        else:
            # untied head of the reference's rationale family (v10.py:1335)
            logits = nn.Dense(
                c.vocab_size, use_bias=False,
                kernel_init=nn.initializers.normal(c.initializer_range),
                name="lm_head",
            )(h)
        new_cache = (
            KVCache(jnp.stack(new_k), jnp.stack(new_v)) if new_k else None
        )
        if output_hidden:
            # final-LN hidden states — the "GPT2Model" view the ensemble
            # ablations consume (modeling_ensemble.py:268-273 reads
            # gpt_output[0] before any LM head)
            return logits, new_cache, h
        return logits, new_cache
