"""Checkpoint interop with the reference's PyTorch/HuggingFace weights."""

from multimodal_context_reasoning_tpu.interop.torch_bridge import (  # noqa: F401
    convert_bert_encoder,
    convert_clip,
    convert_gpt2,
    convert_roberta,
    delete_keys_matching,
    resize_token_embeddings,
    strip_prefix,
)
