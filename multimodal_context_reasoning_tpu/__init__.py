"""TPU-native ModCR framework (JAX / Flax / pjit / Pallas).

A brand-new implementation of the capabilities of
YunxinLi/Multimodal-Context-Reasoning (ModCR, ACL 2023): multimodal 4-way
multiple-choice reasoning over pre-extracted image region features plus a
textual premise, built from

- a frozen Oscar-style "global" region-feature encoder,
- a chunk-aligned (phrase-structured, staged-attention-mask) sequence encoder,
- a RoBERTa-large reasoner conditioned via learned vision + alignment
  prefix vectors injected into its attention KV path,

with a jitted/pjit-able train+eval harness, a static-shape data pipeline, a
GPT-2 cross-attention rationale generator with constrained beam sampling, and
checkpoint interop with the reference's HuggingFace/PyTorch weights.

The reference layout this package mirrors (capability-wise, not structurally)
is documented in /root/repo/SURVEY.md.
"""

__version__ = "0.1.0"

from multimodal_context_reasoning_tpu.core.config import (  # noqa: F401
    EncoderConfig,
    ChunkAlignConfig,
    RobertaConfig,
    ModCRConfig,
)
