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

__version__ = "0.3.0"

from multimodal_context_reasoning_tpu.core.config import (  # noqa: F401
    EncoderConfig,
    ChunkAlignConfig,
    RobertaConfig,
    ModCRConfig,
)
from multimodal_context_reasoning_tpu.models.gpt2 import GPT2Decoder, KVCache  # noqa: F401
from multimodal_context_reasoning_tpu.models.rationale import (  # noqa: F401
    RationaleModel,
    binary_to_mp,
)
from multimodal_context_reasoning_tpu.models.ensemble import (  # noqa: F401
    CandidateEnsemble,
    DualEnsembleModel,
    VoteEnsemble,
)
from multimodal_context_reasoning_tpu.generation.api import generate  # noqa: F401
from multimodal_context_reasoning_tpu.parallel.mesh import make_mesh  # noqa: F401
from multimodal_context_reasoning_tpu.train.trainer import Trainer  # noqa: F401
from multimodal_context_reasoning_tpu.train.step import (  # noqa: F401
    make_eval_step,
    make_train_step,
)
from multimodal_context_reasoning_tpu.data.feature_store import (  # noqa: F401
    FeatureStore,
    write_pack,
)
