"""Online inference serving (no reference analogue — production surface)."""

from multimodal_context_reasoning_tpu.serving.aot import (  # noqa: F401
    AOTGenerator,
    AOTScorer,
    save_generator_artifact,
    save_scorer_artifact,
)
from multimodal_context_reasoning_tpu.serving.batcher import (  # noqa: F401
    MicroBatcher,
)
from multimodal_context_reasoning_tpu.serving.generator import (  # noqa: F401
    RationaleGenerator,
)
from multimodal_context_reasoning_tpu.serving.scorer import ModCRScorer  # noqa: F401
from multimodal_context_reasoning_tpu.serving.server import serve  # noqa: F401
