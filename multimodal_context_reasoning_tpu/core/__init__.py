from multimodal_context_reasoning_tpu.core.config import (  # noqa: F401
    EncoderConfig,
    ChunkAlignConfig,
    RobertaConfig,
    ModCRConfig,
    TrainConfig,
)
