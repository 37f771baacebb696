from multimodal_context_reasoning_tpu.models.layers import (  # noqa: F401
    BertEmbeddings,
    TransformerLayer,
    Pooler,
)
from multimodal_context_reasoning_tpu.models.encoders import (  # noqa: F401
    GlobalImageEncoder,
    ChunkAlignEncoder,
)
from multimodal_context_reasoning_tpu.models.fusion import ChunkAlignFusion  # noqa: F401
from multimodal_context_reasoning_tpu.models.roberta import PrefixRoberta  # noqa: F401
from multimodal_context_reasoning_tpu.models.modcr import ModCRModel, ModCROutput  # noqa: F401
from multimodal_context_reasoning_tpu.models.clip import (  # noqa: F401
    CLIP,
    CLIPTextTower,
    CLIPVisionTower,
)
from multimodal_context_reasoning_tpu.models.clip_ensemble import (  # noqa: F401
    ClipEndToEnd,
    ClipGatedEnsemble,
    ClipOnlyModel,
    ClipSimilarityFusion,
)
from multimodal_context_reasoning_tpu.models.rationale import (  # noqa: F401
    RationaleForTraining,
    RationaleModel,
)
