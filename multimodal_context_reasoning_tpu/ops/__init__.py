from multimodal_context_reasoning_tpu.ops.masks import (  # noqa: F401
    NEG_INF,
    padding_bias,
    build_stage_biases,
)
from multimodal_context_reasoning_tpu.ops.chunk import (  # noqa: F401
    chunk_mean_scatter,
    chunk_mask_from_gather_index,
)
from multimodal_context_reasoning_tpu.ops.attention import (  # noqa: F401
    dot_product_attention,
)
from multimodal_context_reasoning_tpu.ops.quant import (  # noqa: F401
    QuantDense,
    int8_matmul,
    quantize_symmetric,
)
