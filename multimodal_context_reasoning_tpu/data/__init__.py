from multimodal_context_reasoning_tpu.data.collate import (  # noqa: F401
    BatchSpec,
    collate_candidates,
    pad_to,
)
from multimodal_context_reasoning_tpu.data.pmr import (  # noqa: F401
    PMRDataset,
    load_pmr_jsonl,
)
from multimodal_context_reasoning_tpu.data.vcr import VCRDataset, load_vcr_json  # noqa: F401
from multimodal_context_reasoning_tpu.data.loader import DataLoader  # noqa: F401
from multimodal_context_reasoning_tpu.data.clip_tokenizer import ClipTokenizer  # noqa: F401
from multimodal_context_reasoning_tpu.data.clip_preprocess import (  # noqa: F401
    preprocess_image,
    preprocess_images,
)
