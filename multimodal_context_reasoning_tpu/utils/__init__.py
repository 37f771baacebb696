"""Logging, metrics, and profiling utilities."""

from multimodal_context_reasoning_tpu.utils.logging import setup_logger  # noqa: F401
from multimodal_context_reasoning_tpu.utils.metrics import (  # noqa: F401
    MetricLogger,
    SmoothedValue,
)
from multimodal_context_reasoning_tpu.utils.misc import mkdir, set_seed  # noqa: F401
from multimodal_context_reasoning_tpu.utils.profiling import (  # noqa: F401
    StepTimer,
    trace,
)
