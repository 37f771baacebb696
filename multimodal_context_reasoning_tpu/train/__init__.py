"""Training / evaluation harness.

Rebuilds the reference's ``train()`` / ``eval()`` / ``test()`` loops
(run_PMR_ModCR.py:115-353) as one jitted SPMD step plus a thin host loop:
two-group AdamW with LR schedule, gradient accumulation, global-norm clip,
periodic validation with best-checkpoint saving, and Orbax-backed resume.
"""

from multimodal_context_reasoning_tpu.train.optim import (  # noqa: F401
    make_optimizer,
    make_schedule,
    label_params,
)
from multimodal_context_reasoning_tpu.train.state import TrainState  # noqa: F401
from multimodal_context_reasoning_tpu.train.step import (  # noqa: F401
    make_train_step,
    make_eval_step,
)
from multimodal_context_reasoning_tpu.train.trainer import Trainer  # noqa: F401
