"""SPMD parallelism over a TPU device mesh.

Replaces the reference's entire (vestigial) distributed surface — the NCCL
env-init dance (run_PMR_ModCR.py:403-448) and the orphaned Horovod
allreduce/broadcast/allgather helpers (utils/distributed.py:16-209) — with a
``jax.sharding.Mesh`` + ``NamedSharding`` program: data parallelism shards
the flattened candidate batch over the ``data`` axis, optional tensor
parallelism shards the RoBERTa-large matmuls over ``model``, and XLA compiles
the gradient psum / activation collectives onto ICI.
"""

from multimodal_context_reasoning_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    mesh_shape_for,
)
from multimodal_context_reasoning_tpu.parallel.partition import (  # noqa: F401
    batch_shardings,
    param_shardings,
    PARAM_RULES,
)
from multimodal_context_reasoning_tpu.parallel.multihost import (  # noqa: F401
    global_batch,
)
