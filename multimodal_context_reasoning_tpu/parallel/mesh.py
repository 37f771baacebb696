"""Device-mesh construction.

The mesh axes are ``("data", "model")``: gradients are psum-reduced over
``data``; ``model`` shards the reasoner's attention heads and FFN.  On a
single chip both axes are 1 and the program degenerates to the plain jitted
step with zero collectives — same code path throughout.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def mesh_shape_for(
    num_devices: int, model_parallelism: int = 1
) -> Tuple[int, int]:
    """(data, model) factorization of ``num_devices``."""
    if num_devices % model_parallelism != 0:
        raise ValueError(
            f"{num_devices} devices not divisible by model_parallelism="
            f"{model_parallelism}"
        )
    return num_devices // model_parallelism, model_parallelism


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    *,
    model_parallelism: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("data", "model") mesh over the available devices.

    With ``shape=None`` every visible device goes to the data axis except
    for ``model_parallelism``-way tensor sharding.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = mesh_shape_for(len(devices), model_parallelism)
    d, m = shape
    if d * m != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(d, m)
    return Mesh(arr, axis_names=("data", "model"))
