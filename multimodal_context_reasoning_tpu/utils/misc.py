"""Misc helpers (utils/misc.py in the reference)."""

from __future__ import annotations

import errno
import os
import random

import numpy as np


def mkdir(path: str) -> None:
    """mkdir -p (utils/misc.py:13-19)."""
    try:
        os.makedirs(path)
    except OSError as e:
        if e.errno != errno.EEXIST:
            raise


def set_seed(seed: int) -> "np.random.Generator":
    """Seed host-side RNGs and return a fresh numpy Generator.

    The reference also seeds CUDA (utils/misc.py:21-27); device-side
    randomness here flows exclusively through explicit jax.random keys, so
    only host RNGs need seeding.
    """
    random.seed(seed)
    np.random.seed(seed)
    return np.random.default_rng(seed)
