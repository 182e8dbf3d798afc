"""Global seeding (reference parity: utils/utils.py:45-70 set_seed).

JAX is deterministic by construction via threaded PRNG keys (SURVEY.md
§5.2), so the torch-deterministic/cuDNN knobs have no analog; this seeds the
host-side RNGs (numpy/python) used by planners and data tooling and returns
the root JAX key.
"""

from __future__ import annotations

import os
import random

import jax
import numpy as np


def set_seed(seed: int = 42, torch_deterministic: bool = False):
    """Seed python/numpy and return the root jax.random key.

    torch_deterministic is accepted for config parity; JAX programs are
    already bitwise-reproducible for a fixed key and compile.
    """
    if seed == -1:
        seed = np.random.randint(0, 10000)
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.PRNGKey(seed)
