"""Reproducibility (reference common.py:84-93, replaces torch/cuda seeding).

JAX is deterministic by construction under jit with explicit PRNG keys; the
only global RNG we seed is numpy (host-side augmentation/shuffle draws) and
python's `random` (dataset shuffles).
"""

import random

import numpy as np


def setup_seed(seed=0, deterministic=True):
    random.seed(seed)
    np.random.seed(seed)
    del deterministic  # XLA/jit is deterministic; flag kept for API parity
    return seed
