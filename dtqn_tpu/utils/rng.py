"""Seeding helpers.

The reference seeds five RNG streams — python ``random``, a global PCG64
generator, numpy legacy, torch CPU and torch CUDA — plus every env and its
spaces (`/root/reference/utils/random.py:13-31`).  In JAX the entire
framework consumes one threaded PRNG key (checkpointed inside
``AgentState``), so seeding collapses to deriving that key; host-side numpy
and python RNGs are seeded too for any host-side tooling (logging sampling,
test fixtures).
"""

from __future__ import annotations

import os
import random

import jax
import numpy as np


def seed_everything(seed: int) -> jax.Array:
    """Seed host RNGs and return the root JAX key for the experiment."""
    random.seed(seed)
    np.random.seed(seed % (2**32 - 1))
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.key(seed)
