"""Test harness configuration.

Tests run on CPU with 8 fake XLA devices so the multi-chip sharding paths
(mesh + pjit + psum) are exercised in CI without TPU hardware — the standard
JAX trick (SURVEY.md §4).  Must run before the first ``import jax``.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU platform and overrides
# JAX_PLATFORMS; pin tests to CPU explicitly AFTER import (before any
# backend initialization) or every eager op round-trips the TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# This host has 2 cores; XLA CPU compiles of scanned train loops are the
# dominant test cost. The persistent cache makes reruns near-instant.
# Single source of truth for the cache path lives in dtqn_tpu.utils.
from dtqn_tpu.utils import enable_persistent_compilation_cache  # noqa: E402

enable_persistent_compilation_cache()
