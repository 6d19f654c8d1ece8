"""Test harness configuration.

Tests run on CPU with 8 fake XLA devices so the multi-chip sharding paths
(mesh + pjit + psum) are exercised in CI without TPU hardware — the standard
JAX trick (SURVEY.md §4).  Must run before the first ``import jax``.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
