"""Host-side utilities: epsilon schedules, metrics, logging, checkpointing."""

import os


def enable_persistent_compilation_cache(path: str = "") -> None:
    """Cache compiled XLA executables across processes.

    The jitted train chunk takes minutes to compile (remote compile on the
    axon platform); caching it makes reruns of the same config — resumes,
    repeated benches, seed sweeps — start in seconds.  Safe to call any
    time before the first compilation.

    Respects an already-configured cache: if ``JAX_COMPILATION_CACHE_DIR``
    is set in the environment or ``jax_compilation_cache_dir`` was already
    updated, this is a no-op.  The default location is per-user
    (``~/.cache/jax``), not a predictable world-writable /tmp path.
    """
    import jax

    configured = os.environ.get("JAX_COMPILATION_CACHE_DIR") or getattr(
        jax.config, "jax_compilation_cache_dir", None
    )
    if not path and configured:
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )
        return
    path = path or os.path.join(os.path.expanduser("~"), ".cache", "jax")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
