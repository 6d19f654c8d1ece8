"""Host-side utilities: epsilon schedules, metrics, logging, checkpointing."""


def enable_persistent_compilation_cache(path: str = "/tmp/jax_cache") -> None:
    """Cache compiled XLA executables across processes.

    The jitted train chunk takes minutes to compile (remote compile on the
    axon platform); caching it makes reruns of the same config — resumes,
    repeated benches, seed sweeps — start in seconds.  Safe to call any
    time before the first compilation; shares the directory the test
    conftest uses (entries are keyed by backend + HLO, so CPU test entries
    and TPU run entries never collide).
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
