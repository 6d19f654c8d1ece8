"""Multi-host initialization and mesh construction.

Single-chip and single-host-multi-chip runs need nothing beyond
``parallel.mesh``.  On a multi-host TPU slice, call ``init_distributed()``
once per process before any jax use: it wires ``jax.distributed`` over DCN
(coordinator discovery comes from the TPU runtime environment), after which
``jax.devices()`` is the GLOBAL device list and the same 1-D "dp" mesh from
``make_mesh`` spans the slice — env instances and their replay rows shard
across hosts, parameters replicate, and the DDQN gradient all-reduce rides
ICI within a slice / DCN across slices, all derived by GSPMD from the
sharding annotations in ``parallel.mesh.state_shardings``.

Per-host determinism on restore (SURVEY.md §5 failure-detection row): the
checkpointed ``AgentState`` is globally sharded; ``load_checkpoint``
restores into a template created with the same mesh, so every host
reconstructs exactly its own shard.
"""

from __future__ import annotations

from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (no-op when single-process).

    With no arguments, jax auto-detects the TPU pod runtime environment;
    explicit arguments support manual launches (e.g. CPU multi-process
    tests via ``jax.distributed`` local clusters).
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
