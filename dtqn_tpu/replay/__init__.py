"""On-device replay: episode-major ring buffer, rolling Context, Bag."""

from dtqn_tpu.replay.buffer import (
    Batch,
    BufferState,
    can_sample,
    flush,
    init_buffer,
    sample,
    sample_with_bag,
    sample_with_stored_bag,
    store_act_bag,
    store_first_obs,
    store_step,
)
from dtqn_tpu.replay.context import (
    ContextState,
    add_transition,
    init_context,
    reset_context,
)
from dtqn_tpu.replay.bag import BagState, bag_add, init_bag, reset_bag

__all__ = [
    "Batch",
    "BufferState",
    "ContextState",
    "BagState",
    "init_buffer",
    "store_first_obs",
    "store_step",
    "flush",
    "can_sample",
    "sample",
    "sample_with_bag",
    "sample_with_stored_bag",
    "store_act_bag",
    "init_context",
    "reset_context",
    "add_transition",
    "init_bag",
    "reset_bag",
    "bag_add",
]
