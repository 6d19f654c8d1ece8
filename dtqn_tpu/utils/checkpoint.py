"""Two-tier checkpoint / resume protocol.

Parity with the reference (`/root/reference/dtqn/agents/dqn.py:212-327`,
`run.py:471-490`):
  1. *Mini checkpoint*: ``{step, wandb_id}`` sentinel written on completion
     (dqn.py:212-220) — JSON here.
  2. *Full checkpoint*: the COMPLETE training state — network/target/optimizer
     state, the entire replay buffer, contexts/bags/carries, counters,
     epsilon, result + loss running averages, and RNG state (dqn.py:222-275).
     The reference juggles five RNG streams (python/np/torch/cuda +
     PCG64); the JAX single-key design collapses that into the one key
     already inside ``AgentState``.
  3. Plain policy weights every 50k steps under ``--save-policy``
     (run.py:337-338).

Serialization is flax msgpack over a host-fetched pytree; restore requires a
template state with identical structure (same config), matching the
reference's requirement that the checkpoint be loaded by an identically-
configured run.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization


def _is_key(x) -> bool:
    return hasattr(x, "dtype") and jax.dtypes.issubdtype(
        x.dtype, jax.dtypes.prng_key
    )


def _unwrap_keys(tree):
    """Typed PRNG keys aren't msgpack-serializable; store their raw data."""
    return jax.tree_util.tree_map(
        lambda x: jax.random.key_data(x) if _is_key(x) else x, tree
    )


def _rewrap_keys(tree, template):
    return jax.tree_util.tree_map(
        lambda x, t: jax.random.wrap_key_data(x) if _is_key(t) else x,
        tree,
        template,
    )


def save_mini_checkpoint(path: str, step: int, wandb_id: Optional[str]) -> None:
    with open(path + "_mini_checkpoint.json", "w") as f:
        json.dump({"step": step, "wandb_id": wandb_id}, f)


def load_mini_checkpoint(path: str) -> Optional[Dict[str, Any]]:
    mini = path + "_mini_checkpoint.json"
    if not os.path.exists(mini):
        return None
    with open(mini) as f:
        return json.load(f)


def save_checkpoint(
    path: str,
    state: Any,
    *,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    """Full checkpoint: AgentState pytree + host-side extras (eval running
    averages, epsilon is inside the state)."""
    host_state = jax.device_get(_unwrap_keys(state))
    with open(path + "_checkpoint.msgpack", "wb") as f:
        f.write(serialization.to_bytes(host_state))
    with open(path + "_checkpoint_extra.json", "w") as f:
        json.dump(extra or {}, f)


def has_checkpoint(path: str) -> bool:
    return os.path.exists(path + "_checkpoint.msgpack")


def load_checkpoint(path: str, template_state: Any) -> Tuple[Any, Dict[str, Any]]:
    """Restore a full checkpoint into the structure of ``template_state``."""
    with open(path + "_checkpoint.msgpack", "rb") as f:
        state = serialization.from_bytes(
            _unwrap_keys(template_state), f.read()
        )
    state = _rewrap_keys(state, template_state)
    extra_path = path + "_checkpoint_extra.json"
    extra: Dict[str, Any] = {}
    if os.path.exists(extra_path):
        with open(extra_path) as f:
            extra = json.load(f)
    return state, extra


def save_policy(path: str, params: Any) -> None:
    """Policy-weights-only snapshot (run.py:337-338)."""
    with open(path + "_policy.msgpack", "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))


def load_policy(path: str, template_params: Any) -> Any:
    with open(path + "_policy.msgpack", "rb") as f:
        return serialization.from_bytes(template_params, f.read())
