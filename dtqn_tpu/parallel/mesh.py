"""Device-mesh data parallelism for the rollout+learn loop.

The reference is strictly single-process single-device (SURVEY.md §2.5).
Here scale-out is first-class and TPU-idiomatic: a 1-D ``Mesh`` over a "dp"
axis, env-indexed state sharded along its leading axis (envs, their replay
rows, contexts, bags, carries), parameters/optimizer replicated, and the
gradient all-reduce left to GSPMD — XLA inserts ``psum`` over ICI from the
sharding annotations alone, which is the collectives "backend" row of
SURVEY.md §5.

Replay rows are laid out env-major (env e owns rows [e*rpe, (e+1)*rpe)), so
sharding rows along "dp" keeps every env's writes device-local; only batch
sampling gathers across devices (uniform over all episodes, matching the
single-device semantics exactly).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dtqn_tpu.agents.base import Agent, AgentState
from dtqn_tpu.utils.epsilon import EpsilonSchedule


def make_mesh(num_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    n = num_devices or len(devices)
    return Mesh(np.asarray(devices[:n]).reshape(n), (axis,))


def state_shardings(agent: Agent, state: AgentState, mesh: Mesh):
    """NamedSharding pytree for an AgentState: env-indexed fields sharded on
    their leading axis over "dp", learner state replicated.

    Built structurally by field (not by shape matching — a hidden dim can
    coincide with the env count).
    """
    del agent
    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P("dp"))

    def rep(tree):
        return jax.tree_util.tree_map(lambda _: replicated, tree)

    def shard(tree):
        return jax.tree_util.tree_map(lambda _: sharded, tree)

    return state.replace(
        params=rep(state.params),
        target_params=rep(state.target_params),
        opt_state=rep(state.opt_state),
        buffer=state.buffer.replace(
            obs=sharded,
            action=sharded,
            reward=sharded,
            done=sharded,
            ep_len=sharded,
            ep_valid=sharded,
            write_pos=sharded,
            ep_count=sharded,
            flushed_total=replicated,
            bag_idx=sharded if state.buffer.bag_idx is not None else None,
            bag_act=sharded if state.buffer.bag_act is not None else None,
        ),
        context=shard(state.context),
        bag=shard(state.bag) if state.bag is not None else None,
        carry=shard(state.carry) if state.carry is not None else None,
        env_state=shard(state.env_state),
        obs=sharded,
        key=replicated,
        env_steps=replicated,
        train_steps=replicated,
        epsilon=replicated,
        diagnostics=rep(state.diagnostics),
        nonfinite_grads=replicated,
    )


def shard_state(agent: Agent, state: AgentState, mesh: Mesh) -> AgentState:
    """Place an AgentState onto the mesh per ``state_shardings``."""
    shardings = state_shardings(agent, state, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state, shardings
    )


def make_distributed_train_chunk(
    agent: Agent,
    eps_schedule: EpsilonSchedule,
    updates_per_iter: int,
    iters_per_chunk: int,
    mesh: Mesh,
    template_state: AgentState,
):
    """jit the train chunk with explicit in/out shardings over the mesh.

    GSPMD partitions the whole scan: env stepping and replay writes stay
    device-local; the DDQN gradient reduction becomes an all-reduce over
    "dp" derived from (sharded batch x replicated params).
    """
    from dtqn_tpu.train.loop import make_train_chunk_fn  # avoid cycle

    if agent.config.num_envs % mesh.devices.size:
        raise ValueError(
            f"num_envs {agent.config.num_envs} must divide the mesh size "
            f"{mesh.devices.size}"
        )

    shardings = state_shardings(agent, template_state, mesh)
    fn = make_train_chunk_fn(
        agent, eps_schedule, updates_per_iter, iters_per_chunk
    )
    return jax.jit(
        fn,
        in_shardings=(shardings,),
        out_shardings=shardings,
        donate_argnums=(0,),
    )
