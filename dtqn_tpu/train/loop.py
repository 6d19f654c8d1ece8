"""Jitted rollout + learn loop, prepopulation, and evaluation.

The reference's hot loop (`/root/reference/run.py:246-405`) interleaves a
single serial env step, a host->device forward for acting, a host numpy
buffer store, and one gradient step per env step — crossing the host/device
boundary every timestep (SURVEY.md §3.2).  Here one jitted ``train_chunk``
scans over iterations entirely on device: E vectorized envs step in
lockstep, transitions land in the HBM ring buffer, and ``updates_per_iter``
gradient steps run per iteration (default keeps the reference's 1 update
per env step: updates_per_iter == num_envs).

Evaluation (`run.py:187-243`) becomes ``eval_episodes`` parallel episodes
under one jitted scan with a done-latch instead of a serial Python loop.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dtqn_tpu import replay
from dtqn_tpu.agents.base import Agent, AgentState
from dtqn_tpu.envs.core import Environment
from dtqn_tpu.models import zero_carry
from dtqn_tpu.utils.epsilon import EpsilonSchedule


def env_step(
    agent: Agent,
    state: AgentState,
    key: jax.Array,
    random_only: bool = False,
    count_steps: bool = True,
) -> AgentState:
    """One vectorized env step: act, step, observe, reset bookkeeping
    (run.py:356-377 + 293-296).

    ``count_steps=False`` leaves ``env_steps`` untouched: prepopulation
    stores experience without consuming training budget (the reference's
    50k random steps precede, not count into, the 2M-step loop,
    run.py:290,380-405).
    """
    cfg = agent.config
    k_act, k_env, k_reset = jax.random.split(key, 3)

    if random_only:
        # Prepopulation uses uniformly random actions (run.py:380-405).
        actions = jax.random.randint(
            k_act, (cfg.num_envs,), 0, agent.env.num_actions
        )
        carry = state.carry
    else:
        actions, carry = agent.select_actions(state, k_act, state.epsilon)

    obs, env_state, ts = agent.env.step_vec(
        jax.random.split(k_env, cfg.num_envs), state.env_state, actions
    )
    state = state.replace(carry=carry, env_state=env_state, obs=obs)

    # TimeLimit truncation is not stored as done (run.py:371-374);
    # ts.obs is the TRUE next observation (pre-auto-reset).
    state = agent.observe(state, actions, ts.obs, ts.reward, ts.terminated)
    state = agent.handle_resets(state, k_reset, ts.done, obs)
    if not count_steps:
        return state
    return state.replace(env_steps=state.env_steps + cfg.num_envs)


def make_train_chunk_fn(
    agent: Agent,
    eps_schedule: EpsilonSchedule,
    updates_per_iter: int,
    iters_per_chunk: int,
    presample: Optional[bool] = None,
    unroll: int = 4,
    outer_unroll: int = 1,
):
    """Un-jitted chunk body: advance ``iters_per_chunk`` iterations (E env
    steps + ``updates_per_iter`` gradient steps each).  ``parallel.mesh``
    re-jits this with explicit shardings for multi-chip runs.

    ``unroll`` unrolls the sequential update scan by that factor — the
    round-3 trace showed ~5% of chunk device time in while-loop
    bookkeeping, and unrolling also lets XLA fuse across adjacent
    updates.  Measured on the chip (bench.py --unroll): 4 gives
    2,563 env-steps/s vs 2,377 rolled (+7.8%), numerically identical
    (tests/test_agent_loop.py::TestUnroll), so 4 is the default; it
    trades a longer compile for the win.

    ``outer_unroll`` unrolls the outer iteration scan (env step + update
    scan + anneal) the same way, letting XLA fuse an iteration's trailing
    update ops with the next iteration's act/env-step ops (the remaining
    scan-bookkeeping class in the round-4 trace).  Semantics-preserving
    for any value; measured on the chip via bench.py --outer-unroll."""
    unroll = max(1, min(unroll, updates_per_iter) if updates_per_iter > 0
                 else 1)

    # ``presample=True`` gathers all of an iteration's batches in one
    # vmapped presample before the update scan (the buffer is frozen
    # between the iteration's updates, so this is distribution-identical
    # to sampling inside the update chain).  Measured on the v5e chip at
    # bench shapes it LOSES to in-scan sampling (2020 vs 2145 env-steps/s
    # with the same learn path): the one-shot [updates, B, L+1] gather
    # costs more than the per-update gathers it hoists off the scan.  It
    # therefore defaults OFF and remains available for experimentation.
    if presample is None:
        presample = False

    def train_iter(state: AgentState, _) -> Tuple[AgentState, None]:
        key, k_step, k_learn = jax.random.split(state.key, 3)
        state = state.replace(key=key)
        state = env_step(agent, state, k_step)

        if updates_per_iter > 0:
            if presample:
                # Independent key streams for sampling and dropout.
                ks = jax.random.split(k_learn, 2 * updates_per_iter)
                sample_keys, update_keys = (
                    ks[:updates_per_iter],
                    ks[updates_per_iter:],
                )
                batches = jax.vmap(
                    lambda k: agent.sample_batch(state.buffer, k)
                )(sample_keys)

                def one_update(st, kb):
                    k, batch = kb
                    return agent.apply_update(st, batch, k), None

                state, _ = jax.lax.scan(
                    one_update, state, (update_keys, batches),
                    unroll=unroll,
                )
            else:
                def one_update(st, k):
                    return agent.learn(st, k), None

                state, _ = jax.lax.scan(
                    one_update,
                    state,
                    jax.random.split(k_learn, updates_per_iter),
                    unroll=unroll,
                )
        state = state.replace(
            epsilon=eps_schedule.anneal(state.epsilon, agent.config.num_envs)
        )
        return state, None

    def train_chunk(state: AgentState) -> AgentState:
        state, _ = jax.lax.scan(
            train_iter, state, None, length=iters_per_chunk,
            unroll=max(1, min(outer_unroll, iters_per_chunk)),
        )
        return state

    return train_chunk


def make_train_chunk(
    agent: Agent,
    eps_schedule: EpsilonSchedule,
    updates_per_iter: int,
    iters_per_chunk: int,
    presample: Optional[bool] = None,
    unroll: int = 4,
    outer_unroll: int = 1,
):
    """Single-device jitted train chunk (buffers donated for in-place
    updates).

    Training runs default to outer_unroll=1: at production chunk lengths
    (hundreds to thousands of iterations per eval period) the duplicated
    scan body mostly buys compile time, while bench.py's 50-iteration
    chunks measure the fused win (2,732 vs 2,609 env-steps/s at unroll 8).
    ``--outer-unroll`` opts a run in."""
    fn = make_train_chunk_fn(
        agent, eps_schedule, updates_per_iter, iters_per_chunk, presample,
        unroll=unroll, outer_unroll=outer_unroll,
    )
    return jax.jit(fn, donate_argnums=(0,))


def make_prepopulate_fn(agent: Agent, iters: int):
    """Un-jitted prepopulation body (vmapped by the multi-seed sweep)."""

    def prepop_iter(state: AgentState, _) -> Tuple[AgentState, None]:
        key, k_step = jax.random.split(state.key)
        state = state.replace(key=key)
        state = env_step(
            agent, state, k_step, random_only=True, count_steps=False
        )
        return state, None

    def prepopulate(state: AgentState) -> AgentState:
        state, _ = jax.lax.scan(prepop_iter, state, None, length=iters)
        return state

    return prepopulate


def make_prepopulate(agent: Agent, iters: int):
    """Random-action buffer prepopulation (run.py:380-405, 50k steps)."""
    return jax.jit(
        make_prepopulate_fn(agent, iters), donate_argnums=(0,)
    )


def make_evaluate_fn(agent: Agent, eval_env: Environment, eval_episodes: int):
    """Un-jitted evaluation body: fn(params, key) ->
    (success_rate, mean_return, mean_ep_len).  Vmapped by the sweep."""
    cfg = agent.config
    n = eval_episodes
    max_steps = eval_env.max_episode_steps

    def evaluate(params, key):
        k_env, k_ctx, k_loop = jax.random.split(key, 3)
        obs, env_state = eval_env.reset_vec(jax.random.split(k_env, n))
        context = replay.init_context(
            k_ctx,
            n,
            cfg.context_len,
            tuple(eval_env.obs_shape),
            eval_env.obs_dtype,
            eval_env.obs_mask,
            eval_env.num_actions,
            obs,
        )
        bag = (
            replay.init_bag(
                n, cfg.bag_size, tuple(eval_env.obs_shape),
                eval_env.obs_dtype, eval_env.obs_mask,
            )
            if agent.use_bag
            else None
        )
        carry = (
            zero_carry(n, cfg.inner_embed)
            if cfg.kind == "recurrent"
            else None
        )

        init = dict(
            context=context,
            bag=bag,
            carry=carry,
            env_state=env_state,
            obs=obs,
            finished=jnp.zeros((n,), bool),
            ep_reward=jnp.zeros((n,), jnp.float32),
            ep_len=jnp.zeros((n,), jnp.int32),
            success=jnp.zeros((n,), bool),
        )

        def body(c, key_t):
            k_env_t = jax.random.split(key_t, n)
            actions, new_carry = agent.greedy_actions(
                params, c["context"], c["bag"], c["carry"], c["obs"]
            )
            obs_t, env_state_t, ts = jax.vmap(eval_env.step)(
                k_env_t, c["env_state"], actions
            )
            live = jnp.logical_not(c["finished"])
            total = c["ep_reward"] + ts.reward * live
            done_now = jnp.logical_and(live, ts.done)
            # success = is_success flag or positive return (run.py:232)
            succ = jnp.logical_or(
                ts.info["is_success"], total > 0
            )
            context_t, ev_obs, ev_act, was_full = replay.add_transition(
                c["context"], ts.obs, actions, ts.reward, ts.terminated
            )
            bag_t = c["bag"]
            if agent.use_bag:
                # Eval-time bag keeps the add/evict policy (dtqn.py:116-157).
                need = jnp.logical_and(was_full, live)
                ev_idx = context_t.timestep - cfg.context_len
                bag_t, accepted = replay.bag_add(
                    bag_t, ev_obs, ev_act, ev_idx, need
                )
                overflow = jnp.logical_and(need, jnp.logical_not(accepted))
                bag_t = agent._bag_evict(
                    params, context_t, bag_t, ev_obs, ev_act, ev_idx, overflow
                )

            def keep(old, new):
                """new where the episode is still live, else frozen old."""
                return jax.tree_util.tree_map(
                    lambda o, nw: jnp.where(
                        live.reshape((-1,) + (1,) * (jnp.ndim(nw) - 1)), nw, o
                    ),
                    old,
                    new,
                )

            c = dict(
                context=keep(c["context"], context_t),
                bag=keep(c["bag"], bag_t) if agent.use_bag else None,
                carry=keep(c["carry"], new_carry)
                if c["carry"] is not None
                else None,
                env_state=keep(c["env_state"], env_state_t),
                obs=keep(c["obs"], obs_t),
                finished=jnp.logical_or(c["finished"], ts.done),
                ep_reward=total,
                ep_len=c["ep_len"] + live.astype(jnp.int32),
                success=jnp.where(done_now, succ, c["success"]),
            )
            return c, None

        c, _ = jax.lax.scan(body, init, jax.random.split(k_loop, max_steps))
        episodes = max(n, 1)
        return (
            c["success"].sum() / episodes,
            c["ep_reward"].sum() / episodes,
            c["ep_len"].sum() / episodes,
        )

    return evaluate


def make_evaluate(agent: Agent, eval_env: Environment, eval_episodes: int):
    """Greedy-policy evaluation: ``eval_episodes`` parallel episodes
    (run.py:187-243).  Returns jitted fn(params, key) ->
    (success_rate, mean_return, mean_ep_len)."""
    return jax.jit(make_evaluate_fn(agent, eval_env, eval_episodes))
