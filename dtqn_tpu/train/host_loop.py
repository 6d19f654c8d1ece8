"""Host-loop training: C-backed host envs + jitted device learner.

MiniHack (and any ``HostEnvironment``) steps native host code, so the
all-on-device rollout (train/loop.py) can't absorb it.  This runner keeps
the reference's execution shape — host env steps with a device forward per
step (`/root/reference/run.py:287-298`, `envs/mini_hack.py:21-76`) — but
vectorizes E host envs per iteration and keeps EVERYTHING else (epsilon-
greedy acting, context/bag maintenance, the HBM replay buffer, DDQN
learning, diagnostics) inside jit.  Host<->device traffic per iteration is
one action fetch [E] and one observation push [E, obs].

Evaluation runs ``eval_episodes`` host envs to completion with greedy
device acting, reproducing run.py:187-243 (success = is_success flag or
positive return).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dtqn_tpu import replay
from dtqn_tpu.agents import Agent
from dtqn_tpu.agents.base import AgentState
from dtqn_tpu.config import ExperimentConfig
from dtqn_tpu.envs.host import HostEnvironment, HostVecEnv
from dtqn_tpu.models import zero_carry
from dtqn_tpu.ops.attention import set_attention_impl
from dtqn_tpu.utils import checkpoint as ckpt
from dtqn_tpu.utils.epsilon import EpsilonSchedule
from dtqn_tpu.utils.logging import get_logger, timestamp


def make_host_fns(agent: Agent, eps: EpsilonSchedule, updates_per_iter: int):
    """Jitted device-side halves of the host loop."""
    cfg = agent.config

    @jax.jit
    def act(state: AgentState):
        key, k_act = jax.random.split(state.key)
        state = state.replace(key=key)
        actions, carry = agent.select_actions(state, k_act, state.epsilon)
        return state.replace(carry=carry), actions

    @jax.jit
    def act_random(state: AgentState):
        key, k = jax.random.split(state.key)
        actions = jax.random.randint(
            k, (cfg.num_envs,), 0, agent.env.num_actions
        )
        return state.replace(key=key), actions

    def _observe(state, actions, next_obs, reward, terminated, done, reset_obs):
        key, k_reset = jax.random.split(state.key)
        state = state.replace(key=key)
        state = agent.observe(state, actions, next_obs, reward, terminated)
        state = agent.handle_resets(state, k_reset, done, reset_obs)
        return state.replace(obs=reset_obs)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def observe_only(state, actions, next_obs, reward, terminated, done, reset_obs):
        # Prepopulation stores without learning or counting env_steps
        # (run.py:380-405).
        return _observe(
            state, actions, next_obs, reward, terminated, done, reset_obs
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def observe_and_learn(
        state, actions, next_obs, reward, terminated, done, reset_obs
    ):
        state = _observe(
            state, actions, next_obs, reward, terminated, done, reset_obs
        )
        key, k_learn = jax.random.split(state.key)
        state = state.replace(key=key)
        if updates_per_iter > 0:
            def one_update(st, k):
                return agent.learn(st, k), None

            state, _ = jax.lax.scan(
                one_update, state, jax.random.split(k_learn, updates_per_iter)
            )
        return state.replace(
            epsilon=eps.anneal(state.epsilon, cfg.num_envs),
            env_steps=state.env_steps + cfg.num_envs,
        )

    return act, act_random, observe_only, observe_and_learn


def make_host_eval(agent: Agent, meta: HostEnvironment, n: int):
    """Jitted helpers for host-side greedy evaluation over n envs."""
    cfg = agent.config

    @jax.jit
    def eval_init(key, obs):
        context = replay.init_context(
            key,
            n,
            cfg.context_len,
            tuple(meta.obs_shape),
            meta.obs_dtype,
            meta.obs_mask,
            meta.num_actions,
            obs,
        )
        bag = (
            replay.init_bag(
                n, cfg.bag_size, tuple(meta.obs_shape), meta.obs_dtype,
                meta.obs_mask,
            )
            if agent.use_bag
            else None
        )
        carry = (
            zero_carry(n, cfg.inner_embed)
            if cfg.kind == "recurrent"
            else None
        )
        return context, bag, carry

    @jax.jit
    def greedy(params, context, bag, carry, obs):
        return agent.greedy_actions(params, context, bag, carry, obs)

    @jax.jit
    def eval_observe(params, context, bag, carry_new, next_obs, actions,
                     reward, terminated, live):
        context, ev_obs, ev_act, was_full = replay.add_transition(
            context, next_obs, actions, reward, terminated
        )
        if agent.use_bag:
            need = jnp.logical_and(was_full, live)
            ev_idx = context.timestep - cfg.context_len
            bag, accepted = replay.bag_add(bag, ev_obs, ev_act, ev_idx, need)
            overflow = jnp.logical_and(need, jnp.logical_not(accepted))
            bag = agent._bag_evict(
                params, context, bag, ev_obs, ev_act, ev_idx, overflow
            )
        return context, bag, carry_new

    return eval_init, greedy, eval_observe


def evaluate_host(
    agent: Agent,
    params,
    make_one_env: Callable[[], HostEnvironment],
    n_episodes: int,
    key: jax.Array,
):
    """n_episodes greedy host episodes (run.py:187-243)."""
    envs = [make_one_env() for _ in range(n_episodes)]
    vec = HostVecEnv(envs)
    meta = vec.meta
    eval_init, greedy, eval_observe = make_host_eval(agent, meta, n_episodes)

    obs = vec.reset_all()
    context, bag, carry = eval_init(key, jnp.asarray(obs))
    finished = np.zeros((n_episodes,), bool)
    ep_reward = np.zeros((n_episodes,), np.float64)
    ep_len = np.zeros((n_episodes,), np.int64)
    success = np.zeros((n_episodes,), bool)

    for _ in range(meta.max_episode_steps):
        actions, carry = greedy(params, context, bag, carry, jnp.asarray(obs))
        actions = np.asarray(actions)
        out = vec.step(actions)
        live = ~finished
        ep_reward[live] += out["reward"][live]
        ep_len[live] += 1
        done_now = live & out["done"]
        success[done_now] = (
            out["is_success"][done_now]
            | (ep_reward[done_now] > 0)  # run.py:232
        )
        context, bag, carry = eval_observe(
            params, context, bag, carry,
            jnp.asarray(out["next_obs"]), jnp.asarray(actions),
            jnp.asarray(out["reward"]), jnp.asarray(out["terminated"]),
            jnp.asarray(live),
        )
        finished |= out["done"]
        # Contexts of finished episodes keep rolling harmlessly; their
        # metrics are frozen above.
        obs = out["reset_obs"]
        if finished.all():
            break

    n = max(n_episodes, 1)
    return success.sum() / n, ep_reward.sum() / n, ep_len.sum() / n


def run_host_experiment(
    config: ExperimentConfig,
    env_factory: Optional[Callable[[str], HostEnvironment]] = None,
) -> dict:
    """Train on host environments (MH-* domains) per the config.

    ``env_factory(name)`` defaults to the MiniHack adapter; injectable so
    the loop is testable without the external package.
    """
    start_time = time.time()
    from dtqn_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    set_attention_impl(config.attention)
    if config.bf16:
        from dtqn_tpu.models.init import set_compute_dtype

        set_compute_dtype("bfloat16")

    if env_factory is None:
        from dtqn_tpu.envs.minihack import make_host_env as env_factory

    if len(config.envs) != 1:
        raise ValueError(
            "host-loop training supports one domain per run "
            f"(got {config.envs})"
        )
    name = config.envs[0]

    envs = [env_factory(name) for _ in range(config.num_envs)]
    for i, e in enumerate(envs):
        e.seed(config.seed + i)
    vec = HostVecEnv(envs)
    meta = vec.meta
    if config.max_episode_steps > 0:
        meta.max_episode_steps = config.max_episode_steps

    agent = Agent(config.agent_config(), meta)
    eps = EpsilonSchedule(1.0, 0.1, max(config.num_steps // 10, 1))

    from dtqn_tpu.utils.rng import seed_everything

    obs0 = vec.reset_all()
    state = agent.init_state(seed_everything(config.seed), obs0)

    os.makedirs(config.policy_dir(), exist_ok=True)
    policy_path = config.policy_path()
    if config.verbose:
        n_params = sum(
            x.size for x in jax.tree_util.tree_leaves(state.params)
        )
        print(
            f"[ {timestamp()} ] Creating {config.model} with "
            f"{n_params} parameters (host loop: {name})"
        )

    act, act_random, observe_only, observe_and_learn = make_host_fns(
        agent, eps, config.resolved_updates_per_iter
    )

    def host_iter(state, act_fn, update_fn):
        state, actions = act_fn(state)
        out = vec.step(np.asarray(actions))  # the host<->device boundary
        return update_fn(
            state,
            actions,
            jnp.asarray(out["next_obs"]),
            jnp.asarray(out["reward"]),
            jnp.asarray(out["terminated"]),
            jnp.asarray(out["done"]),
            jnp.asarray(out["reset_obs"]),
        )

    # Resume-or-prepopulate (run.py:471-495).
    mini = ckpt.load_mini_checkpoint(policy_path)
    wandb_kwargs = {}
    if mini is not None and mini["step"] >= config.num_steps:
        print(f"Found completed run ({mini['step']} steps); nothing to do.")
        return {"completed": True, "step": mini["step"]}
    if mini is not None and ckpt.has_checkpoint(policy_path):
        state, _ = ckpt.load_checkpoint(policy_path, state)
        wandb_kwargs = {"resume": "must", "id": mini.get("wandb_id")}
        print(f"Resumed from checkpoint at {int(state.env_steps)} steps.")
    else:
        for _ in range(max(config.prepop_steps // config.num_envs, 1)):
            state = host_iter(state, act_random, observe_only)

    logger = get_logger(policy_path, config, wandb_kwargs)
    wandb_id = getattr(getattr(logger, "run", None), "id", None)

    iters_per_chunk = config.resolved_iters_per_chunk
    time_budget = config.time_limit * 3600 if config.time_limit else None
    last_policy_save = int(state.env_steps)
    final_log = {}

    while int(state.env_steps) < config.num_steps:
        for _ in range(iters_per_chunk):
            state = host_iter(state, act, observe_and_learn)
        step = int(state.env_steps)
        hours = (time.time() - start_time) / 3600

        if int(state.nonfinite_grads) > 0:
            raise FloatingPointError(
                f"{int(state.nonfinite_grads)} non-finite gradient steps"
            )

        next_key, eval_key = jax.random.split(state.key)
        state = state.replace(key=next_key)
        sr, ret, ln = evaluate_host(
            agent, state.params, lambda: env_factory(name),
            config.eval_episodes, eval_key,
        )
        log_vals = {
            **{k: float(v) for k, v in state.diagnostics.means().items()},
            "losses/hours": hours,
            f"{name}/SuccessRate": float(sr),
            f"{name}/Return": float(ret),
            f"{name}/EpisodeLength": float(ln),
        }
        logger.log(log_vals, step=step)
        final_log = log_vals

        if config.verbose:
            print(
                f"[ {timestamp()} ] Steps: {step}, Env: {name}, "
                f"Success Rate: {sr:.2f}, Return: {ret:.2f}, "
                f"Episode Length: {ln:.2f}, Hours: {hours:.2f}"
            )

        if config.save_policy and step - last_policy_save >= 50_000:
            ckpt.save_policy(policy_path, state.params)
            last_policy_save = step

        if time_budget and time.time() - start_time >= time_budget:
            print(f"Reached time limit. Saving checkpoint at {step} steps.")
            ckpt.save_checkpoint(policy_path, state)
            ckpt.save_mini_checkpoint(policy_path, step, wandb_id)
            return final_log

    ckpt.save_mini_checkpoint(policy_path, int(state.env_steps), wandb_id)
    if config.save_policy:
        ckpt.save_policy(policy_path, state.params)
    return final_log
