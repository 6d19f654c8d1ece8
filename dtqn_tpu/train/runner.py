"""Experiment orchestration: the host-side shell around the jitted loop.

Parity with `/root/reference/run.py:408-529` (``run_experiment``): env
construction, seeding, agent build, resume-or-prepopulate, the train loop
with periodic evaluation/logging/policy saves, slurm-style time-limit
checkpointing, and the mini-checkpoint completion sentinel.

The host only does config, logging and checkpoint I/O; each chunk of
``eval_frequency`` env steps runs as one jitted scan on device
(train/loop.py), replacing the reference's per-timestep Python loop
(run.py:290-353).
"""

from __future__ import annotations

import os
import time
from collections import deque
from typing import List, Optional

import jax
import numpy as np

from dtqn_tpu.agents import Agent
from dtqn_tpu.config import ExperimentConfig
from dtqn_tpu.envs import make_env
from dtqn_tpu.ops.attention import set_attention_impl
from dtqn_tpu.train.loop import (
    make_evaluate,
    make_prepopulate,
    make_train_chunk,
)
from dtqn_tpu.utils import checkpoint as ckpt


def _render_episode(agent, env, params, key, policy_path) -> Optional[str]:
    """Greedy rollout of one episode with per-step frames, saved as one
    vertical PNG strip (every 10th frame).  Headless stand-in for the
    reference's pyglet enjoy loop (run.py:463-467)."""
    import numpy as np

    from dtqn_tpu import replay as _replay

    try:
        from PIL import Image
    except ImportError:
        return None

    k_env, k_ctx = jax.random.split(key)
    obs, env_state = env.reset_vec(jax.random.split(k_env, 1))
    cfg = agent.config
    context = _replay.init_context(
        k_ctx, 1, cfg.context_len, tuple(env.obs_shape),
        env.obs_dtype, env.obs_mask, env.num_actions, obs,
    )
    carry = None
    if cfg.kind == "recurrent":
        from dtqn_tpu.models.recurrent import zero_carry

        carry = zero_carry(1, cfg.inner_embed)
    frames = []
    for t in range(env.max_episode_steps):
        one = jax.tree_util.tree_map(lambda x: x[0], env_state)
        frames.append(np.asarray(env.render_frame(one)))
        actions, carry = agent.greedy_actions(
            params, context, None, carry, obs
        )
        k_env, k_t = jax.random.split(k_env)
        obs, env_state, ts = jax.vmap(env.step)(
            k_t[None], env_state, actions
        )
        context, *_ = _replay.add_transition(
            context, ts.obs, actions, ts.reward, ts.terminated
        )
        if bool(ts.done[0]):
            one = jax.tree_util.tree_map(lambda x: x[0], env_state)
            frames.append(np.asarray(env.render_frame(one)))
            break
    # Tail frame only when frames[::10] didn't already end on it.
    tail = frames[-1:] if (len(frames) - 1) % 10 else []
    strip = np.concatenate(frames[::10] + tail, axis=0)
    path = policy_path + "_enjoy.png"
    Image.fromarray(strip).save(path)
    return path
from dtqn_tpu.utils.epsilon import EpsilonSchedule
from dtqn_tpu.utils.logging import CSVLogger, get_logger, timestamp


class HostRunningAverage:
    """Host-side windowed mean for eval metrics (logging_utils.py:10-24)."""

    def __init__(self, size: int, values=None):
        self.size = size
        self.q = deque(values or [], maxlen=size)

    def add(self, val: float) -> None:
        self.q.append(float(val))

    def mean(self) -> float:
        return sum(self.q) / max(len(self.q), 1)

    def to_list(self):
        return list(self.q)


def build_envs(config: ExperimentConfig):
    """(train_env, eval_envs) for the configured domain list.

    Multiple --envs sample a new domain per episode (run.py:287) via
    MultiDomainEnv; Gridverse members of different sizes are padded to a
    common static grid so their state pytrees unify.
    """
    names = config.envs
    if len(names) == 1:
        return make_env(names[0]), [make_env(names[0])]

    if all(n.startswith("gv_") for n in names):
        from dtqn_tpu.envs.gridverse import make_gridverse_env

        sizes = [int(n.split(".")[1].split("x")[0]) for n in names]
        pad = max(sizes)
        members = [make_gridverse_env(n, pad_to=pad) for n in names]
        evals = [make_gridverse_env(n, pad_to=pad) for n in names]
    else:
        members = [make_env(n) for n in names]
        evals = [make_env(n) for n in names]

    from dtqn_tpu.envs.multi import MultiDomainEnv

    return MultiDomainEnv(members), evals


def run_experiment(config: ExperimentConfig) -> dict:
    """Train per the config; returns final metrics for programmatic use."""
    start_time = time.time()
    from dtqn_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    set_attention_impl(config.attention)
    if config.bf16:
        from dtqn_tpu.models.init import set_compute_dtype

        set_compute_dtype("bfloat16")

    env, eval_envs = build_envs(config)
    if config.max_episode_steps > 0:
        env.max_episode_steps = config.max_episode_steps
        for e in eval_envs:
            e.max_episode_steps = config.max_episode_steps

    agent = Agent(config.agent_config(), env)
    # LinearAnneal(1.0, 0.1, num_steps/10) (run.py:420); --eps-min raises
    # the floor (non-parity mitigation, default keeps the reference 0.1).
    eps = EpsilonSchedule(
        1.0, config.eps_min, max(config.num_steps // 10, 1)
    )

    from dtqn_tpu.utils.rng import seed_everything

    state = agent.init_state(seed_everything(config.seed))

    os.makedirs(config.policy_dir(), exist_ok=True)
    policy_path = config.policy_path()

    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(state.params)
    )
    if config.verbose:
        print(
            f"[ {timestamp()} ] Creating {config.model} with "
            f"{n_params} parameters"
        )

    # Enjoy mode: load a saved policy and report greedy performance
    # (run.py:463-467).  Envs exposing ``render_frame`` (e.g. CarFlag)
    # additionally get an episode image strip saved next to the policy —
    # the reference's interactive pyglet window (car_flag.py:135-271)
    # recast as headless artifacts.
    if config.render:
        params = ckpt.load_policy(policy_path, state.params)
        ev = make_evaluate(agent, eval_envs[0], config.eval_episodes)
        sr, ret, ln = ev(params, jax.random.key(config.seed + 1))
        print(
            f"[enjoy] SuccessRate={float(sr):.2f} Return={float(ret):.2f} "
            f"EpisodeLength={float(ln):.1f}"
        )
        out = {"success_rate": float(sr), "return": float(ret)}
        if hasattr(eval_envs[0], "render_frame") and not agent.use_bag:
            path = _render_episode(
                agent, eval_envs[0], params,
                jax.random.key(config.seed + 2), policy_path,
            )
            if path:
                print(f"[enjoy] episode strip saved to {path}")
                out["render_path"] = path
        return out

    mean_success_rate = HostRunningAverage(10)
    mean_reward = HostRunningAverage(10)
    mean_episode_length = HostRunningAverage(10)

    # Resume-or-exit protocol (run.py:471-495).
    mini = ckpt.load_mini_checkpoint(policy_path)
    wandb_kwargs = {}
    if mini is not None:
        if mini["step"] >= config.num_steps:
            print(
                f"Found completed run ({mini['step']} steps); nothing to do."
            )
            return {"completed": True, "step": mini["step"]}
        if ckpt.has_checkpoint(policy_path):
            state, extra = ckpt.load_checkpoint(policy_path, state)
            mean_success_rate = HostRunningAverage(
                10, extra.get("mean_success_rate")
            )
            mean_reward = HostRunningAverage(10, extra.get("mean_reward"))
            mean_episode_length = HostRunningAverage(
                10, extra.get("mean_episode_length")
            )
            wandb_kwargs = {"resume": "must", "id": mini.get("wandb_id")}
            print(f"Resumed from checkpoint at {int(state.env_steps)} steps.")
    else:
        # Prepopulate the replay buffer with random experience (run.py:495).
        prepop_iters = max(config.prepop_steps // config.num_envs, 1)
        state = make_prepopulate(agent, prepop_iters)(state)

    logger = get_logger(policy_path, config, wandb_kwargs)
    # wandb run id rides the mini checkpoint so resume can reattach with
    # resume="must" (run.py:482-490, 527); None under CSV logging.
    wandb_id = getattr(getattr(logger, "run", None), "id", None)

    if config.dp_devices > 1:
        from dtqn_tpu.parallel.mesh import (
            make_distributed_train_chunk,
            make_mesh,
            shard_state,
        )

        mesh = make_mesh(config.dp_devices)
        state = shard_state(agent, state, mesh)
        train_chunk = make_distributed_train_chunk(
            agent,
            eps,
            config.resolved_updates_per_iter,
            config.resolved_iters_per_chunk,
            mesh,
            state,
        )
    else:
        train_chunk = make_train_chunk(
            agent,
            eps,
            config.resolved_updates_per_iter,
            config.resolved_iters_per_chunk,
            unroll=config.unroll,
            outer_unroll=config.outer_unroll,
        )
    evaluators = [
        make_evaluate(agent, e, config.eval_episodes) for e in eval_envs
    ]

    time_budget = (
        config.time_limit * 3600 - (time.time() - start_time)
        if config.time_limit
        else None
    )

    last_policy_save = int(state.env_steps)
    final_log = {}
    profiled = False
    while int(state.env_steps) < config.num_steps:
        if config.profile_dir and not profiled and int(state.env_steps) > 0:
            # Trace one post-warmup chunk (compile excluded).
            from dtqn_tpu.utils.profiling import trace_chunks

            with trace_chunks(config.profile_dir):
                state = train_chunk(state)
                jax.block_until_ready(state.params)
            profiled = True
            continue
        state = train_chunk(state)
        step = int(state.env_steps)
        hours = (time.time() - start_time) / 3600

        if int(state.nonfinite_grads) > 0:
            # The reference's error_if_nonfinite grad clip fails loudly
            # (dqn.py:196-200); surface it here at the host boundary.
            raise FloatingPointError(
                f"{int(state.nonfinite_grads)} non-finite gradient steps"
            )

        log_vals = {
            **{k: float(v) for k, v in state.diagnostics.means().items()},
            "losses/hours": hours,
        }
        # Dedicated eval key branch: the key kept for the next train chunk
        # and the keys consumed by evaluation must be independent draws.
        next_key, eval_key = jax.random.split(state.key)
        state = state.replace(key=next_key)
        for i, (name, evaluate) in enumerate(zip(config.envs, evaluators)):
            sr, ret, ln = evaluate(
                state.params, jax.random.fold_in(eval_key, i)
            )
            log_vals[f"{name}/SuccessRate"] = float(sr)
            log_vals[f"{name}/Return"] = float(ret)
            log_vals[f"{name}/EpisodeLength"] = float(ln)
            mean_success_rate.add(float(sr))
            mean_reward.add(float(ret))
            mean_episode_length.add(float(ln))
        logger.log(log_vals, step=step)
        final_log = log_vals

        if config.verbose:
            name = config.envs[-1]
            print(
                f"[ {timestamp()} ] Steps: {step}, "
                f"Env: {name}, "
                f"Success Rate: {log_vals[f'{name}/SuccessRate']:.2f}, "
                f"Return: {log_vals[f'{name}/Return']:.2f}, "
                f"Episode Length: {log_vals[f'{name}/EpisodeLength']:.2f}, "
                f"Hours: {hours:.2f}"
            )

        # Policy snapshot every 50k env steps (run.py:337-338).
        if config.save_policy and step - last_policy_save >= 50_000:
            ckpt.save_policy(policy_path, state.params)
            last_policy_save = step

        # Slurm-style time-limit checkpoint (run.py:340-353).
        if time_budget and time.time() - start_time >= time_budget:
            print(
                f"Reached time limit. Saving checkpoint at {step} steps."
            )
            ckpt.save_checkpoint(
                policy_path,
                state,
                extra={
                    "mean_success_rate": mean_success_rate.to_list(),
                    "mean_reward": mean_reward.to_list(),
                    "mean_episode_length": mean_episode_length.to_list(),
                },
            )
            ckpt.save_mini_checkpoint(policy_path, step, wandb_id)
            return final_log

    # Completion sentinel (run.py:527-529).
    ckpt.save_mini_checkpoint(policy_path, int(state.env_steps), wandb_id)
    if config.save_policy:
        ckpt.save_policy(policy_path, state.params)
    return final_log
