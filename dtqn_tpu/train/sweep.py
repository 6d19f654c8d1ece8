"""Vmapped multi-seed training: N independent seeds on one chip.

The reference's published curves average seeds 1-5, run as five separate
processes (`/root/reference/README.md:124-125`).  At DTQN sizes a single
TPU chip is mostly idle (latency-bound batch-32/L-50 chains), so the
TPU-native way to run the protocol is to STACK the N complete
``AgentState`` pytrees along a leading seed axis and ``vmap`` the whole
jitted train chunk over it: XLA batches every matmul across seeds, and
N seeds cost roughly one seed's wall-clock.

Host-side bookkeeping stays per-seed: one CSV logger/policy path per seed
(drop-in comparable with single-seed runs and the reference artifacts),
plus per-seed policy snapshots.  Checkpoint/resume uses one stacked
checkpoint keyed by the seed list.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dtqn_tpu.agents import Agent
from dtqn_tpu.config import ExperimentConfig
from dtqn_tpu.ops.attention import set_attention_impl
from dtqn_tpu.train.loop import (
    make_evaluate_fn,
    make_prepopulate_fn,
    make_train_chunk_fn,
)
from dtqn_tpu.train.runner import build_envs
from dtqn_tpu.utils import checkpoint as ckpt
from dtqn_tpu.utils.epsilon import EpsilonSchedule
from dtqn_tpu.utils.logging import CSVLogger, timestamp


def _slice_seed(tree, i: int):
    return jax.tree_util.tree_map(lambda x: x[i], tree)


def sweep_path(config: ExperimentConfig, seeds: Sequence[int]) -> str:
    """Checkpoint key for the stacked sweep state."""
    tag = "-".join(str(s) for s in seeds)
    return config.policy_path() + f"_sweep{tag}"


def run_sweep(config: ExperimentConfig, seeds: Sequence[int]) -> dict:
    """Train all ``seeds`` simultaneously; returns {seed: final_metrics}."""
    start_time = time.time()
    from dtqn_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    set_attention_impl(config.attention)
    if config.bf16:
        from dtqn_tpu.models.init import set_compute_dtype

        set_compute_dtype("bfloat16")

    n = len(seeds)
    env, eval_envs = build_envs(config)
    if config.max_episode_steps > 0:
        env.max_episode_steps = config.max_episode_steps
        for e in eval_envs:
            e.max_episode_steps = config.max_episode_steps

    agent = Agent(config.agent_config(), env)
    eps = EpsilonSchedule(
        1.0, config.eps_min, max(config.num_steps // 10, 1)
    )

    from dtqn_tpu.utils.rng import seed_everything

    keys = jnp.stack([seed_everything(s) for s in seeds])
    states = jax.jit(jax.vmap(agent._init_state_impl))(keys)

    # Per-seed host artifacts: same paths a single-seed run would use.
    seed_cfgs = [dataclasses.replace(config, seed=s) for s in seeds]
    import os

    os.makedirs(config.policy_dir(), exist_ok=True)
    loggers = [CSVLogger(c.policy_path(), c.envs) for c in seed_cfgs]

    if config.verbose:
        n_params = sum(
            x.size for x in jax.tree_util.tree_leaves(states.params)
        )
        print(
            f"[ {timestamp()} ] Sweep over seeds {list(seeds)}: "
            f"{config.model}, {n_params // n} parameters per seed"
        )

    ck_path = sweep_path(config, seeds)
    mini = ckpt.load_mini_checkpoint(ck_path)
    if mini is not None and mini["step"] >= config.num_steps:
        print(f"Found completed sweep ({mini['step']} steps); nothing to do.")
        return {"completed": True, "step": mini["step"]}
    if mini is not None and ckpt.has_checkpoint(ck_path):
        states, _ = ckpt.load_checkpoint(ck_path, states)
        print(f"Resumed sweep at {int(states.env_steps[0])} steps.")
    else:
        prepop_iters = max(config.prepop_steps // config.num_envs, 1)
        prepop = jax.jit(
            jax.vmap(make_prepopulate_fn(agent, prepop_iters)),
            donate_argnums=(0,),
        )
        states = prepop(states)

    chunk = jax.jit(
        jax.vmap(
            make_train_chunk_fn(
                agent,
                eps,
                config.resolved_updates_per_iter,
                config.resolved_iters_per_chunk,
                unroll=config.unroll,
                outer_unroll=config.outer_unroll,
            )
        ),
        donate_argnums=(0,),
    )
    evaluators = [
        jax.jit(jax.vmap(make_evaluate_fn(agent, e, config.eval_episodes)))
        for e in eval_envs
    ]

    time_budget = config.time_limit * 3600 if config.time_limit else None
    last_policy_save = int(states.env_steps[0])
    final: dict = {s: {} for s in seeds}
    profiled = False

    while int(states.env_steps[0]) < config.num_steps:
        if config.profile_dir and not profiled and int(states.env_steps[0]) > 0:
            # Trace one post-warmup vmapped chunk (compile excluded), as in
            # runner.py — for diagnosing seed-axis scaling on real hardware.
            # Sync by fetching a data-dependent params element to host:
            # block_until_ready is unreliable on this platform (CLAUDE.md)
            # and would let the trace close before device work finishes.
            from dtqn_tpu.utils.profiling import trace_chunks

            with trace_chunks(config.profile_dir):
                states = chunk(states)
                np.asarray(
                    jax.tree_util.tree_leaves(states.params)[0]
                ).ravel()[0]
            profiled = True
            # Fall through: the profiled chunk gets the same eval/CSV/
            # checkpoint bookkeeping as any other chunk (no curve gap).
        else:
            states = chunk(states)
        step = int(states.env_steps[0])
        hours = (time.time() - start_time) / 3600

        bad = np.asarray(states.nonfinite_grads)
        if bad.any():
            raise FloatingPointError(
                f"non-finite gradient steps per seed: "
                f"{dict(zip(seeds, bad.tolist()))}"
            )

        # means() reduces over the window axis only when vmapped over the
        # stacked seed axis (unvmapped it would sum across seeds too).
        diag_tree = jax.vmap(lambda d: d.means())(states.diagnostics)
        diag = {k: np.asarray(v) for k, v in diag_tree.items()}  # each [n]

        # Independent eval keys per seed, separate from the training chain.
        both = jax.vmap(jax.random.split)(states.key)
        states = states.replace(key=both[:, 0])
        eval_keys = both[:, 1]

        per_env = []
        for i_env, evaluate in enumerate(evaluators):
            ek = jax.vmap(lambda k: jax.random.fold_in(k, i_env))(eval_keys)
            sr, ret, ln = evaluate(states.params, ek)
            per_env.append(
                (np.asarray(sr), np.asarray(ret), np.asarray(ln))
            )

        for i, s in enumerate(seeds):
            log_vals = {
                **{k: float(v[i]) for k, v in diag.items()},
                "losses/hours": hours,
            }
            for name, (sr, ret, ln) in zip(config.envs, per_env):
                log_vals[f"{name}/SuccessRate"] = float(sr[i])
                log_vals[f"{name}/Return"] = float(ret[i])
                log_vals[f"{name}/EpisodeLength"] = float(ln[i])
            loggers[i].log(log_vals, step=step)
            final[s] = log_vals

        if config.verbose:
            name = config.envs[-1]
            srs = " ".join(
                f"{s}:{final[s][f'{name}/SuccessRate']:.2f}" for s in seeds
            )
            print(
                f"[ {timestamp()} ] Steps: {step}, Env: {name}, "
                f"SuccessRate per seed: {srs}, Hours: {hours:.2f}"
            )

        if config.save_policy and step - last_policy_save >= 50_000:
            for i, c in enumerate(seed_cfgs):
                ckpt.save_policy(
                    c.policy_path(), _slice_seed(states.params, i)
                )
            last_policy_save = step

        if time_budget and time.time() - start_time >= time_budget:
            print(f"Reached time limit. Saving sweep checkpoint at {step}.")
            ckpt.save_checkpoint(ck_path, states)
            ckpt.save_mini_checkpoint(ck_path, step, None)
            return final

    # Save the FULL stacked state at completion too (not just on
    # time-limit): a finished sweep stays extendable — resuming with a
    # larger --num-steps continues from here with buffer/optimizer/PRNG
    # state intact instead of restarting from scratch.
    ckpt.save_checkpoint(ck_path, states)
    ckpt.save_mini_checkpoint(ck_path, int(states.env_steps[0]), None)
    if config.save_policy:
        for i, c in enumerate(seed_cfgs):
            ckpt.save_policy(c.policy_path(), _slice_seed(states.params, i))
    return final
