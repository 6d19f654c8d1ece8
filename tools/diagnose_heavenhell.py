#!/usr/bin/env python
"""Diagnose the HeavenHell 0<->1 success-rate oscillation (CPU, no TPU).

Round-2 finding (VALIDATION.md): the seed-1 HeavenHell run's eval success
rate flips between sustained 0.0 and sustained 1.0 stretches on a
deterministic T-maze.  The losses CSV shows a *healthy* head throughout
(Q-spread ~0.9, TD ~1e-3), and every SR=0 eval has return exactly 0 with
all 10 episodes hitting the step cap: the greedy policy is in "loiter
mode" — it neither commits to heaven nor falls into hell.

This tool loads a saved policy snapshot and walks the greedy policy
through both heaven-side configurations, printing the Q-gap between the
chosen action and the runner-up at every step.  The hypothesis it tests:
the commit-vs-loiter decision rides on a tiny Q-gap (same order as the
per-target-swap Q drift), so each hard target swap (tuf=10k) can flip the
greedy argmax globally.

Usage: python tools/diagnose_heavenhell.py [policy_path_prefix]
"""

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from dtqn_tpu.agents import Agent
from dtqn_tpu.config import get_args
from dtqn_tpu import replay
from dtqn_tpu.envs import make_env
from dtqn_tpu.utils import checkpoint as ckpt

ENV = "POMDP-heavenhell_3-episodic-v0"
ACTION_NAMES = ["right", "left", "down", "up"]


def main():
    config = get_args(
        [
            "--envs", ENV, "--in-embed", "64", "--seed", "1",
            "--project-name", "validation", "--disable-wandb",
            "--num-envs", "1", "--max-episode-steps", "50",
        ]
    )
    path = sys.argv[1] if len(sys.argv) > 1 else config.policy_path()
    env = make_env(ENV)
    env.max_episode_steps = 50  # the validation run's cap (results CSV)
    agent = Agent(config.agent_config(), env)
    state = agent.init_state(jax.random.PRNGKey(0))
    params = ckpt.load_policy(path, state.params)

    @jax.jit
    def q_last(params, obs_seq, act_seq, row):
        q = agent._q_context(params, obs_seq, act_seq, None)
        return q[0, row]

    for side, side_name in ((0, "heaven RIGHT"), (1, "heaven LEFT")):
        print(f"\n=== side: {side_name} (greedy rollout) ===")
        # Deterministic manual rollout on the tabular model.
        T, O, R = env._T, env._O, env._R
        s = int(np.argmax(env._start) + side * 0)  # junction, side 0 slot
        P = (T.shape[0] - 1) // 2
        s = side * P + 0  # junction on the requested side
        k_ctx = jax.random.PRNGKey(0)
        obs = jnp.zeros((1, 1), jnp.int32)  # junction obs = 0
        context = replay.init_context(
            k_ctx, 1, config.context, tuple(env.obs_shape),
            env.obs_dtype, env.obs_mask, env.num_actions, obs,
        )
        total, done = 0.0, False
        for t in range(config.max_episode_steps or 50):
            q = np.asarray(
                q_last(params, context.obs, context.action,
                       context.last_index[0])
            )
            order = np.argsort(q)[::-1]
            a = int(order[0])
            gap = float(q[order[0]] - q[order[1]])
            pos = s % P
            print(
                f"t={t:2d} pos={pos:2d} q={np.round(q, 3)} "
                f"act={ACTION_NAMES[a]:5s} gap={gap:.4f}"
            )
            s2 = int(np.argmax(T[s, a]))
            r = float(R[s, a, s2])
            total += r
            o = int(np.argmax(O[a, s2]))
            terminated = bool(env._terminal[s2])
            context, *_ = replay.add_transition(
                context,
                jnp.asarray([[o]], jnp.int32),
                jnp.asarray([a], jnp.int32),
                jnp.asarray([r], jnp.float32),
                jnp.asarray([terminated]),
            )
            s = s2
            if terminated:
                done = True
                break
        print(f"return={total} terminated={done}")


if __name__ == "__main__":
    main()
