#!/usr/bin/env python
"""Build a resumable stacked sweep checkpoint from per-seed policy snapshots.

Why: a sweep that ran to completion under the pre-round-3 code saved only
per-seed policy params (no full stacked state), so it cannot be extended
past its original --num-steps by a plain resume.  This tool reconstructs
the stacked ``AgentState`` exactly as ``run_sweep`` builds it, loads each
seed's saved policy into BOTH params and target_params, prepopulates the
replay buffers with random experience, pins the step counters to the
completed budget, and writes the stacked checkpoint + mini checkpoint
under the sweep key.  ``run.py --seeds ... --num-steps <larger>`` then
resumes from it.

Continuation caveat (documented wherever results are reported): replay
buffer and optimizer state are REBUILT, not restored — the continuation
is a warm restart of the same policy, not a bit-exact resume.

Usage:
  python tools/seed_sweep_checkpoint.py --envs gv_memory.7x7.yaml \
      --seeds 1 2 3 4 5 --at-step 2001792 [other run.py flags]

Round-5 curriculum mode:
  --from-envs <name...>  load the per-seed policies saved under a
      DIFFERENT env's run name (e.g. gv_memory.7x7.yaml+fspawn) while
      building the checkpoint for --envs.  Obs/action shapes must match
      (the +fspawn reset-rule variants do).  This is the spawn-curriculum
      phase handoff: train on the easy distribution, fine-tune on the
      original one.
  --from-project <name>  project-name the source policies live under
      (defaults to the target --project-name).
  --restart-epsilon <f>  pin state.epsilon at the restart (default keeps
      the fresh-init 1.0; fine-tunes want the annealed floor 0.1).
"""

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import sys

import jax
import jax.numpy as jnp

from dtqn_tpu.agents import Agent
from dtqn_tpu.config import get_args
from dtqn_tpu.ops.attention import set_attention_impl
from dtqn_tpu.train.loop import make_prepopulate_fn
from dtqn_tpu.train.runner import build_envs
from dtqn_tpu.train.sweep import sweep_path
from dtqn_tpu.utils import checkpoint as ckpt
from dtqn_tpu.utils.rng import seed_everything
import dataclasses


def main():
    argv = sys.argv[1:]

    def pop_opt(flag, nargs=1):
        if flag not in argv:
            return None
        i = argv.index(flag)
        if nargs == "+":
            j = i + 1
            while j < len(argv) and not argv[j].startswith("--"):
                j += 1
            vals = argv[i + 1 : j]
            del argv[i:j]
            return vals
        vals = argv[i + 1 : i + 1 + nargs]
        del argv[i : i + 1 + nargs]
        return vals[0] if nargs == 1 else vals

    at_step = int(pop_opt("--at-step"))
    from_envs = pop_opt("--from-envs", nargs="+")
    from_project = pop_opt("--from-project")
    restart_epsilon = pop_opt("--restart-epsilon")
    config = get_args(argv)
    seeds = config.seeds
    assert len(seeds) > 1, "needs --seeds with >1 seed"
    set_attention_impl(config.attention)

    env, _ = build_envs(config)
    if config.max_episode_steps > 0:
        env.max_episode_steps = config.max_episode_steps
    agent = Agent(config.agent_config(), env)

    keys = jnp.stack([seed_everything(s) for s in seeds])
    states = jax.jit(jax.vmap(agent._init_state_impl))(keys)

    # Load each seed's final policy into params AND target_params.
    # --from-envs redirects the SOURCE run name (curriculum handoff).
    params_list = []
    for s in seeds:
        c = dataclasses.replace(config, seed=s)
        if from_envs is not None:
            c = dataclasses.replace(c, envs=list(from_envs))
        if from_project is not None:
            c = dataclasses.replace(c, project_name=from_project)
        one = jax.tree_util.tree_map(lambda x: x[0], states.params)
        params_list.append(ckpt.load_policy(c.policy_path(), one))
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *params_list
    )
    # Distinct buffers for target_params: the donated prepop/chunk calls
    # reject aliased arguments (same rule as zero_carry, CLAUDE.md).
    stacked_t = jax.tree_util.tree_map(jnp.copy, stacked)
    states = states.replace(params=stacked, target_params=stacked_t)

    prepop_iters = max(config.prepop_steps // config.num_envs, 1)
    prepop = jax.jit(
        jax.vmap(make_prepopulate_fn(agent, prepop_iters)),
        donate_argnums=(0,),
    )
    states = prepop(states)

    n = len(seeds)
    states = states.replace(
        env_steps=jnp.full((n,), at_step, jnp.int32),
        train_steps=jnp.full((n,), at_step, jnp.int32),
    )
    if restart_epsilon is not None:
        states = states.replace(
            epsilon=jnp.full((n,), float(restart_epsilon), jnp.float32)
        )

    ck_path = sweep_path(config, seeds)
    _os.makedirs(config.policy_dir(), exist_ok=True)
    ckpt.save_checkpoint(ck_path, states)
    ckpt.save_mini_checkpoint(ck_path, at_step, None)
    print(
        f"stacked continuation checkpoint written at step {at_step} "
        f"for seeds {list(seeds)}: {ck_path}"
    )


if __name__ == "__main__":
    main()
