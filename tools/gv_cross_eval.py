#!/usr/bin/env python
"""Cross-evaluate gv ablation-arm policies across reset distributions.

E.g. a policy trained on gv_memory.7x7.yaml+fspawn (spawns facing the
beacon) evaluated on the plain random-spawn env shows how much of its
skill is pure memory vs beacon-seeking — the diagnostic cell for the
round-4 reconstruction-ablation writeup.

Usage:
  python tools/gv_cross_eval.py <train_env> <eval_env> [episodes] [--cpu]
e.g.
  python tools/gv_cross_eval.py 'gv_memory.7x7.yaml+fspawn' \
      'gv_memory.7x7.yaml' 100
"""

import glob
import os as _os
import re
import sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    import jax

    args = [a for a in sys.argv[1:] if a != "--cpu"]
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    train_env_name, eval_env_name = args[0], args[1]
    episodes = int(args[2]) if len(args) > 2 else 100
    project = args[3] if len(args) > 3 else "r4ablate"

    from dtqn_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    import numpy as np

    from dtqn_tpu.agents import Agent, AgentConfig
    from dtqn_tpu.envs import make_env
    from dtqn_tpu.train.loop import make_evaluate_fn
    from dtqn_tpu.utils import checkpoint as ckpt

    train_env = make_env(train_env_name)
    eval_env = make_env(eval_env_name)
    if train_env.obs_shape != eval_env.obs_shape or (
        train_env.obs_mask != eval_env.obs_mask
    ):
        raise SystemExit("variants have incompatible obs spaces")

    cfg = AgentConfig(num_envs=1, inner_embed=128)
    agent = Agent(cfg, train_env)

    pat = _os.path.join(
        _REPO, "policies", project, train_env_name,
        "*bag=0_seed=*_policy.msgpack"
        if project == "sweep" else "*seed=*_policy.msgpack",
    )
    files = sorted(
        glob.glob(pat),
        key=lambda p: int(re.search(r"seed=(\d+)_", p).group(1)),
    )
    if not files:
        raise SystemExit(f"no policies under {pat}")

    evaluate = jax.jit(make_evaluate_fn(agent, eval_env, episodes))
    template = agent._init_params(jax.random.key(0))
    print(f"| trained on | evaluated on | seed | SR ({episodes} eps) |")
    print("|---|---|---|---|")
    for path in files:
        seed = int(re.search(r"seed=(\d+)_", path).group(1))
        # load_policy appends the suffix itself.
        params = ckpt.load_policy(path[: -len("_policy.msgpack")], template)
        sr, ret, ln = evaluate(params, jax.random.key(1000 + seed))
        print(
            f"| {train_env_name} | {eval_env_name} | {seed} "
            f"| {float(np.asarray(sr)):.2f} |"
        )


if __name__ == "__main__":
    main()
