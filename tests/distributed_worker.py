"""Worker for the 2-process jax.distributed CPU test (test_sharding.py).

Each process contributes 2 fake CPU devices; the global 4-device "dp" mesh
spans both processes, exercising parallel/distributed.init_distributed and
the DCN-analog path (SURVEY.md §2.5: multi-host via jax.distributed over a
local cluster).  Usage: python distributed_worker.py <pid> <nproc> <port>.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from dtqn_tpu.parallel.distributed import (  # noqa: E402
    init_distributed,
    process_info,
)

init_distributed(f"localhost:{port}", nproc, pid)
info = process_info()
assert info["process_count"] == nproc, info
assert info["global_devices"] == 2 * nproc, info

from dtqn_tpu.agents import Agent, AgentConfig  # noqa: E402
from dtqn_tpu.envs import make_env  # noqa: E402
from dtqn_tpu.parallel.mesh import (  # noqa: E402
    make_distributed_train_chunk,
    make_mesh,
    state_shardings,
)
from dtqn_tpu.train.loop import make_prepopulate_fn  # noqa: E402
from dtqn_tpu.utils.epsilon import EpsilonSchedule  # noqa: E402

n_devices = info["global_devices"]
env = make_env("DiscreteCarFlag-v0")
env.max_episode_steps = 10
cfg = AgentConfig(
    model="DTQN",
    num_envs=2 * n_devices,
    context_len=8,
    history=8,
    inner_embed=32,
    num_heads=4,
    num_layers=1,
    buffer_size=40 * n_devices,
    batch_size=n_devices,
    target_update_frequency=10,
)
agent = Agent(cfg, env)
mesh = make_mesh(n_devices)

# Multi-process state construction: every process traces the same program;
# jit scatters the output onto the global mesh (no host-side global array
# assembly needed).
key = jax.random.key(0)
template = jax.eval_shape(agent._init_state_impl, key)
shardings = state_shardings(agent, template, mesh)
state = jax.jit(agent._init_state_impl, out_shardings=shardings)(key)

prepop = jax.jit(
    make_prepopulate_fn(agent, iters=25),
    in_shardings=(shardings,),
    out_shardings=shardings,
    donate_argnums=(0,),
)
state = prepop(state)

chunk = make_distributed_train_chunk(
    agent,
    EpsilonSchedule(1.0, 0.1, 100),
    updates_per_iter=1,
    iters_per_chunk=2,
    mesh=mesh,
    template_state=template,
)
state = chunk(state)

# Counters are replicated: every process reads its own addressable shard.
train_steps = int(state.train_steps.addressable_shards[0].data)
env_steps = int(state.env_steps.addressable_shards[0].data)
print(
    f"WORKER-OK pid={pid} env_steps={env_steps} train_steps={train_steps}",
    flush=True,
)
assert train_steps > 0 and env_steps > 0
