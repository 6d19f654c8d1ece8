#!/usr/bin/env python
"""Headline benchmark: Car Flag DTQN env-steps/s at the reference's 1:1
update ratio, on the default JAX platform (TPU when present).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Config matches BASELINE.json's headline row: DiscreteCarFlag-v0, DTQN
in_embed 64, context 50, 8 heads, 2 layers, batch 32 — and keeps the
reference's data/update ratio of exactly 1 gradient step per env step
(run.py:290-298), so "env-steps/s" also equals learner updates/s.

Baseline: the reference PyTorch hot loop measured on this host's CPU by
tools/bench_reference.py (get_action forward + full DDQN train step per env
step): 0.68 env-steps/s.

Optional modes (the default line stays the driver contract):
  --bag N    DTQN-bag path (bag cross-attention + Q-driven eviction +
             sample_with_bag) on gv_memory.7x7 at bag size N
  --seeds N  vmapped N-seed sweep: aggregate env-steps/s per chip
  --bf16     bfloat16 compute dtype

The default (flagless) invocation also measures the two chip-utilization
variants — the vmapped 5-seed aggregate and bf16 — in subprocesses and
reports them inside the same single JSON line under "extra" (each entry
is env-steps/s, or an error string if that variant failed).  Pass
--no-extras for the headline number alone.
"""

import json
import sys
import time

import jax
import numpy as np

REFERENCE_CPU_STEPS_PER_S = 0.68  # tools/bench_reference.py on this host


def sync(state):
    """Synchronize by transferring data-dependent scalars.

    On the axon TPU platform ``block_until_ready`` can return before the
    computation finishes (and pure counters like env_steps are hoistable),
    so timing must fetch values that depend on the full learn chain.
    """
    _ = int(np.asarray(state.train_steps).sum())
    _ = float(
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]).ravel()[0]
    )


def main():
    from dtqn_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from dtqn_tpu.agents import Agent, AgentConfig
    from dtqn_tpu.envs import make_env
    from dtqn_tpu.train.loop import (
        make_prepopulate_fn,
        make_train_chunk_fn,
    )
    from dtqn_tpu.utils.epsilon import EpsilonSchedule

    argv = sys.argv[1:]
    if "--cpu" in argv:
        # Testing hook: the axon sitecustomize overrides JAX_PLATFORMS, so
        # CPU runs need the config update (see CLAUDE.md).
        jax.config.update("jax_platforms", "cpu")

    def opt(flag, default):
        return int(argv[argv.index(flag) + 1]) if flag in argv else default

    bag = opt("--bag", 0)
    n_seeds = opt("--seeds", 1)
    presample = opt("--presample", -1)  # -1 auto, 0 off, 1 on
    # Round-5 measured defaults (probe logs in policies/r5_queue/queue.log):
    # update-scan unroll 8 + outer iteration-scan unroll 2 = 2,732 env-
    # steps/s vs 2,609 (unroll 8 alone), 2,472 (outer 4 — too far), 2,563
    # (round-4 unroll-4 default).  The outer unroll lets XLA fuse an
    # iteration's trailing update ops with the next iteration's act path.
    unroll = opt("--unroll", 8)  # update-scan unroll factor
    outer_unroll = opt("--outer-unroll", 2)  # outer iteration-scan unroll
    if "--attention" in argv:
        from dtqn_tpu.ops.attention import set_attention_impl

        set_attention_impl(argv[argv.index("--attention") + 1])
    if "--bf16" in argv:
        from dtqn_tpu.models.init import set_compute_dtype

        set_compute_dtype("bfloat16")

    num_envs = 64
    if bag > 0:
        env = make_env("gv_memory.7x7.yaml")
        metric = f"gv7x7_dtqn_bag{bag}_env_steps_per_s_1to1_updates"
        in_embed = 128  # README.md:116-117 (128 for gridverse)
    else:
        env = make_env("DiscreteCarFlag-v0")
        metric = "carflag_dtqn_env_steps_per_s_1to1_updates"
        in_embed = 64
    if n_seeds > 1:
        metric += f"_x{n_seeds}seeds"

    cfg = AgentConfig(
        model="DTQN",
        num_envs=num_envs,
        context_len=50,
        history=50,
        inner_embed=in_embed,
        num_heads=8,
        num_layers=2,
        batch_size=32,
        buffer_size=500_000,
        target_update_frequency=10_000,
        bag_size=bag,
    )
    agent = Agent(cfg, env)

    prepop_fn = make_prepopulate_fn(agent, iters=max(40_000 // num_envs, 1))
    iters = 50  # x num_envs env steps per chunk, 1 update per env step
    chunk_fn = make_train_chunk_fn(
        agent,
        EpsilonSchedule(1.0, 0.1, 200_000),
        updates_per_iter=num_envs,
        iters_per_chunk=iters,
        presample=None if presample < 0 else bool(presample),
        unroll=unroll,
        outer_unroll=outer_unroll,
    )
    if n_seeds > 1:
        keys = jax.numpy.stack(
            [jax.random.key(s) for s in range(n_seeds)]
        )
        state = jax.jit(jax.vmap(agent._init_state_impl))(keys)
        prepop = jax.jit(jax.vmap(prepop_fn), donate_argnums=(0,))
        chunk = jax.jit(jax.vmap(chunk_fn), donate_argnums=(0,))
    else:
        state = agent.init_state(jax.random.key(0))
        prepop = jax.jit(prepop_fn, donate_argnums=(0,))
        chunk = jax.jit(chunk_fn, donate_argnums=(0,))

    # Enough prepopulation that learn() steps actually apply.
    state = prepop(state)
    assert int(np.min(state.buffer.flushed_total)) > cfg.batch_size

    state = chunk(state)  # compile + warmup
    sync(state)

    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        state = chunk(state)
        sync(state)
        best = min(best, time.perf_counter() - t0)
    assert int(np.min(state.train_steps)) > 0
    assert int(np.max(state.nonfinite_grads)) == 0

    value = iters * num_envs * n_seeds / best
    line = {
        "metric": metric,
        "value": round(value, 1),
        "unit": "env-steps/s (== learner updates/s)",
        "vs_baseline": round(value / REFERENCE_CPU_STEPS_PER_S, 1),
    }

    # Flagless run: measure the chip-utilization variants too (VERDICT r2
    # item 3a) — subprocesses so the set-once compute-dtype/attention
    # globals and jit caches stay isolated per variant.
    default_mode = not [a for a in argv if a != "--cpu"]
    if default_mode:
        extra = {}
        passthrough = ["--cpu"] if "--cpu" in argv else []
        for name, flags in (
            ("aggregate_5seeds", ["--seeds", "5"]),
            ("bf16", ["--bf16"]),
        ):
            extra[name] = _run_extra(
                [sys.executable, __file__, *flags, "--no-extras",
                 *passthrough]
            )
        line["extra"] = extra
    print(json.dumps(line))


def _run_extra(cmd, soft_deadline_s=1500.0):
    """Run one extras variant without ever SIGKILLing a TPU-attached child.

    A hard kill of a process blocked inside a device call can wedge the
    TPU grant for subsequent jobs (measured, CLAUDE.md), which round 3's
    ``subprocess.run(timeout=...)`` risked.  Instead: poll to a soft
    deadline, send one SIGTERM, give it a grace minute, then ABANDON the
    child (leave it running, report the timeout) so the flagless bench —
    the driver contract — always exits promptly with its headline.
    """
    import subprocess
    import threading

    try:
        child = subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True
        )
    except Exception as e:  # noqa: BLE001 - report, don't fail bench
        return f"error: {type(e).__name__}: {e}"[:120]
    # Drain stdout from a thread while polling: a child that writes more
    # than the OS pipe buffer (~64KB) before exiting would otherwise block
    # on write and be misreported as a timeout (round-4 advisor finding).
    chunks = []
    reader = threading.Thread(
        target=lambda: chunks.append(child.stdout.read()), daemon=True
    )
    reader.start()
    deadline = time.monotonic() + soft_deadline_s
    while child.poll() is None and time.monotonic() < deadline:
        time.sleep(2.0)
    if child.poll() is None:
        child.terminate()  # soft; a stalled device call may ignore it
        grace = time.monotonic() + 60.0
        while child.poll() is None and time.monotonic() < grace:
            time.sleep(2.0)
        if child.poll() is None:
            return "error: timeout (child left running, not SIGKILLed)"
        return "error: soft-timeout (child SIGTERMed after deadline)"
    try:
        reader.join(timeout=30.0)
        out = "".join(chunks)
        last = out.strip().splitlines()[-1]
        return json.loads(last)["value"]
    except Exception as e:  # noqa: BLE001
        return f"error: {type(e).__name__}: {e}"[:120]


if __name__ == "__main__":
    main()
