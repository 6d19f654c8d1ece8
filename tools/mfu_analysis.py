#!/usr/bin/env python
"""MFU / latency-floor analysis for the headline bench config (CPU, exact).

Computes FLOPs per learner update via XLA cost analysis on the REAL
apply_update computation at the bench shapes (DiscreteCarFlag-v0, DTQN
in_embed 64, B=32, L=50, 1:1 update ratio, num_envs 64), then converts
the measured headline throughput into achieved FLOP/s and fraction of
v5e peak.  Defends the claim that the single-run number is a
chip-latency floor, not a compute ceiling (VALIDATION.md).

Caveat: cost_analysis() of the full scanned chunk under-counts (XLA does
not multiply loop-body flops by trip count), so the per-update number is
taken from an unrolled single apply_update lowering.

Usage: python tools/mfu_analysis.py [measured_env_steps_per_s]
"""

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from dtqn_tpu.agents import Agent, AgentConfig  # noqa: E402
from dtqn_tpu.envs import make_env  # noqa: E402

V5E_BF16_PEAK = 197e12
V5E_F32_PEAK = 98.5e12  # bf16 peak / 2 (MXU passes); vector ops lower


def main():
    rate = float(sys.argv[1]) if len(sys.argv) > 1 else 2344.0
    num_envs = 64
    env = make_env("DiscreteCarFlag-v0")
    cfg = AgentConfig(
        model="DTQN", num_envs=num_envs, context_len=50, history=50,
        inner_embed=64, num_heads=8, num_layers=2, batch_size=32,
        buffer_size=500_000, target_update_frequency=10_000,
    )
    agent = Agent(cfg, env)
    state = agent.init_state(jax.random.key(0))
    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(state.params)
    )

    batch = agent.sample_batch(state.buffer, jax.random.key(1))
    upd = (
        jax.jit(lambda s, b, k: agent.apply_update(s, b, k))
        .lower(state, batch, jax.random.key(2))
        .compile()
    )
    ca = upd.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    f_upd = float(ca["flops"])
    bytes_upd = float(ca.get("bytes accessed", float("nan")))

    # Act forward: one greedy forward for all num_envs per iteration,
    # amortized over num_envs env steps (1:1 ratio).
    act = (
        jax.jit(
            lambda p, c: agent.greedy_actions(
                p, c, state.bag, state.carry, state.obs
            )
        )
        .lower(state.params, state.context)
        .compile()
    )
    aa = act.cost_analysis()
    aa = aa[0] if isinstance(aa, list) else aa
    f_act = float(aa["flops"])

    per_step = f_upd + f_act / num_envs
    achieved = per_step * rate
    t_update = 1.0 / rate
    print(f"params: {n_params}")
    print(f"flops/update (fwd+bwd+2 no-grad lanes): {f_upd:.3e}")
    print(f"bytes accessed/update: {bytes_upd:.3e}")
    print(f"flops/act-forward ({num_envs} envs): {f_act:.3e} "
          f"(amortized {f_act / num_envs:.2e}/env-step)")
    print(f"flops per env-step total: {per_step:.3e}")
    print(f"measured rate: {rate:.0f} env-steps/s == updates/s")
    print(f"achieved: {achieved / 1e12:.2f} TFLOP/s")
    print(f"  = {achieved / V5E_BF16_PEAK * 100:.2f}% of v5e bf16 peak")
    print(f"  = {achieved / V5E_F32_PEAK * 100:.2f}% of v5e f32 peak")
    print(f"per-update wall time: {t_update * 1e6:.0f} us; at 50% bf16 "
          f"peak the same math would take "
          f"{f_upd / (0.5 * V5E_BF16_PEAK) * 1e6:.1f} us")
    print(f"bytes-accessed note: {bytes_upd:.2e} B/update is the UNFUSED "
          f"upper bound (CPU lowering counts every op's operands; XLA:TPU "
          f"fuses most intermediates away), so it is not a valid HBM "
          f"roofline.  Real traffic ~ params+grads+opt state "
          f"(~{6 * 4 * n_params / 1e6:.1f} MB/update) + small activations "
          f"-> ~{6 * 4 * n_params / 810e9 * 1e6:.1f} us at 810 GB/s, far "
          f"below the measured {t_update * 1e6:.0f} us.  See the device "
          f"trace (tools/analyze_trace.py) for the kernel-count evidence "
          f"that the chain is launch latency.")


if __name__ == "__main__":
    main()
