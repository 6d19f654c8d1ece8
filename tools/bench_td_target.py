#!/usr/bin/env python
"""Measurement-backed build-or-kill for a Pallas TD-target/gather kernel.

SURVEY.md §7 phase 6 names two candidate Pallas kernels: fused attention
(built — ops/pallas_attention.py) and a seq-to-seq TD-target/gather kernel
covering the Bellman tail of learn() (dtqn/agents/dtqn.py:219-241):

    gather(q, action) -> argmax(next_q_policy) -> gather(next_q_target)
    -> r + (1-done)*gamma*next_q -> slice last history -> mse

This script times that op sequence on the real chip three ways:
  1. inside one jit (how it actually runs in learn(): XLA fuses it into
     neighbouring work)
  2. as a standalone jit call (upper bound for any standalone kernel —
     includes one dispatch)
  3. the minimal pallas_call round-trip at the same shapes (what a Pallas
     kernel would pay before doing any work)

Decision rule: if (1) is within dispatch noise of zero and (3) >= (2),
a Pallas kernel cannot win — record the kill in COMPONENTS.md.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B, L, A = 32, 50, 3


def sync(x):
    np.asarray(x)


def timeit(f, *args, n=200):
    f(*args)  # compile
    sync(f(*args))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e6  # us


def td_tail(q_all, next_qp, next_qt, action, reward, done):
    next_act = jnp.argmax(next_qp, axis=-1)
    next_q = jnp.take_along_axis(next_qt, next_act[..., None], axis=-1)[..., 0]
    targets = reward + (1.0 - done) * 0.99 * next_q
    q_taken = jnp.take_along_axis(q_all, action[..., None], axis=-1)[..., 0]
    return jnp.mean(jnp.square(q_taken[:, -L:] - targets[:, -L:]))


def main():
    key = jax.random.key(0)
    ks = jax.random.split(key, 6)
    q_all = jax.random.normal(ks[0], (B, L, A))
    next_qp = jax.random.normal(ks[1], (B, L, A))
    next_qt = jax.random.normal(ks[2], (B, L, A))
    action = jax.random.randint(ks[3], (B, L), 0, A)
    reward = jax.random.normal(ks[4], (B, L))
    done = (jax.random.uniform(ks[5], (B, L)) < 0.1).astype(jnp.float32)
    args = (q_all, next_qp, next_qt, action, reward, done)

    # (2) standalone jit call
    standalone = timeit(jax.jit(td_tail), *args)

    # (1) marginal cost inside a jit that already does surrounding matmuls
    w = jax.random.normal(key, (256, 256))

    @jax.jit
    def with_tail(w, *a):
        x = w @ w
        return x.sum() + td_tail(*a)

    @jax.jit
    def without_tail(w, *a):
        x = w @ w
        return x.sum() + a[0].sum()  # touch an arg, no TD math

    marginal = timeit(with_tail, w, *args) - timeit(without_tail, w, *args)

    # (3) minimal pallas round-trip at the same shapes
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def copy_kernel(q_ref, o_ref):
        o_ref[:] = q_ref[:]

    @jax.jit
    def pallas_noop(q):
        return pl.pallas_call(
            copy_kernel,
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=jax.default_backend() != "tpu",
        )(q)

    pallas_floor = timeit(pallas_noop, q_all)

    print(f"TD tail standalone jit : {standalone:8.1f} us")
    print(f"TD tail marginal fused : {marginal:8.1f} us")
    print(f"pallas no-op floor     : {pallas_floor:8.1f} us")
    verdict = (
        "KILL: XLA-fused TD tail is cheaper than an empty pallas_call"
        if pallas_floor >= marginal
        else "BUILD: a fused kernel could recover measurable time"
    )
    print(verdict)


if __name__ == "__main__":
    main()
