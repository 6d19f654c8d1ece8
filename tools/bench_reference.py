#!/usr/bin/env python
"""Measure the reference implementation's hot-loop throughput on CPU.

The reference repo (`/root/reference`) can't run end-to-end here (no gym /
wandb in this image), so this harness imports the reference's OWN network
code (`dtqn/networks/dtqn.py` — torch-only imports) plus its ReplayBuffer and
reproduces exactly the per-env-step work of run.py:290-298:
  1 x get_action forward (batch 1, seq <= 50)   [dtqn/agents/dtqn.py:76-107]
+ 1 x train step: buffer sample + 3 forwards (batch 32, seq 50) + backward
  + grad clip + Adam step                       [dtqn/agents/dtqn.py:162-265]

on the headline BASELINE.json config: DiscreteCarFlag obs (continuous, dim 3),
DTQN in_embed 64, context 50, 8 heads, 2 layers, batch 32.

Writes the measured env-steps/s to stdout; paste into BASELINE.md /
bench.py.
"""

import sys
import time

sys.path.insert(0, "/root/reference")

import numpy as np
import torch
import torch.nn.functional as F

from dtqn.networks.dtqn import DTQN  # noqa: E402
from dtqn.buffers.replay_buffer import ReplayBuffer  # noqa: E402

torch.manual_seed(0)
OBS_DIM, N_ACTIONS, CTX, BATCH, EMB = 3, 3, 50, 32, 64
MAX_STEPS = 200

policy = DTQN(OBS_DIM, N_ACTIONS, 8, 0, EMB, 8, 2, CTX, pos="learned", discrete=False)
target = DTQN(OBS_DIM, N_ACTIONS, 8, 0, EMB, 8, 2, CTX, pos="learned", discrete=False)
target.load_state_dict(policy.state_dict())
target.eval()
opt = torch.optim.Adam(policy.parameters(), lr=3e-4)

buf = ReplayBuffer(50_000, OBS_DIM, -5.0, MAX_STEPS, context_len=CTX)
# Fill with synthetic episodes so sampling behaves like steady-state.
for ep in range(60):
    buf.store_obs(np.random.randn(OBS_DIM).astype(np.float32))
    for t in range(MAX_STEPS):
        buf.store(
            np.random.randn(OBS_DIM).astype(np.float32),
            np.random.randint(N_ACTIONS),
            np.random.randn(),
            False,
            t + 1,
        )
    buf.flush()

ctx_obs = torch.randn(1, CTX, OBS_DIM)
ctx_act = torch.randint(0, N_ACTIONS, (1, CTX, 1))


def one_env_step():
    # --- get_action (dtqn/agents/dtqn.py:76-107) ---
    with torch.no_grad():
        q = policy(ctx_obs, ctx_act)
        _ = torch.argmax(q[:, -1, :]).item()
    # --- train (dtqn/agents/dtqn.py:162-265) ---
    obss, actions, rewards, next_obss, next_actions, dones, _ = buf.sample(BATCH)
    obss = torch.as_tensor(obss, dtype=torch.float32)
    next_obss = torch.as_tensor(next_obss, dtype=torch.float32)
    actions = torch.as_tensor(actions, dtype=torch.long)
    next_actions = torch.as_tensor(next_actions, dtype=torch.long)
    rewards = torch.as_tensor(rewards, dtype=torch.float32)
    dones = torch.as_tensor(dones, dtype=torch.long)

    q_values = policy(obss, actions).gather(2, actions).squeeze()
    with torch.no_grad():
        argmax = torch.argmax(policy(next_obss, next_actions), dim=2).unsqueeze(-1)
        next_q = target(next_obss, next_actions).gather(2, argmax).squeeze()
        targets = rewards.squeeze() + (1 - dones.squeeze()) * (next_q * 0.99)
    loss = F.mse_loss(q_values, targets)
    opt.zero_grad(set_to_none=True)
    loss.backward()
    torch.nn.utils.clip_grad_norm_(policy.parameters(), 1.0)
    opt.step()


for _ in range(5):  # warmup
    one_env_step()

N = 60
t0 = time.perf_counter()
for _ in range(N):
    one_env_step()
dt = time.perf_counter() - t0
print(f"reference CPU hot loop: {N / dt:.2f} env-steps/s "
      f"({dt / N * 1000:.1f} ms/step) on {torch.get_num_threads()} threads")
