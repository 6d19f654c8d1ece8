"""dtqn_tpu — a TPU-native Deep Transformer Q-Network framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of kevslinger/DTQN
(arXiv 2206.01078).  Everything hot lives on device inside jitted steps:
vectorized pure-function POMDP environments, an episode-major replay ring
buffer in HBM, transformer Q-networks with persistent-memory bag
cross-attention, and a fused rollout+learn training step.  The host only does
configuration, logging, and checkpoint I/O.

Package layout:
  envs/      pure-function environments (CarFlag, Memory cards, tabular
             POMDPs, Gridverse memory) with auto-reset + time-limit semantics
  models/    flax Q-networks: DTQN (+bag), DQN, DRQN, ADRQN, DARQN
  replay/    on-device episode-major ring buffer, rolling Context, Bag
  agents/    functional agent states + act/observe/train transitions
  train/     jitted rollout+learn loop, evaluation, experiment runner
  ops/       Pallas TPU kernels (fused causal attention, TD targets)
  parallel/  device-mesh sharding (DP over chips, envs over hosts)
  utils/     epsilon schedules, logging, checkpointing, metrics
"""

__version__ = "0.1.0"

from dtqn_tpu import envs, models, replay, agents, utils  # noqa: F401
