"""Functional DDQN agent core: act / observe / learn as pure functions.

This replaces the reference's stateful agent classes
(`/root/reference/dtqn/agents/dqn.py:24-327`, `drqn.py:13-210`,
`dtqn.py:15-269`) with one generic agent whose behavior is selected by model
kind at build time:

  - "transformer" (DTQN/DTQN-bag): acts on the full context window and takes
    the argmax of the newest timestep's Q (dtqn.py:76-107); trains seq-to-seq
    with the DDQN target and loss over the last ``history`` timesteps
    (dtqn.py:162-269)
  - "feedforward" (DQN): context length 1 (agent_utils.py:109-110)
  - "recurrent" (DRQN/ADRQN/DARQN): acts one step at a time carrying LSTM
    state (agents/drqn.py:88-112); trains over full windows with episode-
    length masking (agents/drqn.py:114-210)

Everything — epsilon-greedy action draws, bag eviction, replay sampling, the
gradient step, target swaps, diagnostics — happens on device inside jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from dtqn_tpu import replay
from dtqn_tpu.envs.core import Environment
from dtqn_tpu.models import RECURRENT_MODELS, build_network, zero_carry
from dtqn_tpu.utils.metrics import TrainDiagnostics


@dataclasses.dataclass(frozen=True)
class AgentConfig:
    """Static hyperparameters (reference defaults from run.py:16-184)."""

    model: str = "DTQN"
    num_envs: int = 1
    # Learning (dqn.py:35-41)
    learning_rate: float = 3e-4
    batch_size: int = 32
    context_len: int = 50
    history: int = 50
    gamma: float = 0.99
    grad_norm_clip: float = 1.0
    target_update_frequency: int = 10_000
    buffer_size: int = 500_000
    # Architecture (run.py:92-175)
    embed_per_obs_dim: int = 8
    action_dim: int = 0
    inner_embed: int = 128
    num_heads: int = 8
    num_layers: int = 2
    dropout: float = 0.0
    gate: str = "res"
    identity: bool = False
    pos: str = "learned"
    bag_size: int = 0
    bag_mask: bool = False  # masked-bag-attention ablation (models/dtqn.py)
    # Train on stored ACT-TIME bags instead of random pre-window subsets —
    # closes the reference's train/act bag-distribution mismatch
    # (replay/buffer.py sample_with_stored_bag; round-5 decline ablation).
    bag_store: bool = False

    @property
    def kind(self) -> str:
        if "DTQN" in self.model:
            return "transformer"
        if self.model in RECURRENT_MODELS:
            return "recurrent"
        return "feedforward"


@struct.dataclass
class AgentState:
    """Complete on-device learner+actor state (one pytree)."""

    params: Any
    target_params: Any
    opt_state: Any
    buffer: replay.BufferState
    context: replay.ContextState
    bag: Optional[replay.BagState]
    carry: Optional[Tuple[jax.Array, jax.Array]]  # recurrent act-time LSTM
    env_state: Any
    obs: jax.Array  # [E, *obs_shape] current observations
    key: jax.Array
    env_steps: jax.Array  # i32
    train_steps: jax.Array  # i32 — gradient updates applied (dqn.py:203)
    epsilon: jax.Array  # f32
    diagnostics: TrainDiagnostics
    nonfinite_grads: jax.Array  # i32 — "error_if_nonfinite" surfaced to host


class Agent:
    """Builds the pure act/observe/learn functions for a config+env pair."""

    def __init__(self, config: AgentConfig, env: Environment):
        if config.model == "DQN" and config.context_len != 1:
            # The factory forces context 1 for DQN (agent_utils.py:109-110).
            config = dataclasses.replace(config, context_len=1)
        if not 1 <= config.history <= config.context_len:
            # Clip history into [1, context_len] (agent_utils.py:101-105).
            config = dataclasses.replace(
                config,
                history=int(min(max(config.history, 1), config.context_len)),
            )
        self.config = config
        self.env = env
        self.network: nn.Module = build_network(
            config.model,
            env,
            embed_per_obs_dim=config.embed_per_obs_dim,
            action_dim=config.action_dim,
            inner_embed=config.inner_embed,
            num_heads=config.num_heads,
            num_layers=config.num_layers,
            context_len=config.context_len,
            dropout=config.dropout,
            gate=config.gate,
            identity=config.identity,
            pos=config.pos,
            bag_size=config.bag_size,
            bag_mask=config.bag_mask,
        )
        # optax.flatten ravels the ~20-leaf param tree into one contiguous
        # vector so clip+Adam run as a handful of fused kernels instead of
        # 3 micro-kernels per leaf — the train step is latency-bound on its
        # sequential op chain at DTQN sizes (~100k params).
        self.tx = optax.flatten(
            optax.chain(
                optax.clip_by_global_norm(config.grad_norm_clip),
                optax.adam(config.learning_rate),
            )
        )
        self.use_bag = "DTQN" in config.model and config.bag_size > 0
        self.store_act_bags = self.use_bag and config.bag_store

    # ------------------------------------------------------------------ init
    def _init_params(self, key: jax.Array):
        cfg, env = self.config, self.env
        b, length = 2, cfg.context_len
        obss = jnp.zeros((b, length, *env.obs_shape), env.obs_dtype)
        actions = jnp.zeros((b, length), jnp.int32)
        if cfg.kind == "transformer":
            if self.use_bag:
                bag_o = jnp.zeros((b, cfg.bag_size, *env.obs_shape), env.obs_dtype)
                bag_a = jnp.zeros((b, cfg.bag_size), jnp.int32)
                return self.network.init(key, obss, actions, bag_o, bag_a)
            return self.network.init(key, obss, actions)
        if cfg.kind == "feedforward":
            return self.network.init(key, obss[:, :1])
        return self.network.init(key, obss, actions)

    def init_state(
        self, key: jax.Array, external_obs: Optional[jax.Array] = None
    ) -> AgentState:
        """Build the initial state under jit (eager init is ~30x slower on
        a tunneled TPU: one dispatch per array op).

        ``external_obs`` supports HOST environments (train/host_loop.py):
        the caller supplies the reset observations and ``env_state`` stays
        None (the env's state lives host-side).
        """
        if external_obs is None:
            return jax.jit(self._init_state_impl)(key)
        return jax.jit(self._init_state_impl)(key, jnp.asarray(external_obs))

    def _init_state_impl(
        self, key: jax.Array, external_obs: Optional[jax.Array] = None
    ) -> AgentState:
        cfg, env = self.config, self.env
        key, k_params, k_env, k_ctx = jax.random.split(key, 4)
        params = self._init_params(k_params)
        if external_obs is None:
            obs, env_state = env.reset_vec(
                jax.random.split(k_env, cfg.num_envs)
            )
        else:
            obs, env_state = external_obs, None
        context = replay.init_context(
            k_ctx,
            cfg.num_envs,
            cfg.context_len,
            tuple(env.obs_shape),
            env.obs_dtype,
            env.obs_mask,
            env.num_actions,
            obs,
        )
        bag = (
            replay.init_bag(
                cfg.num_envs,
                cfg.bag_size,
                tuple(env.obs_shape),
                env.obs_dtype,
                env.obs_mask,
            )
            if self.use_bag
            else None
        )
        carry = (
            zero_carry(cfg.num_envs, cfg.inner_embed)
            if cfg.kind == "recurrent"
            else None
        )
        buffer = replay.init_buffer(
            num_envs=cfg.num_envs,
            buffer_size=cfg.buffer_size,
            max_episode_steps=env.max_episode_steps,
            context_len=cfg.context_len,
            obs_shape=tuple(env.obs_shape),
            obs_dtype=env.obs_dtype,
            obs_mask=env.obs_mask,
            act_bag_size=cfg.bag_size if self.store_act_bags else 0,
        )
        buffer = replay.store_first_obs(
            buffer, obs, jnp.ones((cfg.num_envs,), bool), env.obs_mask
        )
        return AgentState(
            params=params,
            target_params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=self.tx.init(params),
            buffer=buffer,
            context=context,
            bag=bag,
            carry=carry,
            env_state=env_state,
            obs=obs,
            key=key,
            env_steps=jnp.int32(0),
            train_steps=jnp.int32(0),
            epsilon=jnp.float32(1.0),
            diagnostics=TrainDiagnostics.create(100),
            nonfinite_grads=jnp.int32(0),
        )

    # ------------------------------------------------------------- forwards
    def _q_context(
        self, params, obs_seq, act_seq, bag, ep_len=None, dropout_key=None
    ):
        """Seq-to-seq Q over [B, L] windows; returns [B, L, A].

        ``dropout_key`` enables stochastic dropout — the training-mode
        forward (the reference's eval_off/net.train(), dqn.py:113-115);
        acting and target evaluation stay deterministic.
        """
        cfg = self.config
        kwargs = {}
        if dropout_key is not None and cfg.dropout > 0.0:
            kwargs = dict(
                deterministic=False, rngs={"dropout": dropout_key}
            )
        if cfg.kind == "transformer":
            if self.use_bag:
                return self.network.apply(
                    params, obs_seq, act_seq, bag[0], bag[1], **kwargs
                )
            return self.network.apply(params, obs_seq, act_seq, **kwargs)
        if cfg.kind == "feedforward":
            return self.network.apply(params, obs_seq, **kwargs)
        q, _ = self.network.apply(
            params, obs_seq, act_seq, episode_lengths=ep_len, **kwargs
        )
        return q

    def greedy_actions(
        self, params, context: replay.ContextState, bag, carry, obs
    ):
        """Greedy action for every env from its current context.

        Returns (actions [E], new_carry).  Transformer path: Q of the newest
        row of the full padded context — causality makes this identical to
        the reference's truncated forward (dtqn.py:81-107).
        """
        cfg = self.config
        if cfg.kind == "transformer":
            bag_in = (bag.obs, bag.action) if self.use_bag else None
            q = self._q_context(params, context.obs, context.action, bag_in)
            rows = context.last_index
            q_last = q[jnp.arange(q.shape[0]), rows]
            return jnp.argmax(q_last, axis=-1), carry
        if cfg.kind == "feedforward":
            q = self.network.apply(params, obs[:, None])
            return jnp.argmax(q[:, 0], axis=-1), carry
        # Recurrent: one step with carry, fed (newest obs, last action)
        # (agents/drqn.py:88-107).
        rows = context.last_index
        e = jnp.arange(obs.shape[0])
        last_action = context.action[e, rows]
        q, new_carry = self.network.apply(
            params, obs[:, None], last_action[:, None], carry=carry
        )
        return jnp.argmax(q[:, 0], axis=-1), new_carry

    def select_actions(self, state: AgentState, key, epsilon):
        """Epsilon-greedy (dqn.py:117-131)."""
        k_eps, k_rand = jax.random.split(key)
        greedy, carry = self.greedy_actions(
            state.params, state.context, state.bag, state.carry, state.obs
        )
        explore = (
            jax.random.uniform(k_eps, (self.config.num_envs,)) < epsilon
        )
        randoms = jax.random.randint(
            k_rand, (self.config.num_envs,), 0, self.env.num_actions
        )
        return jnp.where(explore, randoms, greedy), carry

    # ------------------------------------------------------------ bag logic
    def _bag_evict(
        self, params, context, bag, evicted_obs, evicted_act, evicted_idx,
        need,
    ):
        """Q-driven bag eviction (dtqn/agents/dtqn.py:125-157), vectorized.

        For envs where the bag rejected the evicted pair, score bag_size+1
        candidate bags (replace slot i / drop the evictee) by mean-over-seq
        of max-over-action Q and keep the argmax.  ``evicted_idx`` is the
        evictee's episode obs index, tracked alongside for --bag-store.
        """
        cfg = self.config
        e_count, bag_size = bag.obs.shape[0], cfg.bag_size
        n_cand = bag_size + 1
        # [E, n_cand, bag, ...]
        cand_obs = jnp.broadcast_to(
            bag.obs[:, None], (e_count, n_cand, *bag.obs.shape[1:])
        )
        cand_act = jnp.broadcast_to(
            bag.action[:, None], (e_count, n_cand, bag_size)
        )
        cand_idx = jnp.broadcast_to(
            bag.obs_idx[:, None], (e_count, n_cand, bag_size)
        )
        slot = jnp.arange(n_cand)[None, :, None]  # candidate i replaces slot i
        replace = slot == jnp.arange(bag_size)[None, None, :]
        obs_nd = (1,) * (bag.obs.ndim - 2)
        cand_obs = jnp.where(
            replace.reshape(1, n_cand, bag_size, *obs_nd),
            evicted_obs[:, None, None],
            cand_obs,
        )
        cand_act = jnp.where(replace, evicted_act[:, None, None], cand_act)
        cand_idx = jnp.where(replace, evicted_idx[:, None, None], cand_idx)

        tile = lambda x: jnp.repeat(x, n_cand, axis=0)
        q = self.network.apply(
            params,
            tile(context.obs),
            tile(context.action),
            cand_obs.reshape(e_count * n_cand, bag_size, *bag.obs.shape[2:]),
            cand_act.reshape(e_count * n_cand, bag_size),
        )
        score = q.max(axis=-1).mean(axis=-1).reshape(e_count, n_cand)
        best = jnp.argmax(score, axis=-1)  # [E]
        e = jnp.arange(e_count)
        chosen_obs = cand_obs[e, best]
        chosen_act = cand_act[e, best]
        chosen_idx = cand_idx[e, best]

        def pick(new, old):
            cond = need.reshape((-1,) + (1,) * (old.ndim - 1))
            return jnp.where(cond, new, old)

        return bag.replace(
            obs=pick(chosen_obs, bag.obs),
            action=pick(chosen_act, bag.action),
            obs_idx=pick(chosen_idx, bag.obs_idx),
        )

    def observe(
        self,
        state: AgentState,
        action,
        next_obs,
        reward,
        buffer_done,
    ) -> AgentState:
        """Context append + bag insertion + replay store (dtqn.py:116-160)."""
        context, ev_obs, ev_act, was_full = replay.add_transition(
            state.context, next_obs, action, reward, buffer_done
        )
        bag = state.bag
        if self.use_bag:
            # Evicted entry = the context's oldest: episode obs index t - L
            # where t is the just-incremented transition count.
            ev_idx = context.timestep - self.config.context_len
            bag, accepted = replay.bag_add(bag, ev_obs, ev_act, ev_idx, was_full)
            overflow = jnp.logical_and(was_full, jnp.logical_not(accepted))
            bag = self._bag_evict(
                state.params, context, bag, ev_obs, ev_act, ev_idx, overflow
            )
        buffer = replay.store_step(
            state.buffer, next_obs, action, reward, buffer_done
        )
        if self.store_act_bags:
            buffer = replay.store_act_bag(buffer, bag.obs_idx, bag.action)
        return state.replace(context=context, bag=bag, buffer=buffer)

    def handle_resets(
        self, state: AgentState, key, done, reset_obs
    ) -> AgentState:
        """Flush finished episodes and start fresh context/bag/carry
        (run.py:293-296 + context_reset dtqn.py:109-114)."""
        cfg = self.config
        buffer = replay.flush(state.buffer, done)
        buffer = replay.store_first_obs(
            buffer, reset_obs, done, self.env.obs_mask
        )
        context = replay.reset_context(
            state.context, key, reset_obs, done, self.env.obs_mask,
            self.env.num_actions,
        )
        bag = (
            replay.reset_bag(state.bag, done, self.env.obs_mask)
            if self.use_bag
            else state.bag
        )
        carry = state.carry
        if carry is not None:
            zero = zero_carry(cfg.num_envs, cfg.inner_embed)
            carry = jax.tree_util.tree_map(
                lambda z, c: jnp.where(done[:, None], z, c), zero, carry
            )
        return state.replace(
            buffer=buffer, context=context, bag=bag, carry=carry
        )

    # ---------------------------------------------------------------- learn
    def sample_batch(self, buffer: replay.BufferState, key):
        """Draw one training batch from a (frozen) buffer.

        Split from the update so the train loop can presample all of an
        iteration's batches in ONE vmapped gather: the buffer does not
        change between the iteration's gradient steps (no env steps
        interleave, train/loop.py), so batch distribution is identical to
        sampling inside the update chain — the reference's
        sample-then-update per step (dtqn.py:163-194) with the sampling
        hoisted off the sequential latency path.
        """
        cfg = self.config
        if self.store_act_bags:
            return replay.sample_with_stored_bag(
                buffer, key, cfg.batch_size, cfg.context_len,
                self.env.obs_mask,
            )
        if self.use_bag:
            return replay.sample_with_bag(
                buffer, key, cfg.batch_size, cfg.context_len,
                cfg.bag_size, self.env.obs_mask,
            )
        return replay.sample(buffer, key, cfg.batch_size, cfg.context_len)

    def learn(self, state: AgentState, key) -> AgentState:
        """One gated DDQN gradient step (dtqn.py:162-269, dqn.py:142-206)."""
        key, k_sample = jax.random.split(key)
        batch = self.sample_batch(state.buffer, k_sample)
        return self.apply_update(state, batch, key)

    def apply_update(self, state: AgentState, batch, key) -> AgentState:
        """The gradient step on a presampled batch (dtqn.py:196-269)."""
        cfg = self.config
        ok = replay.can_sample(state.buffer, cfg.batch_size)
        key, k_drop, k_drop_t = jax.random.split(key, 3)
        bag_in = (
            (batch.bag_obs, batch.bag_action) if self.use_bag else None
        )

        hist = cfg.history

        # DDQN target: policy-net argmax selector, target-net value
        # (dtqn.py:221-238).  Policy and target params share a structure,
        # so both no-grad forwards run as ONE 2-lane vmapped call over
        # stacked params.  Measured on the v5e chip at bench shapes
        # (B=32, L=50, D=64), this structure — 2-lane no-grad + separate
        # B-batch loss forward — is the fastest of three designs (2345
        # env-steps/s vs 2145 for a 2B batch-concat loss+selector forward
        # and 2020 for a 3-lane stacked fuse): anything that widens the
        # DIFFERENTIATED forward widens the backward with it, and at these
        # shapes execution time scales with batch, so the no-grad lanes
        # must stay out of the grad path.  Each lane draws its own dropout
        # mask (torch train-mode no_grad forwards, dqn.py:113-115).
        stacked = jax.tree_util.tree_map(
            lambda p, t: jnp.stack([p, t]), state.params, state.target_params
        )
        next_q_both = jax.vmap(
            lambda p, k: self._q_context(
                p, batch.next_obs, batch.next_action, bag_in, batch.ep_len,
                dropout_key=k,
            )
        )(stacked, jax.random.split(k_drop_t))
        next_q_policy, next_q_target = next_q_both[0], next_q_both[1]
        next_act = jnp.argmax(next_q_policy, axis=-1)
        next_q = jnp.take_along_axis(
            next_q_target, next_act[..., None], axis=-1
        )[..., 0].astype(jnp.float32)  # Bellman math stays f32 under bf16
        dones = batch.done.astype(jnp.float32)
        targets = batch.reward + (1.0 - dones) * cfg.gamma * next_q

        def loss_fn(params):
            q_all = self._q_context(
                params, batch.obs, batch.action, bag_in, batch.ep_len,
                dropout_key=k_drop,
            )
            q_taken = jnp.take_along_axis(
                q_all, batch.action[..., None], axis=-1
            )[..., 0].astype(jnp.float32)
            q_h = q_taken[:, -hist:]
            t_h = jax.lax.stop_gradient(targets[:, -hist:])
            loss = jnp.mean(jnp.square(q_h - t_h))
            return loss, (q_h, t_h)

        (loss, (q_h, t_h)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        gnorm = optax.global_norm(grads)
        updates, new_opt_state = self.tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)

        # Apply only when sampling was legal (dqn.py:144-145).
        finite = jnp.isfinite(gnorm)
        apply = jnp.logical_and(ok, finite)
        sel = lambda a, b: jax.tree_util.tree_map(
            lambda x, y: jnp.where(apply, x, y), a, b
        )
        params = sel(new_params, state.params)
        opt_state = sel(new_opt_state, state.opt_state)
        train_steps = state.train_steps + apply.astype(jnp.int32)

        # Hard target swap every target_update_frequency applied steps
        # (dqn.py:205-210).
        swap = jnp.logical_and(
            apply, train_steps % cfg.target_update_frequency == 0
        )
        target_params = jax.tree_util.tree_map(
            lambda p, t: jnp.where(swap, p, t), params, state.target_params
        )

        diagnostics = state.diagnostics.update(
            apply, td=loss, gnorm=gnorm, q=q_h, targets=t_h
        )
        nonfinite = state.nonfinite_grads + jnp.logical_and(
            ok, jnp.logical_not(finite)
        ).astype(jnp.int32)
        return state.replace(
            params=params,
            target_params=target_params,
            opt_state=opt_state,
            train_steps=train_steps,
            diagnostics=diagnostics,
            nonfinite_grads=nonfinite,
        )
