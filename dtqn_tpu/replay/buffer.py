"""Episode-major replay ring buffer living in HBM.

Capability parity with `/root/reference/dtqn/buffers/replay_buffer.py:8-264`,
re-designed for fixed shapes and vectorized writers:

  - storage is episode-major: ``obs[R, T+1, ...]`` keeps s and s' in one
    array (replay_buffer.py:36-54); actions get the same +1 slot; rewards /
    dones are [R, T]; dones initialize all-True so padded tails never
    bootstrap (replay_buffer.py:65)
  - the FIFO of `max_size = buffer_size // max_episode_steps` episodes
    (replay_buffer.py:27) becomes a ring of rows partitioned per env
    instance, so E vectorized actors write without contention — the
    multi-writer generalization of the single `pos = [episode, step]` cursor
  - the in-progress episode is excluded from sampling (replay_buffer.py:
    141-145) via a per-row validity bit: set on flush, cleared when a row is
    cleansed for reuse (replay_buffer.py:88-92,97-135)
  - ``sample`` draws a uniform valid episode + a uniform context-window
    start in [0, max(0, ep_len - L)] per sample (replay_buffer.py:146-168)
  - ``sample_with_bag`` additionally builds fixed-shape per-sample bags from
    pre-window observations: all of them if fewer than ``bag_size``,
    otherwise a uniform random subset (replay_buffer.py:171-264) — realized
    as a masked top-k over random scores instead of per-sample rejection
    loops
  - ``store_act_bag`` / ``sample_with_stored_bag`` (``--bag-store``, beyond
    reference parity): record the ACT-TIME bag — the one the greedy
    eviction policy actually built (`dtqn/agents/dtqn.py:125-157`) — per
    timestep as (episode obs index, action) pairs, and train on the stored
    bag of the sampled window's last acting step instead of the
    reference's uniform random pre-window subset.  This closes the
    reference design's train/act bag-distribution mismatch (the round-4
    candidate cause of the DTQN-bag late decline); entries store indices,
    not observations, so the overhead is two small int32 arrays
  - episode lengths are int32 (the reference's uint8 at replay_buffer.py:69
    silently overflows past 255 steps; not replicated)

All updates are functional; under jit with donated buffers XLA performs
them in place.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class BufferState:
    obs: jax.Array  # [R, T+1, *obs_shape]
    action: jax.Array  # [R, T+1] int32
    reward: jax.Array  # [R, T] float32
    done: jax.Array  # [R, T] bool
    ep_len: jax.Array  # [R] int32
    ep_valid: jax.Array  # [R] bool — completed episode, samplable
    write_pos: jax.Array  # [E] int32 — step cursor within current episode
    ep_count: jax.Array  # [E] int32 — episodes started per env
    flushed_total: jax.Array  # i32 — total completed episodes (can_sample)
    # Act-time bag storage (--bag-store): slot p holds the bag state after
    # transition p+1 = the bag used when ACTING at episode obs index p+1.
    bag_idx: Optional[jax.Array] = None  # [R, T, bag] int32, -1 = empty
    bag_act: Optional[jax.Array] = None  # [R, T, bag] int32

    @property
    def num_envs(self) -> int:
        return self.write_pos.shape[0]

    @property
    def rows_per_env(self) -> int:
        return self.obs.shape[0] // self.num_envs

    @property
    def max_episode_steps(self) -> int:
        return self.reward.shape[1]

    @property
    def current_rows(self) -> jax.Array:
        """Row owned by each env for its in-progress episode."""
        rpe = self.rows_per_env
        return jnp.arange(self.num_envs) * rpe + self.ep_count % rpe


@struct.dataclass
class Batch:
    """One training batch of context windows (replay_buffer.py:160-168)."""

    obs: jax.Array  # [B, L, *obs_shape]
    action: jax.Array  # [B, L]
    reward: jax.Array  # [B, L]
    next_obs: jax.Array  # [B, L, *obs_shape]
    next_action: jax.Array  # [B, L]
    done: jax.Array  # [B, L]
    ep_len: jax.Array  # [B] clipped to L
    bag_obs: Optional[jax.Array] = None  # [B, bag, *obs_shape]
    bag_action: Optional[jax.Array] = None  # [B, bag]


def init_buffer(
    *,
    num_envs: int,
    buffer_size: int,
    max_episode_steps: int,
    context_len: int,
    obs_shape: Tuple[int, ...],
    obs_dtype,
    obs_mask: float,
    act_bag_size: int = 0,
) -> BufferState:
    if context_len > max_episode_steps:
        raise ValueError(
            f"context_len {context_len} > max_episode_steps "
            f"{max_episode_steps}: sampled windows would overrun episodes"
        )
    total_rows = max(buffer_size // max_episode_steps, 2 * num_envs)
    rows_per_env = max(total_rows // num_envs, 2)
    rows = rows_per_env * num_envs
    t = max_episode_steps
    return BufferState(
        bag_idx=(
            jnp.full((rows, t, act_bag_size), -1, jnp.int32)
            if act_bag_size > 0
            else None
        ),
        bag_act=(
            jnp.zeros((rows, t, act_bag_size), jnp.int32)
            if act_bag_size > 0
            else None
        ),
        obs=jnp.full((rows, t + 1, *obs_shape), obs_mask, obs_dtype),
        action=jnp.zeros((rows, t + 1), jnp.int32),
        reward=jnp.zeros((rows, t), jnp.float32),
        done=jnp.ones((rows, t), bool),
        ep_len=jnp.zeros((rows,), jnp.int32),
        ep_valid=jnp.zeros((rows,), bool),
        write_pos=jnp.zeros((num_envs,), jnp.int32),
        ep_count=jnp.zeros((num_envs,), jnp.int32),
        flushed_total=jnp.int32(0),
    )


def _masked_row_update(arr, rows, mask, new_rows):
    """arr[rows] = new_rows where mask (per-env bool)."""
    cur = arr[rows]
    cond = mask.reshape((-1,) + (1,) * (cur.ndim - 1))
    return arr.at[rows].set(jnp.where(cond, new_rows, cur))


def store_first_obs(
    buf: BufferState, obs: jax.Array, mask: jax.Array, obs_mask: float
) -> BufferState:
    """Cleanse each masked env's current row and store the episode's first
    observation (replay_buffer.py:88-92 + cleanse_episode:100-135)."""
    rows = buf.current_rows
    t = buf.max_episode_steps

    clean_obs = jnp.full((buf.num_envs, t + 1, *buf.obs.shape[2:]),
                         obs_mask, buf.obs.dtype)
    clean_obs = clean_obs.at[:, 0].set(obs.astype(buf.obs.dtype))
    new_obs = _masked_row_update(buf.obs, rows, mask, clean_obs)
    new_action = _masked_row_update(
        buf.action, rows, mask, jnp.zeros((buf.num_envs, t + 1), jnp.int32)
    )
    new_reward = _masked_row_update(
        buf.reward, rows, mask, jnp.zeros((buf.num_envs, t), jnp.float32)
    )
    new_done = _masked_row_update(
        buf.done, rows, mask, jnp.ones((buf.num_envs, t), bool)
    )
    new_ep_len = buf.ep_len.at[rows].set(
        jnp.where(mask, 0, buf.ep_len[rows])
    )
    new_ep_valid = buf.ep_valid.at[rows].set(
        jnp.where(mask, False, buf.ep_valid[rows])
    )
    updates = {}
    if buf.bag_idx is not None:
        bag = buf.bag_idx.shape[2]
        updates["bag_idx"] = _masked_row_update(
            buf.bag_idx, rows, mask,
            jnp.full((buf.num_envs, t, bag), -1, jnp.int32),
        )
        updates["bag_act"] = _masked_row_update(
            buf.bag_act, rows, mask,
            jnp.zeros((buf.num_envs, t, bag), jnp.int32),
        )
    return buf.replace(
        obs=new_obs,
        action=new_action,
        reward=new_reward,
        done=new_done,
        ep_len=new_ep_len,
        ep_valid=new_ep_valid,
        write_pos=jnp.where(mask, 0, buf.write_pos),
        **updates,
    )


def store_step(
    buf: BufferState,
    obs: jax.Array,
    action: jax.Array,
    reward: jax.Array,
    done: jax.Array,
) -> BufferState:
    """Store one transition for every env (replay_buffer.py:71-86).

    ``obs`` is the post-step observation, written at slot pos+1 so s and s'
    share one array; episode length tracks the running step count.
    """
    rows = buf.current_rows
    pos = buf.write_pos
    obs_nd = (1,) * (buf.obs.ndim - 2)
    return buf.replace(
        obs=buf.obs.at[rows, pos + 1].set(obs.astype(buf.obs.dtype)),
        action=buf.action.at[rows, pos].set(action.astype(jnp.int32)),
        reward=buf.reward.at[rows, pos].set(reward.astype(jnp.float32)),
        done=buf.done.at[rows, pos].set(done.astype(bool)),
        ep_len=buf.ep_len.at[rows].set(pos + 1),
        write_pos=pos + 1,
    )


def store_act_bag(buf: BufferState, bag_idx, bag_act) -> BufferState:
    """Record the act-time bag for the transition just written by
    ``store_step`` (--bag-store).

    Must be called AFTER ``store_step`` with the bag state as updated by
    the agent's add/evict policy for that transition: slot p (= the
    transition's write position) then holds the bag the agent acts with at
    episode obs index p+1, which ``sample_with_stored_bag`` gathers for
    windows ending there.
    """
    rows = buf.current_rows
    pos = buf.write_pos - 1  # store_step already advanced the cursor
    return buf.replace(
        bag_idx=buf.bag_idx.at[rows, pos].set(bag_idx.astype(jnp.int32)),
        bag_act=buf.bag_act.at[rows, pos].set(bag_act.astype(jnp.int32)),
    )


def flush(buf: BufferState, mask: jax.Array) -> BufferState:
    """Finish the masked envs' episodes: mark samplable, advance the ring
    (replay_buffer.py:97-98)."""
    rows = buf.current_rows
    return buf.replace(
        ep_valid=buf.ep_valid.at[rows].set(
            jnp.logical_or(buf.ep_valid[rows], mask)
        ),
        ep_count=buf.ep_count + mask.astype(jnp.int32),
        write_pos=jnp.where(mask, 0, buf.write_pos),
        flushed_total=buf.flushed_total + mask.sum().astype(jnp.int32),
    )


def can_sample(buf: BufferState, batch_size: int) -> jax.Array:
    """batch_size < completed episodes (replay_buffer.py:94-95)."""
    return buf.flushed_total > batch_size


def _draw_windows(buf, key, batch_size, context_len):
    k_row, k_start = jax.random.split(key)
    logits = jnp.where(buf.ep_valid, 0.0, -jnp.inf)
    rows = jax.random.categorical(k_row, logits, shape=(batch_size,))
    max_start = jnp.maximum(0, buf.ep_len[rows] - context_len)
    u = jax.random.uniform(k_start, (batch_size,))
    starts = jnp.floor(u * (max_start + 1).astype(jnp.float32)).astype(jnp.int32)
    starts = jnp.minimum(starts, max_start)
    return rows, starts


def _gather_windows(buf, rows, starts, context_len):
    """Batched context-window gather: ONE gather HLO per storage leaf.

    A vmapped ``dynamic_slice`` (the previous implementation) unrolls to
    ``batch_size`` separate 0.5µs dynamic-slice ops per leaf per update on
    TPU — the single biggest op class in the round-3 device trace (~4.5%
    of chunk device time at B=32).  Integer-array indexing lowers to one
    gather per leaf instead; windows are identical (starts are clipped so
    start + L <= T by construction in ``_draw_windows``).
    """
    t_idx = starts[:, None] + jnp.arange(context_len + 1)[None, :]  # [B,L+1]
    rows_b = rows[:, None]
    obs_slice = buf.obs[rows_b, t_idx]
    act_slice = buf.action[rows_b, t_idx]
    rew = buf.reward[rows_b, t_idx[:, :context_len]]
    don = buf.done[rows_b, t_idx[:, :context_len]]
    return obs_slice, act_slice, rew, don


def sample(
    buf: BufferState, key: jax.Array, batch_size: int, context_len: int
) -> Batch:
    """Uniform (valid episode, window start) batch (replay_buffer.py:137-168)."""
    rows, starts = _draw_windows(buf, key, batch_size, context_len)
    obs_s, act_s, rew, don = _gather_windows(buf, rows, starts, context_len)
    return Batch(
        obs=obs_s[:, :context_len],
        action=act_s[:, :context_len],
        reward=rew,
        next_obs=obs_s[:, 1:],
        next_action=act_s[:, 1:],
        done=don,
        ep_len=jnp.clip(buf.ep_len[rows], 0, context_len),
    )


def sample_with_bag(
    buf: BufferState,
    key: jax.Array,
    batch_size: int,
    context_len: int,
    bag_size: int,
    obs_mask: float,
) -> Batch:
    """Batch plus per-sample bags drawn from pre-window observations
    (replay_buffer.py:171-264).

    For each sample with window start s: if s <= bag_size take all s
    pre-window entries (mask-padding the rest), else a uniform random
    subset of ``bag_size`` — implemented as the bottom-``bag_size`` of
    random scores over valid slots, which is distribution-equivalent to the
    reference's ``random.sample`` (order inside a bag is irrelevant to the
    unmasked bag cross-attention).
    """
    k_draw, k_bag = jax.random.split(key)
    rows, starts = _draw_windows(buf, k_draw, batch_size, context_len)
    obs_s, act_s, rew, don = _gather_windows(buf, rows, starts, context_len)

    t_slots = buf.max_episode_steps
    scores = jax.random.uniform(k_bag, (batch_size, t_slots))
    slot_idx = jnp.arange(t_slots)[None, :]
    valid = slot_idx < starts[:, None]
    scores = jnp.where(valid, scores, 2.0)  # invalid slots sort last
    order = jnp.argsort(scores, axis=1)[:, :bag_size]  # [B, bag]
    chosen_valid = jnp.take_along_axis(valid, order, axis=1)

    bag_obs = jax.vmap(lambda r, idx: buf.obs[r][idx])(rows, order)
    bag_act = jax.vmap(lambda r, idx: buf.action[r][idx])(rows, order)
    pad_shape = (1,) * (bag_obs.ndim - 2)
    bag_obs = jnp.where(
        chosen_valid.reshape(batch_size, bag_size, *pad_shape),
        bag_obs,
        jnp.asarray(obs_mask, buf.obs.dtype),
    )
    bag_act = jnp.where(chosen_valid, bag_act, 0)

    return Batch(
        obs=obs_s[:, :context_len],
        action=act_s[:, :context_len],
        reward=rew,
        next_obs=obs_s[:, 1:],
        next_action=act_s[:, 1:],
        done=don,
        ep_len=jnp.clip(buf.ep_len[rows], 0, context_len),
        bag_obs=bag_obs,
        bag_action=bag_act,
    )


def sample_with_stored_bag(
    buf: BufferState,
    key: jax.Array,
    batch_size: int,
    context_len: int,
    obs_mask: float,
) -> Batch:
    """Batch plus the ACT-TIME bag recorded for each sampled window
    (--bag-store; see ``store_act_bag``).

    For a window starting at s, the relevant acting step is its last
    position t = s + L - 1; the bag the agent used there is stored at slot
    t - 1 (= the bag state after transition t).  Entries are episode obs
    indices < s by construction (evictions at step t come from obs index
    t - L), so the gathered bag is always pre-window — the same support as
    ``sample_with_bag``, but with the eviction policy's actual contents
    (including the context's random-action-init quirk on the first evicted
    entry) instead of a uniform random subset.
    """
    rows, starts = _draw_windows(buf, key, batch_size, context_len)
    obs_s, act_s, rew, don = _gather_windows(buf, rows, starts, context_len)

    slot = jnp.clip(starts + context_len - 2, 0, buf.ep_len[rows] - 1)
    idx = buf.bag_idx[rows, slot]  # [B, bag]
    bag_act = buf.bag_act[rows, slot]  # [B, bag]
    valid = idx >= 0
    safe_idx = jnp.maximum(idx, 0)
    bag_obs = buf.obs[rows[:, None], safe_idx]  # [B, bag, *obs_shape]
    pad_shape = (1,) * (bag_obs.ndim - 2)
    bag_obs = jnp.where(
        valid.reshape(*valid.shape, *pad_shape),
        bag_obs,
        jnp.asarray(obs_mask, buf.obs.dtype),
    )
    bag_act = jnp.where(valid, bag_act, 0)

    return Batch(
        obs=obs_s[:, :context_len],
        action=act_s[:, :context_len],
        reward=rew,
        next_obs=obs_s[:, 1:],
        next_action=act_s[:, 1:],
        done=don,
        ep_len=jnp.clip(buf.ep_len[rows], 0, context_len),
        bag_obs=bag_obs,
        bag_action=bag_act,
    )
