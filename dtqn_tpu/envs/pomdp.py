"""Tabular POMDP engine + classic domains (Hallway, HeavenHell).

The reference runs these via the external ``gym-pomdps`` + ``rl-parsers``
packages (not vendored; documented at `/root/reference/README.md:102-103`),
which load Cassandra-format ``.pomdp`` files and expose obs = Discrete state
index.  Capability parity here is three pieces:

  1. ``TabularPOMDP`` — a pure-JAX engine over dense (T, O, R) tensors with
     terminal states and a start distribution; stepping is two categorical
     draws + gathers, trivially vmappable.
  2. ``make_heavenhell(n)`` — the classic T-maze: heaven at one arm end,
     hell at the other (side unknown), a priest at the stem end reveals the
     side; reward +-1 on the exits (deterministic dynamics).
  3. ``make_hallway()`` — a Hallway-class navigation POMDP: oriented
     movement in a corridor with noisy actions and wall-configuration
     observations, goal in an alcove.  The exact Cassandra ``hallway.pomdp``
     tables are not redistributable/available offline; this is a documented
     reconstruction of the domain family (Littman et al. '95 parameters:
     0.8 action success, noisy observations).  Users with real ``.pomdp``
     files can load them via ``dtqn_tpu.envs.pomdp_parser``.

The episodic convention matches gym-pomdps: episode ends in terminal
states; obs is a Discrete index (obs_length 1, env_processing.py:86-88).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from dtqn_tpu.envs.core import Environment, ObsKind


@struct.dataclass
class TabularState:
    s: jax.Array  # i32 hidden state index
    t: jax.Array  # i32 step counter


class TabularPOMDP(Environment):
    """Episodic POMDP over dense tables.

    T: [S, A, S] transition probabilities
    O: [A, S, Obs] observation probabilities given (action, next state)
    R: [S, A, S] rewards
    start: [S] initial state distribution
    terminal: [S] bool absorbing flags
    init_obs: [S, Obs] distribution of the reset observation given s0
    """

    obs_kind = ObsKind.DISCRETE
    obs_dtype = jnp.int32

    def __init__(
        self,
        name: str,
        T: np.ndarray,
        O: np.ndarray,
        R: np.ndarray,
        start: np.ndarray,
        terminal: np.ndarray,
        init_obs: Optional[np.ndarray],
        max_episode_steps: int,
        success_reward_threshold: float = 0.0,
    ):
        S, A, _ = T.shape
        n_obs = O.shape[-1]
        self.name = name
        self.num_states = S
        self.num_actions = A
        self.num_obs = n_obs
        self.max_episode_steps = max_episode_steps
        self.obs_shape = (1,)
        self.success_reward_threshold = success_reward_threshold
        self._T = jnp.asarray(T, jnp.float32)
        self._O = jnp.asarray(O, jnp.float32)
        self._R = jnp.asarray(R, jnp.float32)
        self._start = jnp.asarray(start, jnp.float32)
        self._terminal = jnp.asarray(terminal, bool)
        if init_obs is None:
            init_obs = np.full((S, n_obs), 1.0 / n_obs, np.float32)
        self._init_obs = jnp.asarray(init_obs, jnp.float32)

    @property
    def obs_mask(self) -> float:
        # Discrete -> mask == n (env_processing.py:106-107).
        return float(self.num_obs)

    def reset_env(self, key: jax.Array) -> Tuple[jax.Array, TabularState]:
        k_s, k_o = jax.random.split(key)
        s = jax.random.categorical(k_s, jnp.log(self._start + 1e-30))
        obs = jax.random.categorical(k_o, jnp.log(self._init_obs[s] + 1e-30))
        state = TabularState(s=s.astype(jnp.int32), t=jnp.int32(0))
        return obs[None].astype(jnp.int32), state

    def step_env(
        self, key: jax.Array, state: TabularState, action: jax.Array
    ) -> Tuple[jax.Array, TabularState, jax.Array, jax.Array, Dict[str, jax.Array]]:
        k_t, k_o = jax.random.split(key)
        a = jnp.asarray(action, jnp.int32)
        s2 = jax.random.categorical(
            k_t, jnp.log(self._T[state.s, a] + 1e-30)
        ).astype(jnp.int32)
        reward = self._R[state.s, a, s2]
        obs = jax.random.categorical(k_o, jnp.log(self._O[a, s2] + 1e-30))
        terminated = self._terminal[s2]
        new_state = TabularState(s=s2, t=state.t + 1)
        info = {"is_success": reward > self.success_reward_threshold}
        return obs[None].astype(jnp.int32), new_state, reward, terminated, info


def make_heavenhell(n: int = 3, max_episode_steps: int = 40) -> TabularPOMDP:
    """HeavenHell T-maze with arm/stem length ``n``.

    Layout (positions): junction J at index 0; right arm 1..n (exit at n);
    left arm n+1..2n (exit at 2n); stem 2n+1..3n with the priest at 3n.
    Hidden state = position x heaven-side (2 sides).  The agent starts at
    the junction; at the priest cell the observation reveals the side.
    Actions: 0=right, 1=left, 2=down (into stem), 3=up (toward junction).
    Reaching heaven gives +1, hell -1; both terminal.  Deterministic.

    Observations: position index (0..3n), except the priest cell emits
    P + side with P = 3n+1, so there are P+2 observations.  Matches the
    classic Geffner-Bonet domain the reference uses via gym-pomdps.
    """
    P = 3 * n + 1  # positions
    S = 2 * P + 1  # + one absorbing state
    A = 4
    n_obs = P + 2  # positions (priest pos obs unused) + 2 priest obs
    absorbing = S - 1

    def pos_right(i):  # arm cells
        return 1 + i  # i in 0..n-1 -> position 1..n

    def pos_left(i):
        return n + 1 + i  # 0..n-1 -> n+1..2n

    def pos_stem(i):
        return 2 * n + 1 + i  # 0..n-1 -> 2n+1..3n

    priest = pos_stem(n - 1)

    def sid(pos, side):
        return side * P + pos

    T = np.zeros((S, A, S), np.float32)
    O = np.zeros((A, S, n_obs), np.float32)
    R = np.zeros((S, A, S), np.float32)
    terminal = np.zeros((S,), bool)
    terminal[absorbing] = True
    start = np.zeros((S,), np.float32)
    start[sid(0, 0)] = 0.5
    start[sid(0, 1)] = 0.5

    # Adjacency: next position for (pos, action); None = blocked (stay).
    def neighbor(pos, a):
        if pos == 0:  # junction
            return {0: pos_right(0), 1: pos_left(0), 2: pos_stem(0)}.get(a, pos)
        if 1 <= pos <= n:  # right arm; 0 further right, 1 back
            if a == 0:
                return pos + 1 if pos < n else pos  # exit handled separately
            if a == 1:
                return pos - 1 if pos > 1 else 0
            return pos
        if n + 1 <= pos <= 2 * n:  # left arm; 1 further left, 0 back
            i = pos - (n + 1)
            if a == 1:
                return pos + 1 if i < n - 1 else pos
            if a == 0:
                return pos - 1 if i > 0 else 0
            return pos
        # stem; 2 deeper, 3 back up
        i = pos - (2 * n + 1)
        if a == 2:
            return pos + 1 if i < n - 1 else pos
        if a == 3:
            return pos - 1 if i > 0 else 0
        return pos

    exit_right, exit_left = pos_right(n - 1), pos_left(n - 1)
    for side in (0, 1):  # side 0: heaven right; side 1: heaven left
        heaven_exit = exit_right if side == 0 else exit_left
        hell_exit = exit_left if side == 0 else exit_right
        for pos in range(P):
            s = sid(pos, side)
            for a in range(A):
                # Exits: stepping outward from the last arm cell terminates.
                if pos == exit_right and a == 0:
                    T[s, a, absorbing] = 1.0
                    R[s, a, absorbing] = 1.0 if side == 0 else -1.0
                    continue
                if pos == exit_left and a == 1:
                    T[s, a, absorbing] = 1.0
                    R[s, a, absorbing] = 1.0 if side == 1 else -1.0
                    continue
                T[s, a, sid(neighbor(pos, a), side)] = 1.0
        del heaven_exit, hell_exit

    T[absorbing, :, absorbing] = 1.0  # absorbing self-loop

    # Observations: deterministic position id; priest reveals the side.
    for side in (0, 1):
        for pos in range(P):
            s = sid(pos, side)
            o = (P + side) if pos == priest else pos
            O[:, s, o] = 1.0
    O[:, absorbing, 0] = 1.0  # never seen (terminal)

    init_obs = np.zeros((S, n_obs), np.float32)
    init_obs[:, 0] = 1.0  # start at junction -> obs 0

    return TabularPOMDP(
        name=f"POMDP-heavenhell_{n}-episodic-v0",
        T=T,
        O=O,
        R=R,
        start=start,
        terminal=terminal,
        init_obs=init_obs,
        max_episode_steps=max_episode_steps,
    )


def make_hallway(max_episode_steps: int = 100) -> TabularPOMDP:
    """Hallway-class navigation POMDP (reconstruction; see module docstring).

    A 5-cell corridor with 3 alcoves hanging off cells 1..3; the goal sits
    in the middle alcove.  State = (cell, orientation) with 4 orientations;
    actions: 0=stay, 1=forward, 2=turn-right, 3=turn-left, 4=turn-around.
    Movement succeeds w.p. 0.8 (stays otherwise); turns are exact.
    Observations: 16 wall configurations (front/right/back/left bits) seen
    with 0.95-correct per-bit noise, plus a distinct goal observation.
    Entering the goal cell gives +1 and terminates.  Start: uniform over
    non-goal states.
    """
    CORRIDOR = 5
    cells = [(c, 0) for c in range(CORRIDOR)] + [(1, 1), (2, 1), (3, 1)]
    goal_cell = cells.index((2, 1))
    C = len(cells)
    DIRS = [(0, -1), (1, 0), (0, 1), (-1, 0)]  # N, E, S, W (y down)
    S = C * 4 + 1
    A = 5
    n_obs = 17  # 16 wall configs + goal
    absorbing = S - 1

    cell_at = {xy: i for i, xy in enumerate(cells)}

    def sidx(cell, d):
        return cell * 4 + d

    T = np.zeros((S, A, S), np.float32)
    O = np.zeros((A, S, n_obs), np.float32)
    R = np.zeros((S, A, S), np.float32)
    terminal = np.zeros((S,), bool)
    terminal[absorbing] = True

    def forward_cell(cell, d):
        x, y = cells[cell]
        dx, dy = DIRS[d]
        return cell_at.get((x + dx, y + dy))

    for cell in range(C):
        for d in range(4):
            s = sidx(cell, d)
            # stay
            T[s, 0, s] = 1.0
            # forward: 0.8 success
            tgt = forward_cell(cell, d)
            if tgt is None:
                T[s, 1, s] = 1.0
            elif tgt == goal_cell:
                T[s, 1, absorbing] = 0.8
                R[s, 1, absorbing] = 1.0
                T[s, 1, s] = 0.2
            else:
                T[s, 1, sidx(tgt, d)] = 0.8
                T[s, 1, s] = 0.2
            # turns are deterministic
            T[s, 2, sidx(cell, (d + 1) % 4)] = 1.0
            T[s, 3, sidx(cell, (d + 3) % 4)] = 1.0
            T[s, 4, sidx(cell, (d + 2) % 4)] = 1.0

    T[absorbing, :, absorbing] = 1.0  # absorbing self-loop

    # Wall-configuration observations with per-bit noise.
    P_BIT = 0.95
    for cell in range(C):
        for d in range(4):
            s = sidx(cell, d)
            walls = [
                forward_cell(cell, (d + k) % 4) is None for k in range(4)
            ]  # front, right, back, left relative bits
            for o in range(16):
                p = 1.0
                for b in range(4):
                    bit = (o >> b) & 1
                    p *= P_BIT if bit == int(walls[b]) else 1.0 - P_BIT
                O[:, s, o] = p
    O[:, absorbing, 16] = 1.0  # goal observation

    start = np.zeros((S,), np.float32)
    for cell in range(C):
        if cell == goal_cell:
            continue
        for d in range(4):
            start[sidx(cell, d)] = 1.0
    start /= start.sum()

    init_obs = np.asarray(O[0], np.float32)

    return TabularPOMDP(
        name="POMDP-hallway-episodic-v0",
        T=T,
        O=O,
        R=R,
        start=start,
        terminal=terminal,
        init_obs=init_obs,
        max_episode_steps=max_episode_steps,
    )
