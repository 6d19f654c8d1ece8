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
    """Hallway navigation POMDP at the classic problem's dimensions.

    Littman, Cassandra & Kaelbling '95's Hallway is the benchmark the
    reference trains via gym-pomdps (`/root/reference/README.md:102-103`).
    The exact Cassandra ``hallway.pomdp`` tables are unobtainable offline
    (no package on this host, no network, paper appendix unavailable);
    this reconstruction matches every dimension the benchmark literature
    documents for the problem — **60 states** (15 cells x 4 orientations),
    **5 actions**, **21 observations**, +1 reward only on reaching the
    goal, uniform non-goal start, noisy actions AND noisy observations —
    and marks the structural details it had to choose as such below.
    (Round 3 shipped an 8-cell/33-state/17-obs version that was easier
    than the classic domain; this replaces it.)

    Map (reconstructed from the published figure): an 11-cell corridor
    with 4 alcove cells hanging below corridor cells 2, 4, 6, 8; the goal
    is the star in the third alcove (below corridor cell 6).

    State = (cell, orientation N/E/S/W); the 4 goal-cell states are
    terminal (entering any of them pays +1) => 60 states total, no extra
    absorbing index.

    Actions 0=stay, 1=forward, 2=turn-right, 3=turn-left, 4=turn-around.
    Action noise (the paper describes actions as very noisy; exact values
    are a reconstruction choice): forward = 0.8 success / 0.1 stay /
    0.05 slip into each adjacent turn; turns = 0.9 success / 0.1 stay;
    stay is exact.

    Observations: 16 front/right/back/left wall configurations with
    0.95-correct per-bit noise; obs 16..19 identify each alcove when the
    agent stands in the corridor cell above it facing it (landmarks); obs
    20 is the goal star, seen in the goal alcove.  Landmark/star cells
    emit their special observation w.p. 0.9, else fall back to the noisy
    wall-config model.  => 21 observations.
    """
    CORRIDOR = 11
    ALCOVE_XS = [2, 4, 6, 8]
    cells = [(c, 0) for c in range(CORRIDOR)] + [(x, 1) for x in ALCOVE_XS]
    goal_cell = cells.index((6, 1))
    C = len(cells)  # 15
    DIRS = [(0, -1), (1, 0), (0, 1), (-1, 0)]  # N, E, S, W (y down)
    S = C * 4  # 60
    A = 5
    n_obs = 21
    OBS_STAR = 20
    alcove_of = {cells.index((x, 1)): k for k, x in enumerate(ALCOVE_XS)}

    cell_at = {xy: i for i, xy in enumerate(cells)}

    def sidx(cell, d):
        return cell * 4 + d

    T = np.zeros((S, A, S), np.float32)
    O = np.zeros((A, S, n_obs), np.float32)
    R = np.zeros((S, A, S), np.float32)
    terminal = np.zeros((S,), bool)
    for d in range(4):
        terminal[sidx(goal_cell, d)] = True

    def forward_cell(cell, d):
        x, y = cells[cell]
        dx, dy = DIRS[d]
        return cell_at.get((x + dx, y + dy))

    def add_move(s, a, cell, d, p):
        """Accumulate outcome (cell, d) w.p. p, paying +1 into the goal."""
        s2 = sidx(cell, d)
        T[s, a, s2] += p
        if cell == goal_cell:
            R[s, a, s2] = 1.0

    for cell in range(C):
        for d in range(4):
            s = sidx(cell, d)
            if terminal[s]:
                T[s, :, s] = 1.0  # never sampled from; keep rows stochastic
                continue
            # stay: exact
            T[s, 0, s] = 1.0
            # forward: 0.8 success / 0.1 stay / 0.05 slip into each turn
            tgt = forward_cell(cell, d)
            if tgt is None:
                add_move(s, 1, cell, d, 0.8 + 0.1)  # bump: stays
            else:
                add_move(s, 1, tgt, d, 0.8)
                add_move(s, 1, cell, d, 0.1)
            add_move(s, 1, cell, (d + 1) % 4, 0.05)
            add_move(s, 1, cell, (d + 3) % 4, 0.05)
            # turns: 0.9 success / 0.1 stay
            for a, nd in ((2, (d + 1) % 4), (3, (d + 3) % 4),
                          (4, (d + 2) % 4)):
                add_move(s, a, cell, nd, 0.9)
                add_move(s, a, cell, d, 0.1)

    # Observations.
    P_BIT = 0.95
    P_SPECIAL = 0.9
    for cell in range(C):
        for d in range(4):
            s = sidx(cell, d)
            walls = [
                forward_cell(cell, (d + k) % 4) is None for k in range(4)
            ]  # front, right, back, left relative bits
            wall_probs = np.zeros((n_obs,), np.float32)
            for o in range(16):
                p = 1.0
                for b in range(4):
                    bit = (o >> b) & 1
                    p *= P_BIT if bit == int(walls[b]) else 1.0 - P_BIT
                wall_probs[o] = p
            special = None
            if cell == goal_cell:
                special = OBS_STAR
            elif cell in alcove_of and cell != goal_cell:
                pass  # non-goal alcoves look like dead ends (walls only)
            else:
                # Corridor cell above an alcove, facing it (south):
                # landmark identifying WHICH alcove.
                below = forward_cell(cell, 2)
                if below is not None and below in alcove_of and d == 2:
                    special = 16 + alcove_of[below]
            if special is None:
                O[:, s] = wall_probs
            else:
                O[:, s] = (1.0 - P_SPECIAL) * wall_probs
                O[:, s, special] += P_SPECIAL

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
