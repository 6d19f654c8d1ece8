"""Gridverse memory tasks as pure JAX grid-worlds.

The reference loads these via the external ``gym-gridverse`` package from
YAML configs (`/root/reference/envs/gridverse/gv_memory.*.yaml`,
`utils/env_processing.py:34-54`) and flattens observations with
``GridVerseWrapper`` (`envs/gv_wrapper.py:11-30`).  This module implements
the task semantics those YAMLs define (`gv_memory.5x5.yaml:17-38`):

  - an NxN room bounded by walls; two EXITs of distinct colors in the top
    interior corners; one BEACON whose color marks the correct exit
  - actions: MOVE_FORWARD/BACKWARD/LEFT/RIGHT, TURN_LEFT/RIGHT (6)
  - rewards: reach_exit_memory +5 / -5 (correct/wrong exit) plus a -0.05
    living reward per step; terminating on any exit
  - observation: a 2x3 egocentric partially-occluded window
    (area [[-1,0],[-1,1]]) — ahead-corner cells are hidden when both
    adjacent cells toward them are walls; out-of-grid cells are hidden
  - a 250-step time limit (env_processing.py:54)

The four-rooms variants (`gv_memory_four_rooms.{7x7,9x9}.yaml`) add
internal cross walls with four doorways and randomized exit/beacon corners.

Cell encoding (ours; the gridverse channel scheme is package-internal):
token = object_type * 5 + color, with types {hidden=0, floor=1, wall=2,
exit=3, beacon=4} and colors {none=0, red, green, blue, yellow}; the
observation is the flattened [2, 3] window => MultiDiscrete-like vector of
length 6 with vocabulary 25.

Grids can be padded to a larger static shape (``pad_to``) so different
sizes share one state structure — required for multi-domain episode
sampling (run.py:287 with several ``--envs``).

Reconstruction-ablation variants (round 4, VERDICT item 1): the 7x7 task
asymptotes ~0.25 SR below the paper, and the reconstruction choices above
are the suspects.  Each is toggleable via ``+``-suffixes on the env name
(e.g. ``gv_memory.7x7.yaml+fspawn+walkbeacon``) so arms get distinct run
names/CSVs automatically:

  - ``walkbeacon``: the beacon does NOT block movement (gym-gridverse
    grid objects are walkable unless they declare otherwise; our default
    treats the beacon as furniture)
  - ``sumenc``: cell token = global_type_index + color_index — the
    reference wrapper's channel-sum encoding
    (`/root/reference/envs/gv_wrapper.py:25-30`:
    ``(grid[:,:,0]+grid[:,:,2]).flatten()``) with gym-gridverse's global
    object registry indices {Hidden:1, Floor:2, Wall:3, Exit:4, Beacon:10}
    and vocabulary ``high.max()*2+1`` = 21
  - ``fspawn``: the agent spawns on a floor cell adjacent to the beacon
    facing it (beacon color visible at t=0 — tests the spawn-distribution
    suspect: memory-only task vs ours' find-then-remember task)
  - ``oracle``: appends the good color as a 7th observation token every
    step (diagnostic upper bound: no memory needed)
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from dtqn_tpu.envs.core import Environment, ObsKind

# Object types
HIDDEN, FLOOR, WALL, EXIT, BEACON = 0, 1, 2, 3, 4
NUM_COLORS = 5  # none, red, green, blue, yellow
NUM_TYPES = 5
VOCAB = NUM_TYPES * NUM_COLORS  # 25 tokens

# ``sumenc`` variant: gym-gridverse global object-registry indices for the
# type channel (grid_object.py registration order: NoneGridObject=0,
# Hidden=1, Floor=2, Wall=3, Exit=4, ..., Beacon=10); the wrapper sums
# type + color channels (gv_wrapper.py:25-30) and sizes the MultiDiscrete
# vocab as high.max()*2+1 with high = Beacon's index 10.
SUM_TYPE_IDX = np.array([1, 2, 3, 4, 10], np.int32)  # by our type id
SUM_HIDDEN_TOKEN = 1  # Hidden + Color.NONE
SUM_VOCAB = 10 * 2 + 1  # 21

# (dy, dx) for orientations N, E, S, W
# numpy, not jnp: a module-level jnp constant initializes the XLA
# backend at import time, which breaks jax.distributed.initialize
# (must precede any backend use). Converted at the jit use sites.
DIRS = np.array([[-1, 0], [0, 1], [1, 0], [0, -1]], np.int32)

MOVE_FORWARD, MOVE_BACKWARD, MOVE_LEFT, MOVE_RIGHT, TURN_LEFT, TURN_RIGHT = (
    range(6)
)


@struct.dataclass
class GridverseState:
    grid_type: jax.Array  # [N, N] int32
    grid_color: jax.Array  # [N, N] int32
    good_color: jax.Array  # i32 — the beacon's color
    pos: jax.Array  # [2] int32 (y, x)
    direction: jax.Array  # i32 0..3
    t: jax.Array  # i32


class GridverseMemory(Environment):
    """gv_memory.NxN (and four-rooms variant)."""

    obs_kind = ObsKind.DISCRETE
    obs_dtype = jnp.int32
    num_actions = 6

    def __init__(
        self,
        size: int,
        four_rooms: bool = False,
        max_episode_steps: int = 250,
        pad_to: Optional[int] = None,
        beacon_blocks: bool = True,
        sum_encoding: bool = False,
        front_spawn: bool = False,
        oracle: bool = False,
    ):
        if size < 5 or size % 2 == 0:
            raise ValueError("gridverse memory sizes are odd and >= 5")
        self.size = size
        self.pad = pad_to or size
        if self.pad < size:
            raise ValueError("pad_to must be >= size")
        self.four_rooms = four_rooms
        self.beacon_blocks = beacon_blocks
        self.sum_encoding = sum_encoding
        self.front_spawn = front_spawn
        self.oracle = oracle
        variant = "gv_memory_four_rooms" if four_rooms else "gv_memory"
        suffix = "".join(
            tag
            for tag, on in (
                ("+walkbeacon", not beacon_blocks),
                ("+sumenc", sum_encoding),
                ("+fspawn", front_spawn),
                ("+oracle", oracle),
            )
            if on
        )
        self.name = f"{variant}.{size}x{size}.yaml{suffix}"
        self.max_episode_steps = max_episode_steps
        # Flattened 2x3 window (+1 oracle token).
        self.obs_shape = (7,) if oracle else (6,)

    @property
    def obs_mask(self) -> float:
        # MultiDiscrete rule: max token + 1 (env_processing.py:108-109).
        return float(SUM_VOCAB if self.sum_encoding else VOCAB)

    # ------------------------------------------------------------- building
    def _base_grid(self) -> Tuple[jax.Array, jax.Array]:
        n, p = self.size, self.pad
        yy, xx = jnp.mgrid[0:p, 0:p]
        border = (
            (yy == 0) | (xx == 0) | (yy == n - 1) | (xx == n - 1)
        )
        outside = (yy >= n) | (xx >= n)
        gtype = jnp.where(border | outside, WALL, FLOOR)
        if self.four_rooms:
            mid = n // 2
            cross = (yy == mid) | (xx == mid)
            # Doorways at the middle of each half-wall.
            q1, q3 = mid // 2, mid + (n - mid) // 2
            doors = (
                ((yy == mid) & ((xx == q1) | (xx == q3)))
                | ((xx == mid) & ((yy == q1) | (yy == q3)))
            )
            gtype = jnp.where(
                cross & ~doors & ~border & ~outside, WALL, gtype
            )
        return gtype.astype(jnp.int32), jnp.zeros((p, p), jnp.int32)

    def reset_env(self, key: jax.Array) -> Tuple[jax.Array, GridverseState]:
        n = self.size
        k_colors, k_swap, k_corner, k_pos, k_dir = jax.random.split(key, 5)
        gtype, gcolor = self._base_grid()

        # Two distinct exit colors from {red..yellow} (gv yaml colors list).
        colors = 1 + jax.random.choice(
            k_colors, 4, (2,), replace=False
        ).astype(jnp.int32)
        good, bad = colors[0], colors[1]

        if self.four_rooms:
            # Exits occupy two random distinct corners; beacon a third.
            corners = jnp.array(
                [[1, 1], [1, n - 2], [n - 2, 1], [n - 2, n - 2]], jnp.int32
            )
            perm = jax.random.permutation(k_corner, 4)
            exit_a, exit_b, beacon_pos = (
                corners[perm[0]],
                corners[perm[1]],
                corners[perm[2]],
            )
        else:
            exit_a = jnp.array([1, 1], jnp.int32)
            exit_b = jnp.array([1, n - 2], jnp.int32)
            beacon_pos = jnp.array([n - 2, n // 2], jnp.int32)

        # Randomly swap which exit is the good one.
        swap = jax.random.bernoulli(k_swap)
        good_exit = jnp.where(swap, exit_b, exit_a)
        bad_exit = jnp.where(swap, exit_a, exit_b)

        gtype = gtype.at[good_exit[0], good_exit[1]].set(EXIT)
        gtype = gtype.at[bad_exit[0], bad_exit[1]].set(EXIT)
        gtype = gtype.at[beacon_pos[0], beacon_pos[1]].set(BEACON)
        gcolor = gcolor.at[good_exit[0], good_exit[1]].set(good)
        gcolor = gcolor.at[bad_exit[0], bad_exit[1]].set(bad)
        gcolor = gcolor.at[beacon_pos[0], beacon_pos[1]].set(good)

        if self.front_spawn:
            # ``fspawn`` variant: spawn on a random floor cell adjacent to
            # the beacon, facing it, so its color is in view at t=0.
            offsets = jnp.array(
                [[-1, 0], [1, 0], [0, -1], [0, 1]], jnp.int32
            )
            # Facing the beacon from above/below/left/right => S/N/E/W.
            facing = jnp.array([2, 0, 1, 3], jnp.int32)
            nbrs = beacon_pos[None, :] + offsets  # [4, 2]
            ny = jnp.clip(nbrs[:, 0], 0, self.pad - 1)
            nx = jnp.clip(nbrs[:, 1], 0, self.pad - 1)
            ok = gtype[ny, nx] == FLOOR
            pick = jax.random.categorical(
                k_pos, jnp.where(ok, 0.0, -jnp.inf)
            )
            pos = jnp.stack([ny[pick], nx[pick]]).astype(jnp.int32)
            direction = facing[pick]
        else:
            # Agent spawns on a uniformly random plain floor cell.
            free = gtype == FLOOR
            logits = jnp.where(free.reshape(-1), 0.0, -jnp.inf)
            cell = jax.random.categorical(k_pos, logits)
            pos = jnp.stack(
                [cell // self.pad, cell % self.pad]
            ).astype(jnp.int32)
            direction = jax.random.randint(k_dir, (), 0, 4, jnp.int32)

        state = GridverseState(
            grid_type=gtype,
            grid_color=gcolor,
            good_color=good,
            pos=pos,
            direction=direction,
            t=jnp.int32(0),
        )
        return self._observe(state), state

    # ------------------------------------------------------------ observing
    def _cell_token(self, state: GridverseState, y, x, visible) -> jax.Array:
        p = self.pad
        in_bounds = (y >= 0) & (y < p) & (x >= 0) & (x < p)
        yc = jnp.clip(y, 0, p - 1)
        xc = jnp.clip(x, 0, p - 1)
        gtype = state.grid_type[yc, xc]
        gcolor = state.grid_color[yc, xc]
        shown = in_bounds & visible
        if self.sum_encoding:
            tok = jnp.asarray(SUM_TYPE_IDX)[gtype] + gcolor
            return jnp.where(shown, tok, SUM_HIDDEN_TOKEN)
        return jnp.where(shown, gtype * NUM_COLORS + gcolor, HIDDEN)

    def _observe(self, state: GridverseState) -> jax.Array:
        """2x3 egocentric window, row 0 = ahead, row 1 = agent's row."""
        dirs = jnp.asarray(DIRS)
        fwd = dirs[state.direction]
        right = dirs[(state.direction + 1) % 4]

        def world(f, l):
            c = state.pos + f * fwd + l * right
            return c[0], c[1]

        def is_wall(f, l):
            y, x = world(f, l)
            p = self.pad
            inb = (y >= 0) & (y < p) & (x >= 0) & (x < p)
            t = state.grid_type[jnp.clip(y, 0, p - 1), jnp.clip(x, 0, p - 1)]
            return jnp.where(inb, t == WALL, True)

        always = jnp.bool_(True)
        # Ahead corners occluded when both adjacent cells toward them are
        # walls (partially_occluded observation function, gv yaml :36-37).
        left_vis = ~(is_wall(0, -1) & is_wall(1, 0))
        right_vis = ~(is_wall(0, 1) & is_wall(1, 0))

        cells = [
            (1, -1, left_vis), (1, 0, always), (1, 1, right_vis),
            (0, -1, always), (0, 0, always), (0, 1, always),
        ]
        toks = [
            self._cell_token(state, *world(f, l), vis)
            for f, l, vis in cells
        ]
        if self.oracle:
            toks.append(state.good_color)
        return jnp.stack(toks).astype(jnp.int32)

    # -------------------------------------------------------------- stepping
    def step_env(
        self, key: jax.Array, state: GridverseState, action: jax.Array
    ) -> Tuple[jax.Array, GridverseState, jax.Array, jax.Array, Dict[str, jax.Array]]:
        del key
        a = jnp.asarray(action, jnp.int32)
        d = state.direction
        dirs = jnp.asarray(DIRS)
        move = jnp.select(
            [a == MOVE_FORWARD, a == MOVE_BACKWARD, a == MOVE_LEFT,
             a == MOVE_RIGHT],
            [dirs[d], -dirs[d], -dirs[(d + 1) % 4], dirs[(d + 1) % 4]],
            jnp.zeros((2,), jnp.int32),
        )
        new_dir = jnp.select(
            [a == TURN_LEFT, a == TURN_RIGHT],
            [(d + 3) % 4, (d + 1) % 4],
            d,
        )
        target = state.pos + move
        p = self.pad
        ty = jnp.clip(target[0], 0, p - 1)
        tx = jnp.clip(target[1], 0, p - 1)
        ttype = state.grid_type[ty, tx]
        blocked = ttype == WALL
        if self.beacon_blocks:
            blocked = blocked | (ttype == BEACON)
        new_pos = jnp.where(blocked, state.pos, jnp.stack([ty, tx]))

        on_exit = state.grid_type[new_pos[0], new_pos[1]] == EXIT
        exit_color = state.grid_color[new_pos[0], new_pos[1]]
        correct = exit_color == state.good_color
        # reach_exit_memory +-5 plus living reward -0.05 (gv yaml :24-31).
        reward = jnp.where(
            on_exit, jnp.where(correct, 5.0, -5.0), 0.0
        ) - 0.05
        terminated = on_exit

        new_state = state.replace(
            pos=new_pos, direction=new_dir, t=state.t + 1
        )
        info = {"is_success": jnp.logical_and(on_exit, correct)}
        return (
            self._observe(new_state),
            new_state,
            reward.astype(jnp.float32),
            terminated,
            info,
        )


_VARIANT_TAGS = ("walkbeacon", "sumenc", "fspawn", "oracle")


def make_gridverse_env(name: str, pad_to: Optional[int] = None) -> GridverseMemory:
    """Resolve gv_memory*.yaml names (env_processing.make_env fallback).

    Accepts e.g. ``gv_memory.7x7.yaml`` or ``gv_memory_four_rooms.9x9.yaml``,
    optionally with reconstruction-ablation suffixes
    (``gv_memory.7x7.yaml+fspawn+walkbeacon`` — see the module docstring).
    """
    core, *tags = name.split("+")
    unknown = sorted(set(tags) - set(_VARIANT_TAGS))
    if unknown:
        raise KeyError(
            f"Unknown gridverse variant tags {unknown} in {name!r}; "
            f"choices: {_VARIANT_TAGS}"
        )
    base = core[:-5] if core.endswith(".yaml") else core
    parts = base.split(".")
    if len(parts) != 2 or parts[0] not in (
        "gv_memory",
        "gv_memory_four_rooms",
    ):
        raise KeyError(f"Unknown gridverse env {name!r}")
    size = int(parts[1].split("x")[0])
    return GridverseMemory(
        size=size,
        four_rooms=parts[0] == "gv_memory_four_rooms",
        pad_to=pad_to,
        beacon_blocks="walkbeacon" not in tags,
        sum_encoding="sumenc" in tags,
        front_spawn="fspawn" in tags,
        oracle="oracle" in tags,
    )
