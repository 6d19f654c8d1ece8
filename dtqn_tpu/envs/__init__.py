"""Environment registry.

Replaces the reference's gym registration + ``make_env`` lookup
(`/root/reference/envs/__init__.py:31-48`, `utils/env_processing.py:30-56`)
with a plain name -> factory map over pure-function JAX environments.
"""

from __future__ import annotations

from typing import Callable, Dict

from dtqn_tpu.envs.core import Environment, ObsKind, Timestep
from dtqn_tpu.envs.car_flag import CarFlag, CarFlagState
from dtqn_tpu.envs.memory_cards import MemoryCards, MemoryState

_REGISTRY: Dict[str, Callable[[], Environment]] = {}


def register(name: str, factory: Callable[[], Environment]) -> None:
    _REGISTRY[name] = factory


def make_env(name: str) -> Environment:
    """Instantiate a registered environment by name.

    Gridverse YAML names (``gv_*.yaml``) resolve to the JAX Gridverse memory
    engine, mirroring the reference's YAML fallback path
    (utils/env_processing.py:34-54).  Paths ending in ``.pomdp`` load the
    Cassandra file into a ``TabularPOMDP`` — the reference reaches arbitrary
    classic POMDPs through gym-pomdps + rl-parsers
    (`/root/reference/README.md:102-103`); here the in-tree parser
    (``envs/pomdp_parser.py``, native C++ fast path) serves the same role.
    """
    if name in _REGISTRY:
        return _REGISTRY[name]()
    if name.endswith(".pomdp"):
        import os

        if not os.path.exists(name):
            raise FileNotFoundError(f"POMDP file not found: {name!r}")
        from dtqn_tpu.envs.pomdp_parser import (
            make_tabular_env,
            parse_pomdp_file,
        )

        base = os.path.splitext(os.path.basename(name))[0]
        return make_tabular_env(
            parse_pomdp_file(name),
            name=f"POMDP-{base}-episodic-v0",
            max_episode_steps=100,
        )
    if name.startswith("gv_"):
        from dtqn_tpu.envs.gridverse import make_gridverse_env

        return make_gridverse_env(name)
    raise KeyError(
        f"Unknown environment {name!r}. Registered: {sorted(_REGISTRY)}"
    )


def registered_envs():
    return sorted(_REGISTRY)


# Memory cards (reference envs/__init__.py:31-36: 50-step limit)
register("Memory-5-v0", lambda: MemoryCards(num_pairs=5, max_episode_steps=50))

# Car Flag (reference envs/__init__.py:42-47: 200-step limit)
register("DiscreteCarFlag-v0", lambda: CarFlag())
# Continuous-force mode (car_flag.py:58-63); scripted/external policies
# only — the Q agents are discrete-action, as in the reference.
register("CarFlag-continuous-v0", lambda: CarFlag(discrete=False))


def _register_image_maze() -> None:
    from dtqn_tpu.envs.image_maze import ImageMaze

    register("ImageMaze-9-v0", lambda: ImageMaze(size=9))


_register_image_maze()


def _make_hallway_env() -> Environment:
    """Hallway: load the real Cassandra tables when a ``hallway.pomdp``
    file is available (``DTQN_TPU_POMDP_DIR`` or the working directory),
    else fall back to the in-tree reconstruction (envs/pomdp.py)."""
    import os

    repo_data = os.path.normpath(
        os.path.join(os.path.dirname(__file__), "..", "..", "data")
    )
    for d in (os.environ.get("DTQN_TPU_POMDP_DIR", ""), os.getcwd(), repo_data):
        path = os.path.join(d, "hallway.pomdp") if d else ""
        if path and os.path.exists(path):
            from dtqn_tpu.envs.pomdp_parser import (
                make_tabular_env,
                parse_pomdp_file,
            )

            return make_tabular_env(
                parse_pomdp_file(path),
                name="POMDP-hallway-episodic-v0",
                max_episode_steps=100,
            )
    from dtqn_tpu.envs.pomdp import make_hallway

    return make_hallway()


def _register_pomdps() -> None:
    from dtqn_tpu.envs.pomdp import make_heavenhell

    register("POMDP-hallway-episodic-v0", _make_hallway_env)
    register("POMDP-heavenhell_3-episodic-v0", lambda: make_heavenhell(3))


try:  # Tabular POMDPs are part of the package; guard only against cycles.
    _register_pomdps()
except ImportError:  # pragma: no cover - during partial builds
    pass
