"""Q-network model registry.

Mirrors the reference's MODEL_MAP (`/root/reference/utils/agent_utils.py:
17-24`): model string -> network constructor.  ``build_network`` plays the
role of the ``make_model``/``make_dtqn`` factory closures
(agent_utils.py:112-144), deriving environment-interface fields from an
``Environment``.
"""

from __future__ import annotations

from flax import linen as nn

from dtqn_tpu.envs.core import Environment
from dtqn_tpu.models.dtqn import DTQN
from dtqn_tpu.models.recurrent import ADRQN, DARQN, DQN, DRQN, zero_carry

MODEL_MAP = {
    "DTQN": DTQN,
    "DTQN-bag": DTQN,
    "ADRQN": ADRQN,
    "DRQN": DRQN,
    "DARQN": DARQN,
    "DQN": DQN,
}

RECURRENT_MODELS = ("DRQN", "ADRQN", "DARQN")


def build_network(
    model_str: str,
    env: Environment,
    *,
    embed_per_obs_dim: int = 8,
    action_dim: int = 0,
    inner_embed: int = 128,
    num_heads: int = 8,
    num_layers: int = 2,
    context_len: int = 50,
    dropout: float = 0.0,
    gate: str = "res",
    identity: bool = False,
    pos: str = "learned",
    bag_size: int = 0,
    bag_mask: bool = False,
) -> nn.Module:
    if model_str not in MODEL_MAP:
        raise KeyError(f"Unknown model {model_str!r}; choices: {sorted(MODEL_MAP)}")
    vocab = env.obs_vocab_size if env.is_discrete else 0
    common = dict(
        obs_kind=env.obs_kind,
        obs_shape=tuple(env.obs_shape),
        num_actions=env.num_actions,
        vocab_size=vocab,
        embed_per_obs_dim=embed_per_obs_dim,
        inner_embed=inner_embed,
    )
    if "DTQN" in model_str:
        if bag_mask and not env.is_discrete:
            # Padded-slot detection compares every obs element against the
            # sentinel; that is only sound when the sentinel cannot occur
            # as a real observation.  Discrete/MultiDiscrete envs guarantee
            # it (sentinel = vocab, outside the token range); a continuous
            # env whose observation equals the sentinel in every element
            # would be silently masked (round-4 advisor finding).
            raise ValueError(
                "--bag-mask requires a discrete-observation env: the "
                f"padding sentinel {float(env.obs_mask)} is inside a "
                "continuous observation space's range"
            )
        return DTQN(
            action_dim=action_dim,
            num_heads=num_heads,
            num_layers=num_layers,
            context_len=context_len,
            dropout=dropout,
            gate=gate,
            identity=identity,
            pos=pos,
            bag_size=bag_size,
            bag_mask=bag_mask,
            obs_mask_value=float(env.obs_mask),
            **common,
        )
    if model_str == "DQN":
        return DQN(**common)
    if model_str == "ADRQN":
        # ADRQN conditions on the previous action; ensure it has features.
        return ADRQN(action_dim=action_dim or 8, **common)
    if model_str == "DRQN":
        return DRQN(action_dim=0, **common)
    return DARQN(action_dim=0, **common)


def attention_weights(network: nn.Module, params, *args, **kwargs):
    """Per-layer head-averaged attention maps for visualization.

    The functional equivalent of reading the reference's ``layer.alpha``
    after a forward pass (`/root/reference/dtqn/networks/transformer.py:
    46,64-69`).  Returns (q_values, [maps]) where each map is [B, Lq, Lk],
    sorted by module path — DTQN-bag's cross-attention map ("bag_attention")
    first, then "layer_0" ... "layer_{n-1}".
    """
    q, inter = network.apply(
        params, *args, mutable=["intermediates"], **kwargs
    )
    maps = [
        leaf[0]
        for path, leaf in sorted(
            _flatten_intermediates(inter["intermediates"]).items()
        )
        if path.endswith("attention_weights")
    ]
    return q, maps


def _flatten_intermediates(tree, prefix=""):
    flat = {}
    for key, val in tree.items():
        path = f"{prefix}/{key}" if prefix else key
        if isinstance(val, dict):
            flat.update(_flatten_intermediates(val, path))
        else:
            flat[path] = val
    return flat


__all__ = [
    "MODEL_MAP",
    "RECURRENT_MODELS",
    "build_network",
    "attention_weights",
    "DTQN",
    "DQN",
    "DRQN",
    "ADRQN",
    "DARQN",
    "zero_carry",
]
