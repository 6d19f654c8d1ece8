"""Functional agents: config, state, and the act/observe/learn core."""

from dtqn_tpu.agents.base import Agent, AgentConfig, AgentState

__all__ = ["Agent", "AgentConfig", "AgentState"]
