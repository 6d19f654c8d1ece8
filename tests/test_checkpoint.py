"""Checkpoint/resume protocol tests (reference: dqn.py:212-327, run.py:471-495):
full-state round trip, policy-only snapshots, mini-checkpoint sentinel, and
the runner's resume-or-exit behavior."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dtqn_tpu.agents import Agent, AgentConfig
from dtqn_tpu.config import ExperimentConfig
from dtqn_tpu.envs import make_env
from dtqn_tpu.train.loop import make_prepopulate, make_train_chunk
from dtqn_tpu.train.runner import run_experiment
from dtqn_tpu.utils import checkpoint as ckpt
from dtqn_tpu.utils.epsilon import EpsilonSchedule


def small_agent():
    env = make_env("DiscreteCarFlag-v0")
    env.max_episode_steps = 20
    cfg = AgentConfig(
        model="DTQN", num_envs=4, context_len=8, history=8, inner_embed=16,
        num_heads=2, num_layers=1, buffer_size=800, batch_size=4,
        target_update_frequency=10,
    )
    return env, Agent(cfg, env)


def trees_equal(a, b):
    return all(
        bool(jnp.array_equal(x, y))
        for x, y in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
        )
    )


class TestCheckpoint:
    def test_full_round_trip(self, tmp_path):
        env, agent = small_agent()
        state = agent.init_state(jax.random.key(0))
        state = make_prepopulate(agent, 60)(state)
        state = make_train_chunk(
            agent, EpsilonSchedule(1.0, 0.1, 100), 1, 10
        )(state)
        path = str(tmp_path / "run")
        ckpt.save_checkpoint(path, state, extra={"mean_reward": [0.5, 0.25]})

        template = agent.init_state(jax.random.key(42))
        restored, extra = ckpt.load_checkpoint(path, template)
        assert trees_equal(state, restored)
        assert extra["mean_reward"] == [0.5, 0.25]
        # Training continues bit-identically from the restored state.
        chunk = make_train_chunk(agent, EpsilonSchedule(1.0, 0.1, 100), 1, 5)
        a = chunk(state)
        b = chunk(restored)
        assert trees_equal(a.params, b.params)
        assert int(a.env_steps) == int(b.env_steps)

    def test_policy_round_trip(self, tmp_path):
        env, agent = small_agent()
        state = agent.init_state(jax.random.key(0))
        path = str(tmp_path / "run")
        ckpt.save_policy(path, state.params)
        loaded = ckpt.load_policy(path, state.params)
        assert trees_equal(state.params, loaded)

    def test_mini_checkpoint(self, tmp_path):
        path = str(tmp_path / "run")
        assert ckpt.load_mini_checkpoint(path) is None
        ckpt.save_mini_checkpoint(path, 1234, "wbid")
        mini = ckpt.load_mini_checkpoint(path)
        assert mini == {"step": 1234, "wandb_id": "wbid"}


class TestRunnerResume:
    def _config(self, tmp_path, **kw):
        cfg = ExperimentConfig(
            envs=["DiscreteCarFlag-v0"],
            num_steps=600,
            num_envs=8,
            in_embed=16,
            heads=2,
            layers=1,
            context=8,
            history=8,
            batch=4,
            buf_size=2000,
            eval_frequency=300,
            eval_episodes=2,
            prepop_steps=400,
            updates_per_iter=1,
            max_episode_steps=20,
            project_name="ckpt-test",
        )
        for k, v in kw.items():
            setattr(cfg, k, v)
        self._chdir(tmp_path)
        return cfg

    def _chdir(self, tmp_path):
        os.chdir(tmp_path)

    def test_completion_sentinel_short_circuits(self, tmp_path):
        cfg = self._config(tmp_path)
        out1 = run_experiment(cfg)
        assert "DiscreteCarFlag-v0/SuccessRate" in out1
        assert os.path.exists(cfg.policy_path() + "_mini_checkpoint.json")
        out2 = run_experiment(cfg)
        assert out2.get("completed") is True

    def test_time_limit_checkpoint_then_resume(self, tmp_path):
        cfg = self._config(tmp_path, time_limit=1e-9, num_steps=1200)
        out1 = run_experiment(cfg)  # hits the time limit immediately
        assert ckpt.has_checkpoint(cfg.policy_path())
        mini = ckpt.load_mini_checkpoint(cfg.policy_path())
        assert mini["step"] < 1200
        # Resume without the time limit: runs to completion.
        cfg2 = self._config(tmp_path, num_steps=1200)
        out2 = run_experiment(cfg2)
        assert "DiscreteCarFlag-v0/SuccessRate" in out2
        assert ckpt.load_mini_checkpoint(cfg2.policy_path())["step"] >= 1200
