"""Vmapped multi-seed sweep tests (train/sweep.py).

The reference runs seeds 1-5 as separate processes
(`/root/reference/README.md:124-125`); the sweep stacks them on one chip.
"""

import os

import numpy as np
import pytest

from dtqn_tpu.config import ExperimentConfig, get_args
from dtqn_tpu.train.sweep import run_sweep, sweep_path
from dtqn_tpu.utils import checkpoint as ckpt


def small_cfg(**kw):
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
        project_name="sweep-test",
        save_policy=True,
    )
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


class TestSweep:
    def test_two_seed_sweep_end_to_end(self, tmp_path):
        cfg = small_cfg()
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            out = run_sweep(cfg, [1, 2])
        finally:
            os.chdir(cwd)

        assert set(out) == {1, 2}
        for s in (1, 2):
            assert "DiscreteCarFlag-v0/SuccessRate" in out[s]
            assert np.isfinite(out[s]["losses/TD_Error"])

        # Per-seed CSV artifacts at the same paths single-seed runs use.
        import dataclasses

        for s in (1, 2):
            c = dataclasses.replace(cfg, seed=s)
            p = c.policy_path(str(tmp_path))
            assert os.path.exists(p + "_results.csv")
            assert os.path.exists(p + "_losses.csv")
            assert os.path.exists(p + "_policy.msgpack")

        # Seeds evolve independently: diagnostics differ.
        assert (
            out[1]["losses/Mean_Q_Value"] != out[2]["losses/Mean_Q_Value"]
        )

        # Completion sentinel short-circuits a rerun.
        os.chdir(tmp_path)
        try:
            again = run_sweep(cfg, [1, 2])
        finally:
            os.chdir(cwd)
        assert again.get("completed") is True

    def test_time_limit_checkpoint_then_resume(self, tmp_path):
        cfg = small_cfg(time_limit=1e-9, num_steps=1200)
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            run_sweep(cfg, [3, 4])
            ck = sweep_path(cfg, [3, 4])
            assert ckpt.has_checkpoint(ck)
            assert ckpt.load_mini_checkpoint(ck)["step"] < 1200
            cfg2 = small_cfg(num_steps=1200)
            out = run_sweep(cfg2, [3, 4])
            assert ckpt.load_mini_checkpoint(ck)["step"] >= 1200
            assert "DiscreteCarFlag-v0/SuccessRate" in out[3]
        finally:
            os.chdir(cwd)

    def test_cli_dispatch(self):
        cfg = get_args(["--seeds", "1", "2", "3"])
        assert cfg.seeds == [1, 2, 3]
