"""Host-loop runner tests (train/host_loop.py + envs/host.py).

MiniHack itself is an optional external C package; the loop's machinery is
exercised with an in-repo fake host env, and a real MH-Room-5-v0 smoke is
gated on ``minihack`` being installed (like the reference's soft import,
envs/__init__.py:20-24).
"""

import os

import numpy as np
import pytest

from dtqn_tpu.config import ExperimentConfig
from dtqn_tpu.envs.core import ObsKind
from dtqn_tpu.envs.host import HostEnvironment, HostVecEnv
from dtqn_tpu.envs.minihack import MH_SPECS, minihack_available
from dtqn_tpu.train.host_loop import run_host_experiment


class CueHostEnv(HostEnvironment):
    """Tiny host-side memory task: observe a cue token at t=0, then blanks;
    acting `cue` at any point terminates with +1 (else episode times out)."""

    name = "CueHost-v0"
    num_actions = 2
    max_episode_steps = 8
    obs_kind = ObsKind.DISCRETE
    obs_shape = (1,)
    obs_dtype = np.int32

    def __init__(self, seed=0):
        self.rng = np.random.default_rng(seed)
        self.cue = 0
        self.t = 0

    @property
    def obs_mask(self) -> float:
        return 3.0  # tokens {0, 1, 2}; mask one past

    def seed(self, seed: int) -> None:
        self.rng = np.random.default_rng(seed)

    def reset(self):
        self.cue = int(self.rng.integers(0, 2))
        self.t = 0
        return np.array([self.cue], np.int32)

    def step(self, action):
        self.t += 1
        if action == self.cue:
            return (
                np.array([2], np.int32),
                1.0,
                True,
                {"is_success": True},
            )
        return np.array([2], np.int32), -0.1, False, {}


def host_cfg(**kw):
    cfg = ExperimentConfig(
        envs=["CueHost-v0"],
        num_steps=300,
        num_envs=4,
        in_embed=16,
        heads=2,
        layers=1,
        context=8,
        history=8,
        batch=4,
        buf_size=800,
        eval_frequency=150,
        eval_episodes=3,
        prepop_steps=100,
        updates_per_iter=1,
        project_name="host-test",
    )
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


class TestHostVecEnv:
    def test_time_limit_and_autoreset(self):
        vec = HostVecEnv([CueHostEnv(seed=i) for i in range(3)])
        obs = vec.reset_all()
        assert obs.shape == (3, 1) and set(obs.ravel()) <= {0, 1}
        # Drive wrong actions until the time limit trips.
        last = None
        for t in range(8):
            cues = [e.cue for e in vec.envs]
            wrong = np.array([1 - c for c in cues], np.int64)
            last = vec.step(wrong)
        assert last["done"].all()  # time limit at 8
        assert not last["terminated"].any()  # truncation, not termination
        # reset_obs is a fresh cue, next_obs is the true (blank) next obs.
        assert set(last["reset_obs"].ravel()) <= {0, 1}
        assert (last["next_obs"].ravel() == 2).all()

    def test_termination_counts_as_done(self):
        vec = HostVecEnv([CueHostEnv(seed=5)])
        vec.reset_all()
        cue = vec.envs[0].cue
        out = vec.step(np.array([cue]))
        assert out["done"][0] and out["terminated"][0]
        assert out["is_success"][0]


class TestHostLoop:
    def test_trains_end_to_end(self, tmp_path):
        cfg = host_cfg()
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            out = run_host_experiment(
                cfg, env_factory=lambda name: CueHostEnv()
            )
        finally:
            os.chdir(cwd)
        assert "CueHost-v0/SuccessRate" in out
        assert np.isfinite(out["losses/TD_Error"])
        p = cfg.policy_path(str(tmp_path))
        assert os.path.exists(p + "_results.csv")
        assert os.path.exists(p + "_mini_checkpoint.json")

    def test_time_limit_checkpoint_then_resume(self, tmp_path):
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            cfg = host_cfg(time_limit=1e-9, num_steps=600)
            run_host_experiment(cfg, env_factory=lambda name: CueHostEnv())
            from dtqn_tpu.utils import checkpoint as ckpt

            assert ckpt.has_checkpoint(cfg.policy_path())
            cfg2 = host_cfg(num_steps=600)
            out = run_host_experiment(
                cfg2, env_factory=lambda name: CueHostEnv()
            )
            assert ckpt.load_mini_checkpoint(cfg2.policy_path())["step"] >= 600
            assert "CueHost-v0/SuccessRate" in out
        finally:
            os.chdir(cwd)

    def test_learns_cue_task(self, tmp_path):
        """The loop actually learns: the cue task is solvable from context."""
        cfg = host_cfg(
            num_steps=3000, eval_frequency=1500, eval_episodes=10,
            prepop_steps=400,
        )
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            out = run_host_experiment(
                cfg, env_factory=lambda name: CueHostEnv()
            )
        finally:
            os.chdir(cwd)
        assert out["CueHost-v0/SuccessRate"] >= 0.7


@pytest.mark.skipif(
    not minihack_available(), reason="minihack not installed"
)
class TestRealMiniHack:
    def test_mh_room_smoke(self, tmp_path):
        cfg = host_cfg(
            envs=["MH-Room-5-v0"], num_steps=200, num_envs=2,
            prepop_steps=50, eval_frequency=100, eval_episodes=2,
        )
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            out = run_host_experiment(cfg)
        finally:
            os.chdir(cwd)
        assert "MH-Room-5-v0/SuccessRate" in out

    def test_all_specs_resolve(self):
        from dtqn_tpu.envs.minihack import HostMiniHack

        for name in MH_SPECS:
            env = HostMiniHack(name)
            obs = env.reset()
            assert obs.shape == env.obs_shape
