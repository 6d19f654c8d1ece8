"""Unit tests for support components: epsilon schedules, CSV logging,
config/CLI, and multi-domain episode sampling.

Reference semantics: `/root/reference/utils/epsilon_anneal.py:33-34`
(multiplicative-decrement-to-min anneal), `utils/logging_utils.py:42-109`
(CSV schema), `run.py:16-184,456-460` (flags + 13-field run name),
`run.py:287,295` (per-episode env sampling over multiple --envs).
"""

import csv

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dtqn_tpu.config import ExperimentConfig, get_args
from dtqn_tpu.envs import make_env
from dtqn_tpu.envs.multi import MultiDomainEnv
from dtqn_tpu.utils.epsilon import ConstantEpsilon, EpsilonSchedule
from dtqn_tpu.utils.logging import CSVLogger, get_logger


class TestEpsilonSchedule:
    def test_matches_reference_recurrence(self):
        # val <- max(min, val - (val - min) / duration), stepped k times
        # (epsilon_anneal.py:33-34), vs the closed-form k-step update.
        sched = EpsilonSchedule(1.0, 0.1, duration=100)
        ref = 1.0
        val = sched.initial()
        for k in range(1, 250):
            ref = max(0.1, ref - (ref - 0.1) / 100)
            val = sched.anneal(val, 1)
            assert np.isclose(float(val), ref, atol=1e-5), k

    def test_closed_form_equals_iterated(self):
        sched = EpsilonSchedule(1.0, 0.1, duration=1000)
        step_by_step = sched.initial()
        for _ in range(64):
            step_by_step = sched.anneal(step_by_step, 1)
        jumped = sched.anneal(sched.initial(), 64)
        assert np.isclose(float(jumped), float(step_by_step), atol=1e-6)

    def test_clamps_at_end(self):
        sched = EpsilonSchedule(1.0, 0.1, duration=10)
        val = sched.anneal(sched.initial(), 10_000)
        assert np.isclose(float(val), 0.1, atol=1e-6)

    def test_zero_duration_is_noop(self):
        sched = EpsilonSchedule(1.0, 0.1, duration=0)
        assert float(sched.anneal(jnp.float32(0.7), 5)) == pytest.approx(0.7)

    def test_constant(self):
        sched = ConstantEpsilon(0.3, 0.3, duration=100)
        assert float(sched.anneal(jnp.float32(0.3), 99)) == pytest.approx(0.3)


class TestCSVLogger:
    ENVS = ["DiscreteCarFlag-v0", "Memory-5-v0"]

    def _log_vals(self, hours=0.5):
        vals = {"losses/hours": hours}
        for k in (
            "TD_Error", "Grad_Norm", "Max_Q_Value", "Mean_Q_Value",
            "Min_Q_Value", "Max_Target_Value", "Mean_Target_Value",
            "Min_Target_Value",
        ):
            vals[f"losses/{k}"] = 1.0
        for i, env in enumerate(self.ENVS):
            vals[f"{env}/SuccessRate"] = 0.5 + i
            vals[f"{env}/Return"] = 1.5 + i
            vals[f"{env}/EpisodeLength"] = 20.0 + i
        return vals

    def test_schema_and_rows(self, tmp_path):
        # Headers match the reference CSV schema (logging_utils.py:55-81).
        path = str(tmp_path / "run")
        logger = CSVLogger(path, self.ENVS)
        logger.log(self._log_vals(), step=5000)
        logger.log(self._log_vals(hours=1.0), step=10000)

        with open(path + "_results.csv") as f:
            rows = list(csv.reader(f))
        assert rows[0] == ["Hours", "Step"] + [
            f"{e}/{m}"
            for e in self.ENVS
            for m in ("SuccessRate", "EpisodeLength", "Return")
        ]
        assert len(rows) == 3 and rows[1][1] == "5000"
        assert float(rows[1][2]) == 0.5 and float(rows[1][4]) == 1.5

        with open(path + "_losses.csv") as f:
            lrows = list(csv.reader(f))
        assert lrows[0] == [
            "Hours", "Step", "TD Error", "Grad Norm", "Max Q Value",
            "Mean Q Value", "Min Q Value", "Max Target Value",
            "Mean Target Value", "Min Target Value",
        ]
        assert len(lrows) == 3

    def test_append_on_reopen(self, tmp_path):
        # Resume reuses the existing files without rewriting headers.
        path = str(tmp_path / "run")
        CSVLogger(path, self.ENVS).log(self._log_vals(), step=1)
        CSVLogger(path, self.ENVS).log(self._log_vals(), step=2)
        with open(path + "_results.csv") as f:
            rows = list(csv.reader(f))
        assert [r[1] for r in rows[1:]] == ["1", "2"]

    def test_get_logger_falls_back_to_csv(self, tmp_path):
        cfg = ExperimentConfig(disable_wandb=True)
        logger = get_logger(str(tmp_path / "run"), cfg)
        assert isinstance(logger, CSVLogger)


class TestConfig:
    def test_cli_round_trip(self):
        cfg = get_args(
            [
                "--model", "DRQN", "--envs", "Memory-5-v0", "gv_memory.5x5",
                "--num-steps", "1234", "--context", "10", "--heads", "4",
                "--gate", "gru", "--identity", "--pos", "sin",
                "--bag-size", "3", "--num-envs", "16", "--bf16",
                "--attention", "pallas", "--lr", "1e-3",
                "--eps-min", "0.3", "--outer-unroll", "2",
            ]
        )
        assert cfg.model == "DRQN"
        assert cfg.envs == ["Memory-5-v0", "gv_memory.5x5"]
        assert cfg.num_steps == 1234 and cfg.context == 10
        assert cfg.heads == 4 and cfg.gate == "gru" and cfg.identity
        assert cfg.pos == "sin" and cfg.bag_size == 3
        assert cfg.num_envs == 16 and cfg.bf16
        assert cfg.attention == "pallas" and cfg.lr == pytest.approx(1e-3)
        assert cfg.eps_min == pytest.approx(0.3) and cfg.outer_unroll == 2

    def test_run_name_has_13_fields(self):
        # 13-field config-encoded policy filename (run.py:456-460).
        name = ExperimentConfig().run_name()
        assert name.count("=") == 15  # 13 config fields + envs + seed
        for field in (
            "model=", "envs=", "obs_embed=", "a_embed=", "in_embed=",
            "context=", "heads=", "layers=", "batch=", "gate=", "identity=",
            "history=", "pos=", "bag=", "seed=",
        ):
            assert field in name

    def test_resolved_knobs(self):
        cfg = ExperimentConfig(num_envs=32, eval_frequency=5000)
        # 1 gradient update per env step by default (run.py:290-298).
        assert cfg.resolved_updates_per_iter == 32
        assert cfg.resolved_iters_per_chunk == 5000 // 32
        cfg2 = ExperimentConfig(updates_per_iter=4, iters_per_chunk=7)
        assert cfg2.resolved_updates_per_iter == 4
        assert cfg2.resolved_iters_per_chunk == 7


class TestMultiDomain:
    def test_rejects_mismatched_spaces(self):
        with pytest.raises(ValueError):
            MultiDomainEnv(
                [make_env("DiscreteCarFlag-v0"), make_env("Memory-5-v0")]
            )

    def test_samples_all_domains_and_dispatches(self):
        from dtqn_tpu.envs.gridverse import make_gridverse_env

        members = [
            make_gridverse_env("gv_memory.5x5", pad_to=7),
            make_gridverse_env("gv_memory.7x7", pad_to=7),
        ]
        env = MultiDomainEnv(members)
        assert env.max_episode_steps == max(
            m.max_episode_steps for m in members
        )

        domains = set()
        for seed in range(16):
            key = jax.random.key(seed)
            obs, state = env.reset_env(key)
            domains.add(int(state.domain))
            # Dispatch parity: stepping the wrapper == stepping the member.
            k = jax.random.key(seed + 100)
            a = jnp.int32(seed % env.num_actions)
            o1, s1, r1, t1, i1 = env.step_env(k, state, a)
            o2, s2, r2, t2, i2 = members[int(state.domain)].step_env(
                k, state.inner, a
            )
            np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
            assert float(r1) == float(r2) and bool(t1) == bool(t2)
        assert domains == {0, 1}
