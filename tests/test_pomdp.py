"""Tabular POMDP engine, classic domains, and .pomdp parser tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dtqn_tpu.envs import make_env
from dtqn_tpu.envs.pomdp import make_hallway, make_heavenhell
from dtqn_tpu.envs.pomdp_parser import (
    make_tabular_env,
    parse_pomdp_file,
    parse_pomdp_text,
    parse_pomdp_text_native,
)

TIGER = os.path.join(os.path.dirname(__file__), "data", "tiger.pomdp")


class TestHeavenHell:
    def setup_method(self):
        self.env = make_heavenhell(3)

    def _run(self, actions, key=0, reset_key=5):
        obs, st = self.env.reset(jax.random.key(reset_key))
        key = jax.random.key(key)
        r = term = info = None
        for a in actions:
            key, k = jax.random.split(key)
            obs, st, r, term, info = self.env.step_env(k, st, jnp.int32(a))
        return obs, st, r, term, info

    def test_metadata(self):
        assert self.env.num_actions == 4
        assert self.env.num_obs == 12  # 10 positions + 2 priest obs
        assert self.env.obs_mask == 12.0
        assert self.env.obs_length == 1

    def test_priest_reveals_side_and_optimal_play(self):
        # Walk to the priest (3x down), read the side, return, take the arm.
        obs, *_ = self._run([2, 2, 2])
        side = int(obs[0]) - 10
        assert side in (0, 1)
        arm = [0] * 4 if side == 0 else [1] * 4
        _, _, r, term, info = self._run([2, 2, 2, 3, 3, 3] + arm)
        assert bool(term) and float(r) == 1.0 and bool(info["is_success"])

    def test_wrong_arm_is_hell(self):
        obs, *_ = self._run([2, 2, 2])
        side = int(obs[0]) - 10
        arm = [1] * 4 if side == 0 else [0] * 4
        _, _, r, term, info = self._run([2, 2, 2, 3, 3, 3] + arm)
        assert bool(term) and float(r) == -1.0 and not bool(info["is_success"])

    def test_heaven_side_random(self):
        sides = set()
        for seed in range(16):
            obs, st = self.env.reset(jax.random.key(seed))
            sides.add(int(st.s) // 10)
        assert sides == {0, 1}

    def test_tables_are_stochastic_rows(self):
        T = np.asarray(self.env._T)
        np.testing.assert_allclose(T.sum(-1), 1.0, atol=1e-6)
        O = np.asarray(self.env._O)
        np.testing.assert_allclose(O.sum(-1), 1.0, atol=1e-6)


class TestHallway:
    def test_reachable_and_stochastic(self):
        env = make_hallway()
        T = np.asarray(env._T)
        np.testing.assert_allclose(T.sum(-1), 1.0, atol=1e-6)
        O = np.asarray(env._O)
        np.testing.assert_allclose(O.sum(-1), 1.0, atol=1e-6)
        # Random policy reaches the goal eventually.
        obs, st = env.reset(jax.random.key(0))
        key = jax.random.key(1)
        goals = 0
        for _ in range(600):
            key, ka, ks, kr = jax.random.split(key, 4)
            a = jax.random.randint(ka, (), 0, env.num_actions)
            obs, st, r, term, info = env.step_env(ks, st, a)
            if bool(term):
                assert float(r) == 1.0 and bool(info["is_success"])
                goals += 1
                obs, st = env.reset(kr)
        assert goals > 0

    def test_registry_and_vectorized(self):
        env = make_env("POMDP-hallway-episodic-v0")
        keys = jax.random.split(jax.random.key(0), 8)
        obs, states = env.reset_vec(keys)
        assert obs.shape == (8, 1)
        obs, states, ts = env.step_vec(
            jax.random.split(jax.random.key(1), 8),
            states,
            jnp.ones((8,), jnp.int32),
        )
        assert ts.reward.shape == (8,)


class TestParser:
    def test_tiger_python(self):
        p = parse_pomdp_text(open(TIGER).read())
        assert p.discount == 0.95
        assert p.states == ["tiger-left", "tiger-right"]
        assert len(p.actions) == 3 and len(p.observations) == 2
        np.testing.assert_allclose(p.start, [0.5, 0.5])
        # listen keeps state (identity), open-* resets uniformly.
        np.testing.assert_allclose(p.T[:, 0, :], np.eye(2))
        np.testing.assert_allclose(p.T[:, 1, :], 0.5)
        # listening observation accuracy 0.85.
        np.testing.assert_allclose(p.O[0, 0], [0.85, 0.15])
        np.testing.assert_allclose(p.O[0, 1], [0.15, 0.85])
        # rewards
        assert p.R[0, 0, 0] == -1.0
        assert p.R[0, 1, 0] == -100.0 and p.R[1, 1, 0] == 10.0

    def test_native_matches_python(self):
        text = open(TIGER).read()
        native = parse_pomdp_text_native(text)
        if native is None:
            pytest.skip("native parser not built (make -C native)")
        py = parse_pomdp_text(text)
        np.testing.assert_allclose(native.T, py.T, atol=1e-6)
        np.testing.assert_allclose(native.O, py.O, atol=1e-6)
        np.testing.assert_allclose(native.R, py.R, atol=1e-6)
        np.testing.assert_allclose(native.start, py.start, atol=1e-6)
        assert native.discount == py.discount

    def test_cost_values_negate(self):
        text = open(TIGER).read().replace("values: reward", "values: cost")
        py = parse_pomdp_text(text)
        assert py.R[0, 0, 0] == 1.0  # cost -1 -> reward +1... negated
        native = parse_pomdp_text_native(text)
        if native is not None:
            np.testing.assert_allclose(native.R, py.R, atol=1e-6)

    def test_make_env_from_file(self):
        env = make_tabular_env(
            parse_pomdp_file(TIGER), name="tiger-v0", max_episode_steps=20
        )
        obs, st = env.reset(jax.random.key(0))
        obs, st, r, term, info = env.step_env(
            jax.random.key(1), st, jnp.int32(0)
        )
        assert float(r) == -1.0 and not bool(term)


class TestPomdpFileCLI:
    """`.pomdp` paths resolve through make_env and train end-to-end —
    the reference reaches these via gym-pomdps (README.md:102-103)."""

    def test_make_env_resolves_pomdp_path(self):
        env = make_env(TIGER)
        assert env.num_actions == 3 and env.num_obs == 2
        assert env.max_episode_steps == 100
        # tiger is continuing: no absorbing terminal states detected.
        assert not bool(np.asarray(env._terminal).any())

    def test_make_env_missing_file_raises(self):
        with pytest.raises(FileNotFoundError):
            make_env("does-not-exist.pomdp")

    def test_absorbing_state_detection(self):
        from dtqn_tpu.envs.pomdp_parser import absorbing_states

        text = open(TIGER).read()
        p = parse_pomdp_text(text)
        # Rewire: open-left (a=1) from tiger-left jumps to an absorbing
        # copy of state 0 -- emulate by making action 1 self-loop with no
        # reward from state 1.
        p.T[1, :, :] = 0.0
        p.T[1, :, 1] = 1.0
        p.R[1, :, :] = 0.0
        flags = absorbing_states(p)
        assert list(flags) == [False, True]

    def test_trains_end_to_end_from_cli_path(self, tmp_path):
        """--envs tiger.pomdp runs the full runner loop."""
        import os

        from dtqn_tpu.config import get_args
        from dtqn_tpu.train.runner import run_experiment

        cfg = get_args(
            [
                "--envs", TIGER,
                "--num-steps", "400",
                "--num-envs", "8",
                "--prepop-steps", "200",
                "--context", "8",
                "--history", "8",
                "--in-embed", "16",
                "--heads", "2",
                "--layers", "1",
                "--batch", "4",
                "--buf-size", "2000",
                "--eval-frequency", "200",
                "--eval-episodes", "2",
                "--max-episode-steps", "10",
                "--updates-per-iter", "1",
                "--project-name", "pomdp-cli-test",
            ]
        )
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            out = run_experiment(cfg)
        finally:
            os.chdir(cwd)
        assert f"{TIGER}/SuccessRate" in out
        assert np.isfinite(out["losses/TD_Error"])

    def test_hallway_prefers_real_file(self, tmp_path, monkeypatch):
        """A real hallway.pomdp overrides the in-tree reconstruction."""
        # Stand-in "real" file: tiger tables under the hallway name.
        (tmp_path / "hallway.pomdp").write_text(open(TIGER).read())
        monkeypatch.setenv("DTQN_TPU_POMDP_DIR", str(tmp_path))
        env = make_env("POMDP-hallway-episodic-v0")
        assert env.num_actions == 3  # tiger's, not the reconstruction's 5
        monkeypatch.delenv("DTQN_TPU_POMDP_DIR")
        env = make_env("POMDP-hallway-episodic-v0")
        assert env.num_actions == 5  # reconstruction fallback


class TestVendoredHallway:
    """The vendored data/hallway.pomdp (exported from the reconstruction;
    see tools/export_pomdp.py) and the Cassandra writer it rides on."""

    DATA = os.path.join(
        os.path.dirname(__file__), "..", "data", "hallway.pomdp"
    )

    def test_vendored_file_matches_reconstruction_bitwise(self):
        """Guard against staleness: file on disk == make_hallway tables."""
        ref = make_hallway()
        parsed = parse_pomdp_text(open(self.DATA).read())
        assert (len(parsed.states), len(parsed.actions),
                len(parsed.observations)) == (60, 5, 21)
        np.testing.assert_array_equal(parsed.T, np.asarray(ref._T))
        np.testing.assert_array_equal(parsed.O, np.asarray(ref._O))
        np.testing.assert_array_equal(parsed.R, np.asarray(ref._R))
        np.testing.assert_array_equal(parsed.start, np.asarray(ref._start))

    def test_native_parser_at_scale(self):
        """py vs C++ differential on the full-scale vendored file."""
        from dtqn_tpu.envs.pomdp_parser import parse_pomdp_text_native

        text = open(self.DATA).read()
        nat = parse_pomdp_text_native(text)
        if nat is None:
            pytest.skip("native parser not built")
        py = parse_pomdp_text(text)
        np.testing.assert_array_equal(nat.T, py.T)
        np.testing.assert_array_equal(nat.O, py.O)
        np.testing.assert_array_equal(nat.R, py.R)
        np.testing.assert_array_equal(nat.start, py.start)

    def test_registry_defaults_to_vendored_file(self, tmp_path, monkeypatch):
        """With no override, the hallway env loads data/hallway.pomdp via
        the parser path and its tables equal the reconstruction's."""
        monkeypatch.chdir(tmp_path)  # no hallway.pomdp in cwd
        monkeypatch.delenv("DTQN_TPU_POMDP_DIR", raising=False)
        env = make_env("POMDP-hallway-episodic-v0")
        ref = make_hallway()
        np.testing.assert_array_equal(
            np.asarray(env._T), np.asarray(ref._T)
        )
        np.testing.assert_array_equal(
            np.asarray(env._terminal), np.asarray(ref._terminal)
        )

    def test_writer_roundtrip_heavenhell(self):
        """Writer->parser round trip is float32-exact on a second domain."""
        from dtqn_tpu.envs.pomdp_parser import pomdp_to_cassandra

        ref = make_heavenhell(3)
        text = pomdp_to_cassandra(
            np.asarray(ref._T), np.asarray(ref._O), np.asarray(ref._R),
            np.asarray(ref._start),
        )
        parsed = parse_pomdp_text(text)
        np.testing.assert_array_equal(parsed.T, np.asarray(ref._T))
        np.testing.assert_array_equal(parsed.O, np.asarray(ref._O))
        np.testing.assert_array_equal(parsed.R, np.asarray(ref._R))
        np.testing.assert_array_equal(parsed.start, np.asarray(ref._start))


class TestHallwayClassicDimensions:
    """Round-4 upgrade: the reconstruction matches every documented
    dimension of Littman-Cassandra-Kaelbling Hallway (60/5/21)."""

    def test_dimensions_and_stochasticity(self):
        env = make_hallway()
        assert (env.num_states, env.num_actions, env.num_obs) == (60, 5, 21)
        T = np.asarray(env._T)
        O = np.asarray(env._O)
        np.testing.assert_allclose(T.sum(-1), 1.0, atol=1e-6)
        np.testing.assert_allclose(O.sum(-1), 1.0, atol=1e-6)
        # Exactly one goal cell => 4 terminal orientation states.
        assert int(np.asarray(env._terminal).sum()) == 4
        # +1 reward only into goal states.
        R = np.asarray(env._R)
        term = np.asarray(env._terminal)
        assert set(np.unique(R)) <= {0.0, 1.0}
        assert R[:, :, ~term].max() == 0.0 and R[:, :, term].max() == 1.0
        # Start: uniform over the 56 non-goal states.
        start = np.asarray(env._start)
        assert np.allclose(start[term], 0.0)
        assert np.allclose(start[~term], 1.0 / 56)

    def test_noisy_forward_and_landmarks(self):
        env = make_hallway()
        T = np.asarray(env._T)
        O = np.asarray(env._O)
        # Corridor cell 0 facing E (state 1): forward moves w.p. 0.8.
        s = 0 * 4 + 1
        assert T[s, 1].max() == pytest.approx(0.8)
        # The goal alcove emits the star (obs 20) w.p. 0.9.
        term = np.where(np.asarray(env._terminal))[0]
        for s in term:
            assert O[0, s, 20] == pytest.approx(0.9, abs=1e-3)
        # Landmark observations 16..19 each appear with weight 0.9
        # somewhere (the facing-the-alcove corridor states).
        for lm in (16, 17, 18, 19):
            assert O[0, :, lm].max() == pytest.approx(0.9, abs=1e-3)
