"""Stub-based coverage of the wandb logger branch.

wandb is not installed in this image, so ``get_logger``'s wandb path
(utils/logging.py:99-123 — parity with the reference's
`utils/logging_utils.py:112-136`) would otherwise ship untested.  These
tests inject a fake ``wandb`` module into ``sys.modules`` and check the
init arguments, the resume-"must" kwargs the runner builds from a mini
checkpoint, and the ImportError fallback to CSV.
"""

import sys
import types

from dtqn_tpu.config import get_args
from dtqn_tpu.utils.logging import CSVLogger, get_logger, WANDB_GROUP_KEYS


class _FakeRun:
    id = "run-abc123"


def _fake_wandb(record):
    mod = types.ModuleType("wandb")

    def init(**kwargs):
        record.update(kwargs)
        mod.run = _FakeRun()
        return mod

    mod.init = init
    mod.run = None
    mod.log = lambda *a, **k: record.setdefault("logged", []).append((a, k))
    return mod


def _config(*extra):
    return get_args(
        ["--envs", "DiscreteCarFlag-v0", "--in-embed", "64", *extra]
    )


def test_wandb_branch_inits_with_group_and_config(tmp_path, monkeypatch):
    record = {}
    monkeypatch.chdir(tmp_path)
    monkeypatch.setitem(sys.modules, "wandb", _fake_wandb(record))
    config = _config()
    config.disable_wandb = False

    logger = get_logger(config.policy_path(), config, {})

    assert logger is sys.modules["wandb"]
    assert record["project"] == config.project_name
    # Group = the reference's 11 config keys (logging_utils.py:120-132).
    for key in WANDB_GROUP_KEYS:
        assert f"{key}={getattr(config, key)}" in record["group"]
    assert "in_embed=64" in record["group"]
    assert record["config"]["envs"] == ["DiscreteCarFlag-v0"]
    # The runner reads logger.run.id to stash in the mini checkpoint.
    assert getattr(getattr(logger, "run", None), "id", None) == "run-abc123"


def test_wandb_resume_must_kwargs_forwarded(tmp_path, monkeypatch):
    record = {}
    monkeypatch.chdir(tmp_path)
    monkeypatch.setitem(sys.modules, "wandb", _fake_wandb(record))
    config = _config()
    config.disable_wandb = False

    # The kwargs the runner builds on resume (train/runner.py:154).
    get_logger(config.policy_path(), config, {"resume": "must", "id": "w-77"})
    assert record["resume"] == "must"
    assert record["id"] == "w-77"


def test_wandb_missing_falls_back_to_csv(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setitem(sys.modules, "wandb", None)  # import -> ImportError
    config = _config()
    config.disable_wandb = False
    logger = get_logger(config.policy_path(), config, {})
    assert isinstance(logger, CSVLogger)
