"""Policy-seeded sweep continuation (tools/seed_sweep_checkpoint.py).

Covers the crash-recovery/extension path used in round 3: a sweep whose
full stacked checkpoint is missing (pre-round-3 completion, or a tunnel
stall) is continued by rebuilding the stacked state from per-seed policy
snapshots, pinning counters, and resuming via the normal run_sweep
checkpoint machinery.
"""

import importlib.util
import os
import sys

import jax


def _load_tool():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "seed_sweep_checkpoint",
        os.path.join(root, "tools", "seed_sweep_checkpoint.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_continuation_resumes_past_original_budget(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from dtqn_tpu.config import get_args
    from dtqn_tpu.train.sweep import run_sweep

    base = [
        "--envs", "DiscreteCarFlag-v0", "--in-embed", "8", "--heads", "2",
        "--layers", "1", "--prepop-steps", "200", "--disable-wandb",
        "--save-policy", "--project-name", "cont",
    ]
    # Original sweep: one chunk's worth of steps, policies saved.
    cfg = get_args([*base, "--num-steps", "4000"])
    run_sweep(cfg, [1, 2])

    # Simulate the missing-stacked-checkpoint case (stall / old code).
    from dtqn_tpu.train.sweep import sweep_path
    from dtqn_tpu.utils import checkpoint as ckpt

    ck = sweep_path(cfg, [1, 2])
    for suffix in ("_checkpoint.msgpack", "_mini_checkpoint.json"):
        p = ck + suffix
        if os.path.exists(p):
            os.remove(p)
    assert not ckpt.has_checkpoint(ck)

    # Rebuild a stacked checkpoint from the per-seed policies at 4992.
    tool = _load_tool()
    monkeypatch.setattr(
        sys, "argv",
        ["seed_sweep_checkpoint", *base, "--seeds", "1", "2",
         "--at-step", "4992"],
    )
    tool.main()
    assert ckpt.has_checkpoint(ck)

    # Resume with a LARGER budget: must pick up at 4992 and continue.
    cfg2 = get_args([*base, "--num-steps", "9000"])
    out = run_sweep(cfg2, [1, 2])
    mini = ckpt.load_mini_checkpoint(ck)
    assert mini["step"] >= 9000
    assert set(out) == {1, 2}
