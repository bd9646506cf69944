"""Preemption handling: the PreemptionGuard signal plumbing, and the
trainer's emergency mid-epoch checkpoint + clean early return."""
import os
import signal

import pytest

from dynamicvectorquantization_tpu.train import loop as loop_mod
from dynamicvectorquantization_tpu.train.loop import PreemptionGuard


def test_guard_catches_sigusr1_and_restores_handler():
    before = signal.getsignal(signal.SIGUSR1)
    with PreemptionGuard() as guard:
        assert not guard.should_stop
        os.kill(os.getpid(), signal.SIGUSR1)
        assert guard.should_stop
        assert guard.reason == "SIGUSR1"
    assert signal.getsignal(signal.SIGUSR1) is before


def test_guard_noop_outside_main_thread():
    import threading

    results = {}

    def run():
        with PreemptionGuard() as g:
            results["stop"] = g.should_stop

    t = threading.Thread(target=run)
    t.start()
    t.join()
    assert results["stop"] is False


class _StubGuard:
    """Reports preemption on the first post-step check."""

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    should_stop = True
    reason = "SIGTERM"


@pytest.mark.slow
def test_fit_saves_emergency_checkpoint(tmp_path, monkeypatch):
    monkeypatch.setattr(loop_mod, "PreemptionGuard", _StubGuard)
    import sys

    monkeypatch.setattr(sys, "argv", [
        "train.py", "--base", "configs/smoke/dqvae-dual-entropy-tiny.yml",
        "--max_epochs", "2", "--max_steps_per_epoch", "4",
        "--logdir", str(tmp_path), "--name", "pre",
    ])
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import train as train_cli

    train_cli.main()
    run_dir = next(p for p in tmp_path.iterdir() if p.name.startswith("pre"))
    ckpts = os.listdir(run_dir / "checkpoints")
    # preempted after the very first optimizer step -> step-1 checkpoint,
    # and no further steps ran (fit returned early)
    assert ckpts == ["1"], ckpts
