"""Preemption-safe shutdown (training/preemption.py).

TPU fleets reclaim spot VMs with SIGTERM + a grace window; training must
checkpoint and exit 0 so the restart resumes at the same step."""

import os
import signal

import pytest


from fastspeech2_lightning_tpu.training.preemption import (
    install_preemption_handler,
)
from helpers import make_training_workspace


def test_handler_one_shot_and_restores():
    """First signal sets the flag and restores the ORIGINAL handlers, so a
    second signal behaves normally (hard kill for impatient operators)."""
    original = signal.getsignal(signal.SIGTERM)
    state = install_preemption_handler(signals=(signal.SIGTERM,))
    assert state["flag"] is False
    assert signal.getsignal(signal.SIGTERM) is not original
    os.kill(os.getpid(), signal.SIGTERM)
    assert state["flag"] is True
    assert state["signum"] == signal.SIGTERM
    assert signal.getsignal(signal.SIGTERM) is original


def test_non_main_thread_is_a_noop():
    import threading

    original = signal.getsignal(signal.SIGTERM)
    results = {}

    def run():
        results["state"] = install_preemption_handler(
            signals=(signal.SIGTERM,)
        )

    t = threading.Thread(target=run)
    t.start()
    t.join()
    assert results["state"]["flag"] is False
    assert signal.getsignal(signal.SIGTERM) is original


def test_disarm_restores_without_signal():
    """A loop that finishes unsignalled calls disarm() — sequential fits
    must never stack handlers."""
    original = signal.getsignal(signal.SIGTERM)
    state = install_preemption_handler(signals=(signal.SIGTERM,))
    assert signal.getsignal(signal.SIGTERM) is not original
    state["disarm"]()
    assert signal.getsignal(signal.SIGTERM) is original
    # disarm is idempotent
    state["disarm"]()
    assert signal.getsignal(signal.SIGTERM) is original


@pytest.mark.slow
def test_sigterm_checkpoints_and_exits_cleanly(tmp_path, monkeypatch):
    """fit() under SIGTERM finishes the in-flight step, writes a checkpoint
    at that exact step, returns normally, and the run resumes from it."""
    from fastspeech2_lightning_tpu.training.checkpoint import (
        latest_checkpoint,
        load_checkpoint,
    )
    from fastspeech2_lightning_tpu.training.loop import Trainer

    cfg = make_training_workspace(
        tmp_path, max_steps=500, ckpt_steps=10_000, val_check_interval=10_000
    )
    handler_before_fit = signal.getsignal(signal.SIGTERM)
    trainer = Trainer(cfg)
    # deliver SIGTERM from inside the first step's logging callback — the
    # deterministic stand-in for a fleet preemption mid-run
    real_log = trainer._log
    fired = {"done": False}

    def log_and_preempt(tag, value, step):
        if not fired["done"]:
            fired["done"] = True
            os.kill(os.getpid(), signal.SIGTERM)
        return real_log(tag, value, step)

    monkeypatch.setattr(trainer, "_log", log_and_preempt)
    state = trainer.fit()  # must NOT be killed
    stopped_at = int(state.step)
    assert 1 <= stopped_at < 500
    # the final checkpoint is at the preempted step
    ckpt = latest_checkpoint(trainer.ckpt_dir)
    assert ckpt is not None
    meta, _arrays = load_checkpoint(ckpt)
    assert meta["global_step"] == stopped_at
    # the pre-fit disposition is back in place (whatever it was — earlier
    # suite tests may legitimately leave a non-default handler installed)
    assert signal.getsignal(signal.SIGTERM) == handler_before_fit
    # and the run resumes exactly where it stopped
    trainer2 = Trainer(cfg)
    state2 = trainer2.fit(max_steps=stopped_at + 2, resume=True)
    assert int(state2.step) == stopped_at + 2


def test_resume_restores_epoch(tmp_path, monkeypatch):
    """The epoch counter persists across resume — the bin-loss warmup and
    max_epochs budget must not restart from epoch 0 (regression)."""
    import json

    from fastspeech2_lightning_tpu.training.checkpoint import (
        latest_checkpoint,
    )
    from fastspeech2_lightning_tpu.training.loop import Trainer

    cfg = make_training_workspace(
        tmp_path, max_steps=8, ckpt_steps=10_000, val_check_interval=10_000
    )
    trainer = Trainer(cfg)
    trainer.fit(max_steps=8, resume=False)  # 2 utterances/epoch -> epochs>0
    ckpt = latest_checkpoint(trainer.ckpt_dir)
    meta = json.loads((ckpt / "meta.json").read_text())
    assert meta["epoch"] is not None and meta["epoch"] > 0
    trainer2 = Trainer(cfg)
    trainer2.fit(max_steps=9, resume=True)
    assert int(getattr(trainer2, "_epoch")) >= meta["epoch"]
