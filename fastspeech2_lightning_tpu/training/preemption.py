"""Preemption-safe training shutdown.

TPU fleets reclaim preemptible/spot VMs by delivering SIGTERM with a short
grace window. Training loops here respond by finishing the in-flight step,
writing a checkpoint, and exiting 0 so the scheduler's restart resumes at
the same step (training/loop.py, training/vocoder.py). The reference has no
equivalent — a killed Lightning run loses everything since the last cadence
checkpoint (fs2/cli/train.py resume path).
"""

from __future__ import annotations

import signal
from typing import Dict


def install_preemption_handler(
    signals=(signal.SIGTERM, signal.SIGINT),
) -> Dict[str, object]:
    """Arm a one-shot graceful-shutdown flag for `signals`.

    Returns a dict the training loop polls: {"flag": bool, "signum": int,
    "disarm": callable}. The FIRST signal sets the flag and immediately
    restores the original handlers, so a second signal (impatient operator,
    hard kill) behaves normally; a loop that finishes WITHOUT being
    signalled must call `disarm()` (loops here do, in a finally) so
    sequential fits never stack handlers. Outside the main thread (e.g. a
    Trainer driven from a server thread) signal handlers are illegal — the
    flag is returned un-armed and shutdown stays the caller's
    responsibility."""
    state: Dict[str, object] = {"flag": False, "signum": None}
    originals = {}

    def _restore():
        for s, h in list(originals.items()):
            try:
                signal.signal(s, h)
            except (ValueError, OSError):  # pragma: no cover - teardown race
                pass
        originals.clear()

    def _on_signal(signum, _frame):
        state["flag"] = True
        state["signum"] = signum
        _restore()

    state["disarm"] = _restore
    try:
        for s in signals:
            originals[s] = signal.signal(s, _on_signal)
    except ValueError:
        # not the main thread; leave handlers untouched
        _restore()
    return state
