"""Checkpoint writes must publish atomically; discovery must skip debris.

Regression for a live failure: a stall watchdog escalated SIGTERM→SIGKILL
during the vocoder's preemption checkpoint, leaving step=2050/ with orbax
arrays but no meta.json; the next resume picked it as newest and crashed
with FileNotFoundError. Saves now write into step=N.tmp and rename after
meta.json lands; discovery skips .tmp dirs and metaless dirs.
"""

import json

import jax.numpy as jnp
import numpy as np


def test_latest_checkpoint_skips_incomplete_dirs(tmp_path):
    from fastspeech2_lightning_tpu.training.checkpoint import (
        latest_checkpoint,
    )

    good = tmp_path / "step=100"
    good.mkdir()
    (good / "meta.json").write_text(json.dumps({"global_step": 100}))
    # newer but half-written (no meta.json) — the live-observed state
    (tmp_path / "step=200").mkdir()
    # in-progress atomic write
    (tmp_path / "step=300.tmp").mkdir()

    assert latest_checkpoint(tmp_path) == good


def test_vocoder_save_is_atomic_and_retention_ignores_tmp(tmp_path):
    from fastspeech2_lightning_tpu.training.vocoder import (
        HiFiGANConfig,
        save_vocoder_checkpoint,
    )

    state = {
        "step": jnp.asarray(42, jnp.int32),
        "gen": {"w": np.ones((2, 2), np.float32)},
        "disc": {"w": np.ones((2,), np.float32)},
        "g_opt": {"m": np.zeros((2, 2), np.float32)},
        "d_opt": {"m": np.zeros((2,), np.float32)},
    }
    # stray debris that a pre-fix kill could have left behind
    (tmp_path / "step=41.tmp").mkdir(parents=True)
    (tmp_path / "step=40").mkdir()  # metaless

    path = save_vocoder_checkpoint(tmp_path, state, HiFiGANConfig(), keep=5)

    assert path == tmp_path / "step=42"
    assert (path / "meta.json").exists()
    assert (path / "arrays").exists()
    assert not (tmp_path / "step=42.tmp").exists()
    meta = json.loads((path / "meta.json").read_text())
    assert meta["global_step"] == 42
    # vocoder.npz handoff refreshed alongside
    assert (tmp_path / "vocoder.npz").exists()


def test_acoustic_save_leaves_no_tmp(tmp_path, monkeypatch):
    """save_checkpoint publishes step=N only after meta.json exists."""
    from fastspeech2_lightning_tpu.models.fastspeech2 import FastSpeech2
    from fastspeech2_lightning_tpu.training.checkpoint import (
        latest_checkpoint,
        save_checkpoint,
    )
    from fastspeech2_lightning_tpu.training.state import create_train_state

    import jax

    from fastspeech2_lightning_tpu.testing import stub_config, stub_stats

    config = stub_config()
    stats = stub_stats()
    model = FastSpeech2(config=config, stats=stats, n_symbols=8)
    batch = {
        "text": np.zeros((1, 4), np.int32),
        "src_lens": np.array([4], np.int32),
        "mel": np.zeros((1, 8, config.preprocessing.audio.n_mels),
                        np.float32),
        "mel_lens": np.array([8], np.int32),
        "speaker_id": np.zeros((1,), np.int32),
        "language_id": np.zeros((1,), np.int32),
        "pitch": np.zeros((1, 8), np.float32),
        "energy": np.zeros((1, 8), np.float32),
        "duration_control": np.ones((1,), np.float32),
        "sample_weight": np.ones((1,), np.float32),
    }
    state = create_train_state(config, model, jax.random.PRNGKey(0), batch)
    path = save_checkpoint(
        tmp_path, state, config, stats, {}, {}, ["a", "b"]
    )
    assert path.name.startswith("step=")
    assert (path / "meta.json").exists()
    assert not any(tmp_path.glob("*.tmp"))
    assert latest_checkpoint(tmp_path) == path
