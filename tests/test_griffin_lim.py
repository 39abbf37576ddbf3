"""Griffin-Lim fallback vocoder: F0-faithful trainless mel inversion."""

import numpy as np
import pytest

from fastspeech2_lightning_tpu.config import FastSpeech2Config
from fastspeech2_lightning_tpu.preprocessing.features import (
    mel_spectrogram_numpy,
)
from fastspeech2_lightning_tpu.synthesis.griffin_lim import (
    GriffinLimVocoder,
    is_griffin_lim_path,
)


def _audio_cfg():
    a = FastSpeech2Config().preprocessing.audio
    return a


def _logmel(wav, a):
    return mel_spectrogram_numpy(
        wav, a.input_sampling_rate, a.n_fft, a.fft_hop_size,
        a.fft_window_size, a.n_mels, a.f_min, a.f_max, a.spec_type,
    ).T  # [T, n_mels]


def test_path_sentinel():
    assert is_griffin_lim_path("griffin-lim")
    assert is_griffin_lim_path("GRIFFIN_LIM")
    from pathlib import Path

    assert is_griffin_lim_path(Path("gl"))
    assert not is_griffin_lim_path("vocoder.npz")


def test_recovers_f0_of_harmonic_signal():
    """A 160 Hz harmonic complex round-tripped mel->wav must keep its F0
    (the property tools/eval_conditioned.py relies on)."""
    a = _audio_cfg()
    sr = a.input_sampling_rate
    t = np.arange(int(1.0 * sr)) / sr
    f0 = 160.0
    wav = sum(
        amp * np.sin(2 * np.pi * f0 * k * t)
        for k, amp in [(1, 0.5), (2, 0.3), (3, 0.15)]
    ).astype(np.float32)
    mel = _logmel(wav, a)

    voc = GriffinLimVocoder(a, n_iter=32)
    out, sr_out = voc(mel[None])
    assert sr_out == a.output_sampling_rate
    assert out.shape == (1, mel.shape[0] * a.fft_hop_size)
    rec = out[0]
    assert np.max(np.abs(rec)) > 0.05  # real signal, not silence

    from fastspeech2_lightning_tpu.preprocessing.f0 import estimate_f0

    f0_rec = np.asarray(estimate_f0(rec, sr, a.fft_hop_size))
    voiced = f0_rec[f0_rec > 0]
    assert voiced.size > 20
    assert abs(np.median(voiced) - f0) < 6.0  # within ~4% of 160 Hz


def test_mel_roundtrip_close():
    """Re-analyzing the reconstruction must give back a similar log-mel
    (the phase estimate can differ; magnitudes should not)."""
    a = _audio_cfg()
    sr = a.input_sampling_rate
    rng = np.random.default_rng(0)
    t = np.arange(int(0.5 * sr)) / sr
    wav = (
        0.4 * np.sin(2 * np.pi * 220 * t)
        + 0.1 * rng.standard_normal(t.size)
    ).astype(np.float32)
    mel = _logmel(wav, a)
    voc = GriffinLimVocoder(a, n_iter=32)
    out, _ = voc(mel[None])
    mel2 = _logmel(out[0], a)[: mel.shape[0]]
    l1 = np.mean(np.abs(mel - mel2))
    assert l1 < 1.5, l1


def test_raw_spec_type_rejected():
    a = _audio_cfg()
    a.spec_type = "raw"
    with pytest.raises(ValueError, match="raw"):
        GriffinLimVocoder(a)
