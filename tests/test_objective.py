"""Native objective metrics (STOI / SI-SDR) + check-data integration.

Reference analogue: SQUIM metrics in check-data
(fs2/cli/check_data_heavy.py:46-55); here computed natively since torchaudio
is not in the image."""

from __future__ import annotations

import json

import numpy as np

from fastspeech2_lightning_tpu.preprocessing.objective import (
    estimate_quality,
    si_sdr,
    stoi,
)

from helpers import make_training_workspace

SR = 22050


def _speechlike(seconds=1.0, seed=0):
    """Amplitude-modulated harmonic signal (speech-like envelope dynamics)."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * SR)) / SR
    f0 = 140 + 20 * np.sin(2 * np.pi * 2.1 * t)
    sig = sum(
        (0.5 / k) * np.sin(2 * np.pi * k * np.cumsum(f0) / SR) for k in (1, 2, 3)
    )
    env = 0.5 * (1 + np.sin(2 * np.pi * 4 * t + rng.uniform(0, 6.28)))
    return (sig * env).astype(np.float64)


def test_si_sdr_matches_known_snr():
    rng = np.random.default_rng(0)
    s = _speechlike()
    noise = rng.standard_normal(len(s))
    for target_db in (0.0, 10.0, 20.0):
        scale = np.linalg.norm(s) / (np.linalg.norm(noise) * 10 ** (target_db / 20))
        est = s + scale * noise
        got = si_sdr(est, s)
        assert abs(got - target_db) < 0.5, (target_db, got)
    # scale invariance: gain on the estimate does not change SI-SDR
    est = s + 0.1 * noise
    assert abs(si_sdr(3.7 * est, s) - si_sdr(est, s)) < 1e-6
    # identical signals cap out
    assert si_sdr(s, s) >= 60


def test_stoi_monotone_in_noise():
    rng = np.random.default_rng(1)
    s = _speechlike(seconds=1.5)
    clean_score = stoi(s, s, SR)
    assert clean_score > 0.95
    noise = rng.standard_normal(len(s))
    scores = []
    for snr_db in (20.0, 5.0, -5.0):
        scale = np.linalg.norm(s) / (np.linalg.norm(noise) * 10 ** (snr_db / 20))
        scores.append(stoi(s, s + scale * noise, SR))
    assert clean_score > scores[0] > scores[1] > scores[2]


def test_stoi_exactly_one_for_gain_scaled_signal():
    """Analytic anchor: per-band segment normalization undoes any global
    gain, so degraded = a*clean (a>0) must score STOI == 1.0 exactly —
    every band correlation is 1 by construction (Taal et al. 2010, eq. 5:
    the normalized clipped band envelope equals the clean one)."""
    s = _speechlike(seconds=1.2, seed=3)
    for a in (0.3, 1.0, 4.2):
        # 1e-6 tolerance: the implementation's 1e-12 division epsilons
        # keep the correlations a few ulp under exactly 1
        assert abs(stoi(s, a * s, SR) - 1.0) < 1e-6, a


def test_stoi_band_matrix_covers_spec():
    """The 15 one-third-octave bands start at 150 Hz and stay below the
    10 kHz-analysis Nyquist (Taal et al. 2010 §II.A) — every band must be
    non-empty and the top band edge < 5000 Hz."""
    from fastspeech2_lightning_tpu.preprocessing.objective import (
        _MIN_FREQ,
        _N_BANDS,
        _third_octave_matrix,
    )

    mat = _third_octave_matrix(10000)
    assert mat.shape[0] == _N_BANDS == 15
    assert (mat.sum(axis=1) > 0).all(), "empty one-third-octave band"
    top_edge = _MIN_FREQ * 2.0 ** ((_N_BANDS - 1) / 3.0) * 2.0 ** (1.0 / 6.0)
    assert top_edge < 5000.0  # ≈ 4276 Hz: inside Nyquist


def test_stoi_ignores_out_of_band_energy():
    """Analytic anchor for the band analysis: a 4.8 kHz tone lies above the
    top band edge (≈4276 Hz) but below the 5 kHz Nyquist, so adding it to
    the degraded arm must leave STOI at 1.0 — none of the 15 bands see it."""
    # work at the 10 kHz analysis rate directly so no resampling smears
    # the tone (the internal resampler is identity at sr == 10000)
    sr = 10000
    rng = np.random.default_rng(4)
    t = np.arange(int(1.2 * sr)) / sr
    f0 = 140 + 20 * np.sin(2 * np.pi * 2.1 * t)
    # broadband harmonic stack (up to ~3.9 kHz) so every one-third-octave
    # band carries real signal energy — empty bands would correlate noise
    sig = sum(
        (0.5 / np.sqrt(k)) * np.sin(2 * np.pi * k * np.cumsum(f0) / sr)
        for k in range(1, 29)
    )
    env = 0.5 * (1 + np.sin(2 * np.pi * 4 * t + rng.uniform(0, 6.28)))
    s = sig * env
    tone = 0.3 * np.sin(2 * np.pi * 4800.0 * t)
    score = stoi(s, s + tone, sr)
    assert score > 0.97, score


def test_stoi_uncorrelated_noise_scores_low():
    """Analytic anchor: degraded = independent noise has zero expected raw
    band-envelope correlation with the clean arm. STOI's −15 dB clipping
    stage (Taal 2010 eq. 4) re-introduces a small positive correlation by
    pinning the degraded envelope to the clean one where clean is loud, so
    published behavior for noise-only inputs is a small positive score
    (≲0.35), far below any intelligible-speech value."""
    rng = np.random.default_rng(5)
    s = _speechlike(seconds=1.5, seed=6)
    noise = rng.standard_normal(len(s)) * np.std(s)
    score = stoi(s, noise, SR)
    assert -0.05 < score < 0.4, score


def test_estimate_quality_flags_noisy_audio():
    rng = np.random.default_rng(2)
    clean = _speechlike(seconds=1.2)
    noisy = clean + 0.5 * rng.standard_normal(len(clean))
    q_clean = estimate_quality(clean, SR)
    q_noisy = estimate_quality(noisy, SR)
    # PESQ-family proxy: in-range and degrading with noise
    assert 1.0 <= q_noisy["pesq"] <= q_clean["pesq"] <= 4.6
    assert q_clean["stoi"] > q_noisy["stoi"]
    assert q_clean["si_sdr"] > q_noisy["si_sdr"]


def test_check_data_writes_objective_metrics(tmp_path):
    from click.testing import CliRunner

    from fastspeech2_lightning_tpu.cli import app

    make_training_workspace(tmp_path)
    out_dir = tmp_path / "checked"
    result = CliRunner().invoke(
        app,
        [
            "check-data", str(tmp_path / "config.yaml"),
            "--output-dir", str(out_dir),
            "--objective-evaluation",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    report = json.loads((out_dir / "checked-data.json").read_text())
    assert report, "empty report"
    for row in report:
        assert "stoi" in row and "si_sdr" in row
        assert np.isfinite(row["si_sdr"])


def test_detect_clipping_finds_consecutive_runs():
    from fastspeech2_lightning_tpu.preprocessing.objective import (
        detect_clipping,
    )

    sr = 16000
    t = np.arange(sr) / sr
    clean = 0.5 * np.sin(2 * np.pi * 220 * t)
    intervals, total = detect_clipping(clean)
    assert total <= 2  # a sine touches its extreme momentarily, no runs

    clipped = np.clip(2.0 * clean, -0.6, 0.6)
    intervals, total = detect_clipping(clipped)
    assert total > 100  # broad flat rails
    assert intervals and all(e > s for s, e in intervals)
    # intervals really are pinned regions
    for s, e in intervals[:5]:
        seg = np.abs(clipped[s:e])
        assert (seg >= 0.6 - 1e-3).all()

    # single isolated extreme samples (no run) are not clipping
    spiky = clean.copy()
    spiky[100] = 0.9
    spiky[5000] = -0.9
    _, total = detect_clipping(spiky, min_run=2)
    assert total == 0


def test_pesq_proxy_ranks_degradation():
    from fastspeech2_lightning_tpu.preprocessing.objective import pesq_proxy

    rng = np.random.default_rng(0)
    sr = 16000
    t = np.arange(2 * sr) / sr
    clean = (0.4 * np.sin(2 * np.pi * 220 * t)
             * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t)))
    noisy = clean + 0.1 * rng.standard_normal(len(clean))
    very_noisy = clean + 0.5 * rng.standard_normal(len(clean))

    s_clean = pesq_proxy(clean, clean, sr)
    s_noisy = pesq_proxy(clean, noisy, sr)
    s_very = pesq_proxy(clean, very_noisy, sr)
    assert 1.0 <= s_very <= s_noisy <= s_clean <= 4.6
    assert s_clean > 4.0  # identical arms score near the top of the range
    assert s_clean - s_very > 0.5  # monotone, materially separated


def test_estimate_quality_sub_frame_clip_returns_nan():
    """Clips shorter than one analysis frame must return the NaN guards,
    not crash on out-of-range frame indices (regression)."""
    q = estimate_quality(np.ones(100, np.float32) * 0.1, 22050)
    assert all(np.isnan(v) or isinstance(v, float) for v in q.values())


def test_detect_clipping_silence_not_clipped():
    """Digital silence / DC has no rails to pin to — a flat file used to
    be reported as 100% clipped (regression)."""
    from fastspeech2_lightning_tpu.preprocessing.objective import (
        detect_clipping,
    )

    intervals, total = detect_clipping(np.zeros(22050, np.float32))
    assert intervals == [] and total == 0
    intervals, total = detect_clipping(np.full(1000, 0.5, np.float32))
    assert intervals == [] and total == 0
