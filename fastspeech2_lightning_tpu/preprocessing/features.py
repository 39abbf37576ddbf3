"""Spectral features: STFT magnitude, mel filterbank, log-mel, energy.

Replaces the upstream everyvoice Preprocessor's librosa/torchaudio spectral
path (SURVEY.md §2.2). Two implementations share constants:

 - NumPy host path (`*_numpy`) — per-utterance preprocessing artifacts.
 - JAX path (`mel_spectrogram_jax`) — a jitted batched extractor used for
   on-device pipelines and benchmarking; identical math (hann window, reflect
   padding, slaney mel filterbank for 'mel-librosa').

Spec values are log-compressed: log(clip(mel, 1e-5)) — the HiFiGAN-family
convention the vocoder handoff expects."""

from __future__ import annotations

import functools

import numpy as np

LOG_CLIP = 1e-5


def hz_to_mel(f, htk: bool = False):
    f = np.asanyarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    if f.ndim:
        log_t = f >= min_log_hz
        mels = np.where(
            log_t, min_log_mel + np.log(np.maximum(f, min_log_hz) / min_log_hz) / logstep, mels
        )
    elif f >= min_log_hz:
        mels = min_log_mel + np.log(f / min_log_hz) / logstep
    return mels


def mel_to_hz(mels, htk: bool = False):
    mels = np.asanyarray(mels, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    if mels.ndim:
        log_t = mels >= min_log_mel
        freqs = np.where(
            log_t, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs
        )
    elif mels >= min_log_mel:
        freqs = min_log_hz * np.exp(logstep * (mels - min_log_mel))
    return freqs


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, f_min: float, f_max: float, htk: bool = False
) -> np.ndarray:
    """[n_mels, n_fft//2+1] triangular filterbank with slaney normalization
    (librosa.filters.mel parity for spec_type='mel-librosa')."""
    if f_max is None or f_max <= 0:
        f_max = sr / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = np.linspace(hz_to_mel(f_min, htk), hz_to_mel(f_max, htk), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts, htk)

    fb = np.zeros((n_mels, n_bins))
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        fb[i] = np.maximum(0, np.minimum(lower, upper))
    # slaney normalization: equal area
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    fb *= enorm[:, None]
    return fb.astype(np.float32)


def _hann(win_length: int) -> np.ndarray:
    # periodic hann (librosa/torch.stft convention)
    return 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(win_length) / win_length)


def stft_complex_numpy(
    audio: np.ndarray, n_fft: int, hop: int, win_length: int
) -> np.ndarray:
    """[T_frames, n_fft//2+1] complex STFT; center=True, reflect padding."""
    pad = n_fft // 2
    x = np.pad(audio, (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    window = _hann(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    frames = np.lib.stride_tricks.sliding_window_view(x, n_fft)[::hop][:n_frames]
    return np.fft.rfft(frames * window[None, :], n=n_fft, axis=1).astype(
        np.complex64
    )


def stft_magnitude_numpy(
    audio: np.ndarray, n_fft: int, hop: int, win_length: int
) -> np.ndarray:
    """[T_frames, n_fft//2+1] magnitude; center=True with reflect padding."""
    return np.abs(stft_complex_numpy(audio, n_fft, hop, win_length)).astype(
        np.float32
    )


def mel_spectrogram_numpy(
    audio: np.ndarray,
    sr: int,
    n_fft: int,
    hop: int,
    win_length: int,
    n_mels: int,
    f_min: float,
    f_max: float,
    spec_type: str = "mel-librosa",
) -> np.ndarray:
    """[n_mels, T_frames] log-mel, [n_fft//2+1, T] log-linear, or — for
    spec_type='raw' — the [n_fft//2+1, T] complex STFT with no log (parity
    with everyvoice's AudioSpecTypeEnum raw / get_spectral_transform)."""
    if spec_type == "raw":
        return stft_complex_numpy(audio, n_fft, hop, win_length).T
    mag = stft_magnitude_numpy(audio, n_fft, hop, win_length)  # [T, bins]
    if spec_type == "linear":
        out = mag.T
    else:
        htk = spec_type == "mel"
        fb = mel_filterbank(sr, n_fft, n_mels, f_min, f_max, htk)
        out = fb @ mag.T  # [n_mels, T]
    return np.log(np.clip(out, LOG_CLIP, None)).astype(np.float32)


def frame_energy_numpy(
    audio: np.ndarray, n_fft: int, hop: int, win_length: int
) -> np.ndarray:
    """[T_frames] per-frame energy = L2 norm of the STFT magnitude
    (FastSpeech2 convention)."""
    mag = stft_magnitude_numpy(audio, n_fft, hop, win_length)
    return np.linalg.norm(mag, axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# JAX batched path
# ---------------------------------------------------------------------------


def mel_spectrogram_jax(
    audio: "jnp.ndarray",
    sr: int,
    n_fft: int,
    hop: int,
    win_length: int,
    n_mels: int,
    f_min: float,
    f_max: float,
    htk: bool = False,
):
    """Batched [B, N_samples] -> [B, n_mels, T_frames] log-mel, jittable.

    The framing is expressed as a strided gather and the FFT via jnp.fft.rfft;
    the filterbank matmul runs on the MXU. One call per batch replaces the
    reference's per-utterance CPU loop. Shares the fused STFT with
    batched_mel_energy_jax (single implementation — the energy is free)."""
    mel, _energy = batched_mel_energy_jax(
        audio, sr, n_fft, hop, win_length, n_mels, f_min, f_max, htk
    )
    return mel


def batched_mel_energy_jax(
    audio: "jnp.ndarray",
    sr: int,
    n_fft: int,
    hop: int,
    win_length: int,
    n_mels: int,
    f_min: float,
    f_max: float,
    htk: bool = False,
):
    """Fused batched spectral features: ONE STFT feeds both the log-mel
    ([B, n_mels, T]) and the frame energy ([B, T] = L2 norm over bins).

    This is the on-device preprocessing path (BASELINE.json: "the
    preprocessing stage becomes fused XLA ops over batched audio") — the
    reference computes the STFT twice per utterance on CPU (mel + energy)."""
    import jax.numpy as jnp

    pad = n_fft // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[1] - n_fft) // hop
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    frames = x[:, idx]
    window = jnp.asarray(_hann(win_length), dtype=x.dtype)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    mag = jnp.abs(
        jnp.fft.rfft(frames * window[None, None, :], n=n_fft, axis=-1)
    ).astype(jnp.float32)
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, f_min, f_max, htk))
    mel = jnp.log(jnp.clip(jnp.einsum("mf,btf->bmt", fb, mag), LOG_CLIP, None))
    energy = jnp.sqrt(jnp.sum(mag * mag, axis=-1))
    return mel, energy
