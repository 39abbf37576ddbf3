"""Griffin-Lim mel inversion: a trainless vocoder fallback.

The reference pipeline can only produce waveforms through a separately
trained HiFiGAN checkpoint (fs2/prediction_writing_callback.py:656-681 —
`synthesize_data(outputs, vocoder_ckpt)`); with no vocoder available it
writes spec files only. This module adds what the reference lacks: a
classical signal-processing fallback that turns predicted log-mels into
audible, F0-faithful audio with zero training — mel magnitudes are mapped
back to linear-frequency magnitudes through the (regularized) transposed
mel filterbank, and phases recovered by Griffin-Lim iteration (Griffin &
Lim 1984). Quality is below a trained neural vocoder (it is a phase
estimate, not a learned model), but harmonics land at the right
frequencies, which makes it sufficient for pitch/duration/prosody
evaluation (tools/eval_conditioned.py) and for quick listening checks.

It plugs into `Synthesizer` through the same callable protocol the
HiFiGAN path uses: `vocoder(mel [B,T,n_mels] log-mel) -> (wav [B,S], None)`
with `sample_rate`/`hop` attributes; `vocoder_path="griffin-lim"` selects
it from `Synthesizer.from_checkpoint`, the CLI, and the server.
"""

from __future__ import annotations

import numpy as np

from ..preprocessing.features import (
    _hann,
    mel_filterbank,
    stft_complex_numpy,
)


def _istft(spec: np.ndarray, n_fft: int, hop: int, win_length: int,
           length: int) -> np.ndarray:
    """Inverse of stft_complex_numpy: [T_frames, n_fft//2+1] -> [length].

    Overlap-add with squared-window normalization (the synthesis window
    equals the analysis window), then removal of the center padding that
    the forward transform added.
    """
    frames = np.fft.irfft(spec, n=n_fft, axis=1).astype(np.float64)
    window = _hann(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    n_frames = frames.shape[0]
    out_len = n_fft + hop * (n_frames - 1)
    out = np.zeros(out_len)
    wsum = np.zeros(out_len)
    w2 = window * window
    for i in range(n_frames):
        s = i * hop
        out[s:s + n_fft] += frames[i] * window
        wsum[s:s + n_fft] += w2
    out = np.where(wsum > 1e-8, out / np.maximum(wsum, 1e-8), out)
    pad = n_fft // 2  # center=True padding of the forward transform
    return out[pad:pad + length].astype(np.float32)


def griffin_lim(
    mag: np.ndarray, n_fft: int, hop: int, win_length: int,
    n_iter: int = 48, seed: int = 0,
) -> np.ndarray:
    """Phase recovery for a [T_frames, n_fft//2+1] magnitude spectrogram."""
    rng = np.random.default_rng(seed)
    length = hop * mag.shape[0]
    angles = np.exp(2j * np.pi * rng.random(mag.shape))
    spec = mag.astype(np.complex128) * angles
    for _ in range(n_iter):
        wav = _istft(spec, n_fft, hop, win_length, length)
        rebuilt = stft_complex_numpy(wav, n_fft, hop, win_length)
        rebuilt = rebuilt[: mag.shape[0]]
        if rebuilt.shape[0] < mag.shape[0]:
            rebuilt = np.pad(
                rebuilt,
                ((0, mag.shape[0] - rebuilt.shape[0]), (0, 0)),
            )
        phase = rebuilt / np.maximum(np.abs(rebuilt), 1e-10)
        spec = mag.astype(np.complex128) * phase
    return _istft(spec, n_fft, hop, win_length, length)


class GriffinLimVocoder:
    """Trainless mel->wav callable with the Synthesizer vocoder protocol.

    Accepts the model's predicted log-mels (natural log of mel-filterbank
    magnitudes — preprocessing.features.mel_spectrogram_numpy convention)
    and returns [B, T*hop] float32 audio.
    """

    def __init__(self, audio_cfg, n_iter: int = 48):
        self.a = audio_cfg
        self.n_iter = n_iter
        self.sample_rate = int(audio_cfg.output_sampling_rate)
        self.hop = int(audio_cfg.fft_hop_size)
        if audio_cfg.spec_type == "raw":
            raise ValueError(
                "griffin-lim fallback needs magnitude spectra; "
                "spec_type='raw' models carry complex STFTs"
            )
        if audio_cfg.spec_type == "linear":
            # log-linear magnitude models: no filterbank to invert
            bins = int(audio_cfg.n_fft) // 2 + 1
            self._fb_inv = np.eye(bins)
            return
        htk = audio_cfg.spec_type == "mel"
        fb = mel_filterbank(
            int(audio_cfg.input_sampling_rate), int(audio_cfg.n_fft),
            int(audio_cfg.n_mels), float(audio_cfg.f_min),
            float(audio_cfg.f_max), htk,
        )  # [n_mels, bins]
        # Regularized transpose inversion (librosa-nnls-lite): columns of
        # fb sum to the per-bin total weight; dividing the transpose by
        # column norms^2 gives a diagonal-regularized least-squares
        # estimate that stays non-negative for non-negative inputs.
        colnorm = np.maximum((fb * fb).sum(axis=0), 1e-8)  # [bins]
        self._fb_inv = (fb / colnorm[None, :]).T.astype(np.float64)

    def __call__(self, mels: np.ndarray):
        mels = np.asarray(mels, dtype=np.float32)
        if mels.ndim == 2:
            mels = mels[None]
        a = self.a
        wavs = []
        for b in range(mels.shape[0]):
            mel_mag = np.exp(mels[b].astype(np.float64))  # [T, n_mels]
            lin = np.clip(mel_mag @ self._fb_inv.T, 0.0, None)  # [T, bins]
            wav = griffin_lim(
                lin, int(a.n_fft), self.hop, int(a.fft_window_size),
                n_iter=self.n_iter, seed=b,
            )
            peak = np.max(np.abs(wav)) or 1.0
            if peak > 1.0:
                wav = wav / peak
            wavs.append(wav.astype(np.float32))
        # (wavs, sample_rate): the tuple protocol the wav writer and the
        # Synthesizer host path both expect (models/hifigan.py:503)
        return np.stack(wavs), self.sample_rate


GRIFFIN_LIM_PATH = "griffin-lim"


def is_griffin_lim_path(path) -> bool:
    return str(path).lower() in (GRIFFIN_LIM_PATH, "griffin_lim", "gl")
