from .pipeline import Preprocessor
from .features import mel_spectrogram_numpy, mel_filterbank, stft_magnitude_numpy
from .f0 import estimate_f0
from .priors import beta_binomial_prior
from .stats import StatsAccumulator

__all__ = [
    "Preprocessor",
    "mel_spectrogram_numpy",
    "mel_filterbank",
    "stft_magnitude_numpy",
    "estimate_f0",
    "beta_binomial_prior",
    "StatsAccumulator",
]
