"""Alignment attention priors.

The upstream Preprocessor writes a per-utterance beta-binomial attention prior
[T_mel, L_text] (loaded as 'duration' when learn_alignment is on,
fs2/dataset.py:117-139). Same construction here: for mel frame t out of T, the
prior over text positions is BetaBinomial(L-1; a=t*scale+1, b=(T-t)*scale+1) —
a soft diagonal that guides the conv-attention early in training."""

from __future__ import annotations

import numpy as np
from scipy.stats import betabinom


def beta_binomial_prior(
    n_mel_frames: int, n_text: int, scaling_factor: float = 1.0
) -> np.ndarray:
    """[T_mel, L_text] row-normalized beta-binomial prior."""
    T, L = n_mel_frames, n_text
    k = np.arange(L)
    rows = []
    for t in range(1, T + 1):
        a = scaling_factor * t
        b = scaling_factor * (T + 1 - t)
        rows.append(betabinom(L - 1, a, b).pmf(k))
    return np.asarray(rows, dtype=np.float32)
