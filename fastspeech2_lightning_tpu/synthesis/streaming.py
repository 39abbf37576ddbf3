"""Low-latency streaming vocoding.

The acoustic model is non-autoregressive — the whole mel exists after one
forward — but the vocoder is ~34x the acoustic model's FLOPs per frame, so
time-to-first-audio (TTFA) for a long utterance is dominated by vocoding the
entire mel before the first sample leaves the device.

`windowed_vocode` removes that wait: it vocodes the mel in fixed-size
windows carried with `margin` frames of context on each side (margin >=
the generator's one-sided receptive field, `HiFiGANConfig.
receptive_margin_frames`), discards the context region, and yields each
window's samples as they complete. Because every emitted sample's full
receptive field lies inside its slice — or the slice edge coincides with a
true signal edge — the concatenated output equals vocoding the whole mel in
one call (tested to float tolerance). One fixed slice shape means ONE
compiled program regardless of utterance length; TTFA drops from
O(T_total) to O(window + 2*margin).

The reference has no streaming story (its wav callback vocodes full
utterances, fs2/prediction_writing_callback.py:683-736); this is a
TPU-serving feature beyond parity.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np


def windowed_vocode(
    vocoder,
    mel: np.ndarray,
    window: int = 128,
    margin: Optional[int] = None,
) -> Iterator[np.ndarray]:
    """Yield float32 wav segments for `mel` [T, n_mels], in order.

    Concatenated output is identical (to float tolerance) to
    `vocoder(mel[None])[0]`. `margin` defaults to the generator's exact
    one-sided receptive field. Mels shorter than window + 2*margin fall
    back to a single full call.
    """
    import jax

    if mel.ndim != 2:
        raise ValueError(f"windowed_vocode expects [T, n_mels], got {mel.shape}")
    hop = int(getattr(vocoder, "hop", 256))
    if margin is None:
        margin = int(getattr(vocoder, "receptive_margin_frames", 32))
    T = mel.shape[0]
    W = window + 2 * margin
    device_fn = getattr(vocoder, "device_fn", None)

    def _run(mel_slice: np.ndarray) -> np.ndarray:
        if device_fn is not None:
            wav = np.asarray(
                jax.device_get(device_fn(mel_slice[None])), dtype=np.float32
            )[0]
        else:
            wav = np.asarray(vocoder(mel_slice[None])[0], dtype=np.float32)[0]
        return wav

    if T <= W:
        # short mel: pad to a 32-frame bucket so serving compiles a BOUNDED
        # shape set instead of one program per distinct short length (the
        # batch wav path buckets identically). Outputs whose receptive
        # field stays inside the real frames are exact; the final `margin`
        # frames see pad context — same semantics as bucketed serving.
        Tb = min(W, 32 * -(-T // 32))
        pad = Tb - T
        mel_in = np.pad(mel, ((0, pad), (0, 0))) if pad else mel
        yield _run(mel_in)[: T * hop]
        return

    for start in range(0, T, window):
        end = min(start + window, T)
        # fixed-size slice positioned fully inside the signal: interior
        # windows carry `margin` true-context frames on each side; edge
        # windows align the slice edge with the true signal edge, which is
        # exactly what the full-signal convolution sees there
        lo = min(max(start - margin, 0), T - W)
        wav = _run(mel[lo : lo + W])
        yield wav[(start - lo) * hop : (end - lo) * hop]
