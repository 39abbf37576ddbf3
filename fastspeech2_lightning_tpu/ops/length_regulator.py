"""Length regulation: expand phone-rate features to frame rate.

The reference loops over the batch calling `torch.repeat_interleave` per item
and re-pads (fs2/variance_adaptor.py:65-81) — ragged and GPU-idiomatic. The
TPU-native formulation is a single static-shape gather:

    ends  = cumsum(durations)                      # [B, L]
    phone(i) = searchsorted(ends, i, side="right")  # frame -> phone index
    out[i] = x[phone(i)]                            # one take_along_axis

Everything is fixed-shape [B, T_max, D]; frames beyond the total duration are
masked. This is differentiable w.r.t. x (gather), durations are integral.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def length_regulate(
    x: jnp.ndarray, durations: jnp.ndarray, max_length: int
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Expand x [B, L, D] by durations [B, L] into [B, max_length, D].

    Returns (expanded, mask [B, max_length] bool, mel_lens [B] int32).
    Total durations longer than max_length are truncated (the reference clamps
    with min(lengths.max(), max_length), fs2/variance_adaptor.py:72-80)."""
    durations = durations.astype(jnp.int32)
    ends = jnp.cumsum(durations, axis=1)  # [B, L]
    total = ends[:, -1]
    mel_lens = jnp.minimum(total, max_length).astype(jnp.int32)

    frame_ids = jnp.arange(max_length, dtype=jnp.int32)  # [T]
    # phone index for each frame: number of ends <= frame_id. A direct
    # [B, T, L] comparison-sum: jnp.searchsorted would lower to a sequential
    # binary-search while-loop on TPU (profiled at 4 ms/call vs ~0.1 ms here).
    phone_idx = jnp.sum(
        ends[:, None, :] <= frame_ids[None, :, None], axis=-1, dtype=jnp.int32
    )  # [B, T]
    L = x.shape[1]
    phone_idx = jnp.minimum(phone_idx, L - 1)

    expanded = jnp.take_along_axis(x, phone_idx[:, :, None], axis=1)
    mask = frame_ids[None, :] < mel_lens[:, None]
    expanded = expanded * mask[:, :, None].astype(x.dtype)
    return expanded, mask, mel_lens


def gaussian_upsampling(
    x: jnp.ndarray,
    durations: jnp.ndarray,
    mask: jnp.ndarray,
    max_length: int,
    temperature: float = 0.2,
) -> jnp.ndarray:
    """Differentiable soft upsampling (Gaussian upsampling, Non-Attentive
    Tacotron) — an optional smooth alternative to the hard gather, useful when
    durations come from a differentiable predictor. Not used by the reference
    parity path; provided as a TPU-friendly extension point."""
    durations = durations.astype(jnp.float32)
    ends = jnp.cumsum(durations, axis=1)
    centers = ends - durations / 2.0  # [B, L]
    t = jnp.arange(max_length, dtype=jnp.float32)[None, :, None]  # [1, T, 1]
    logits = -((t - centers[:, None, :]) ** 2) / temperature  # [B, T, L]
    logits = jnp.where(mask[:, None, :], logits, -1e9)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("btl,bld->btd", w, x)
