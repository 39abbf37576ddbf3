"""Monotonic alignment search (MAS), width 1, fully on device.

The reference binarizes soft attention by copying it to the host and running a
numba DP kernel per batch item every training step
(fs2/variance_adaptor.py:160-181 + fs2/attn/alignment.py:48-74). Here the same
width-1 Viterbi recurrence runs as two `lax.scan`s on the TPU — a forward scan
over mel frames carrying the DP row [B, L], and a reverse backtrack scan
carrying the current text index [B] — so training never leaves the device.

Recurrence (identical to the reference numba kernel `mas_width1`):
    log_p[0, 0] = log_attn[0, 0];  log_p[0, j>0] = -inf
    log_p[i, j] = log_attn[i, j] + max(log_p[i-1, j-1], log_p[i-1, j])
Backtrack from (T-1, L-1): step to j-1 iff log_p[i-1, j-1] >= log_p[i-1, j].

A NumPy golden implementation (`mas_width1_numpy`) and an optional C++/OpenMP
host kernel (fastspeech2_lightning_tpu.native) cross-check the scan version.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9  # finite "minus infinity": avoids NaN from (-inf)-(-inf) paths


def _forward_logp(log_attn: jnp.ndarray) -> jnp.ndarray:
    """DP table via scan over mel frames. log_attn: [B, T, L] -> log_p [B, T, L]."""
    B, T, L = log_attn.shape
    first = log_attn[:, 0, :] + jnp.where(
        jnp.arange(L)[None, :] == 0, 0.0, NEG_INF
    )

    def step(prev_row, frame):
        # prev_row: [B, L]; frame: [B, L]
        shifted = jnp.concatenate(
            [jnp.full((B, 1), NEG_INF, prev_row.dtype), prev_row[:, :-1]], axis=1
        )
        row = frame + jnp.maximum(prev_row, shifted)
        row = jnp.maximum(row, NEG_INF)  # keep finite
        return row, row

    # unroll: the per-step work is one [B, L] vector op — loop overhead
    # dominates without it
    _, rest = jax.lax.scan(
        step, first, jnp.swapaxes(log_attn, 0, 1)[1:], unroll=16
    )
    return jnp.concatenate([first[:, None, :], jnp.swapaxes(rest, 0, 1)], axis=1)


def _backtrack(log_p: jnp.ndarray, in_lens: jnp.ndarray, out_lens: jnp.ndarray):
    """Reverse scan producing the one-hot path per mel frame: [B, T, L] f32.

    Gather-free: the current text position is carried as a one-hot vector
    h [B, L]; 'stay'/'move-left' DP values come from masked row reductions and
    the move is a lane roll — pure VPU work, no per-step dynamic slicing of
    the [B, T, L] table (the previous rows stream in as scan inputs).

    Frames at i >= out_len hold h = onehot(in_len-1) so the true path starts
    at (out_len-1, in_len-1)."""
    B, T, L = log_p.shape
    h_init = jax.nn.one_hot(in_lens - 1, L, dtype=log_p.dtype)  # [B, L]

    # xs: for row i (from T-1 down to 1) we need log_p[i-1]
    prev_rows = jnp.flip(jnp.swapaxes(log_p, 0, 1)[: T - 1], axis=0)  # [T-1,B,L]
    idxs = jnp.arange(T - 1, 0, -1, dtype=jnp.int32)  # [T-1]

    def step(h, xs):
        prev_row, i = xs
        active = (i < out_lens)[:, None]  # [B, 1]; i > 0 by construction
        stay = jnp.sum(prev_row * h, axis=1, keepdims=True)
        h_left = jnp.roll(h, -1, axis=1)  # one-hot at j-1
        left = jnp.sum(prev_row * h_left, axis=1, keepdims=True)
        at_zero = h[:, :1]  # 1.0 iff j == 0
        dec = active & (left >= stay) & (at_zero < 0.5)
        h_next = jnp.where(dec, h_left, h)
        return h_next, h  # record h for row i before moving

    h_final, hs_rev = jax.lax.scan(
        step, h_init, (prev_rows, idxs), unroll=16
    )
    # rows T-1..1 recorded in hs_rev (reverse order); row 0 is h_final
    hard = jnp.concatenate(
        [h_final[:, None, :], jnp.flip(jnp.swapaxes(hs_rev, 0, 1), axis=1)],
        axis=1,
    )  # [B, T, L]
    return hard


@functools.partial(jax.jit, static_argnames=())
def mas_width1_batched(
    log_attn: jnp.ndarray, in_lens: jnp.ndarray, out_lens: jnp.ndarray
):
    """Batched on-device MAS.

    Args:
      log_attn: [B, T_mel, L_text] log attention (any padding contents).
      in_lens:  [B] valid text lengths.
      out_lens: [B] valid mel lengths.
    Returns:
      attn_hard: [B, T_mel, L_text] float32 one-hot path, zero outside valid
        frames; durations: [B, L_text] int32 column sums.
    """
    B, T, L = log_attn.shape
    # binarization receives no gradient (reference runs it under no_grad,
    # fs2/variance_adaptor.py:167) — stop_gradient keeps the DP out of the
    # backward graph entirely
    log_attn = jax.lax.stop_gradient(log_attn.astype(jnp.float32))
    j_ids = jnp.arange(L)[None, None, :]
    i_ids = jnp.arange(T)[None, :, None]
    valid = (j_ids < in_lens[:, None, None]) & (i_ids < out_lens[:, None, None])
    log_attn = jnp.where(valid, jnp.maximum(log_attn, NEG_INF), NEG_INF)

    frame_valid = jnp.arange(T)[None, :] < out_lens[:, None]
    use_pallas = False
    try:
        import jax as _jax

        from .mas_pallas import fits_vmem, mas_width1_pallas

        use_pallas = _jax.default_backend() == "tpu" and fits_vmem(B, T, L)
    except Exception as exc:
        use_pallas = False
        if jax.default_backend() == "tpu":
            from ._fallback import warn_fallback_once

            warn_fallback_once("mas_width1_pallas", exc)

    attn_hard = None
    if use_pallas:
        try:
            attn_hard = mas_width1_pallas(log_attn, in_lens, out_lens)
        except Exception as exc:
            # a Mosaic lowering/VMEM rejection at THIS shape must degrade
            # to the scan path, not kill the train step
            from ._fallback import warn_fallback_once

            warn_fallback_once("mas_width1_pallas (call)", exc)
    if attn_hard is None:
        log_p = _forward_logp(log_attn)
        attn_hard = _backtrack(log_p, in_lens, out_lens)  # [B, T, L]
    attn_hard = attn_hard * frame_valid[:, :, None]
    durations = jnp.sum(attn_hard, axis=1).astype(jnp.int32)
    return attn_hard, durations


# ---------------------------------------------------------------------------
# Golden host implementation (same recurrence, NumPy)
# ---------------------------------------------------------------------------


def mas_width1_numpy(log_attn_map: np.ndarray) -> np.ndarray:
    """Single-item host MAS, identical recurrence to the reference kernel."""
    log_p = log_attn_map.astype(np.float64).copy()
    T, L = log_p.shape
    log_p[0, 1:] = -np.inf
    for i in range(1, T):
        prev = log_p[i - 1]
        shifted = np.empty_like(prev)
        shifted[0] = -np.inf
        shifted[1:] = prev[:-1]
        log_p[i] += np.maximum(prev, shifted)

    opt = np.zeros_like(log_p, dtype=np.float32)
    j = L - 1
    for i in range(T - 1, 0, -1):
        opt[i, j] = 1.0
        if j > 0 and log_p[i - 1, j - 1] >= log_p[i - 1, j]:
            j -= 1
    opt[0, j] = 1.0
    return opt


def mas_numpy(log_attn_map: np.ndarray, width: int = 1) -> np.ndarray:
    """Generic-width host MAS (parity with the reference's `mas` kernel,
    fs2/attn/alignment.py:21-45 — unused by the model, kept for API parity).
    Allows the path to jump up to `width` text positions per mel frame."""
    T, L = log_attn_map.shape
    opt = np.zeros_like(log_attn_map, dtype=np.float32)
    log_attn = log_attn_map.astype(np.float64).copy()
    log_attn[0, 1:] = -np.inf
    log_p = np.zeros_like(log_attn)
    log_p[0, :] = log_attn[0, :]
    prev_ind = np.zeros_like(log_attn, dtype=np.int64)
    for i in range(1, T):
        for j in range(L):
            prev_j = np.arange(max(0, j - width), j + 1)
            prev_log = np.array([log_p[i - 1, pj] for pj in prev_j])
            ind = int(np.argmax(prev_log))
            log_p[i, j] = log_attn[i, j] + prev_log[ind]
            prev_ind[i, j] = prev_j[ind]
    curr = L - 1
    for i in range(T - 1, -1, -1):
        opt[i, curr] = 1
        curr = prev_ind[i, curr]
    opt[0, curr] = 1
    return opt


def b_mas_numpy(
    b_log_attn: np.ndarray, in_lens: np.ndarray, out_lens: np.ndarray
) -> np.ndarray:
    """Batched host MAS over padded [B, T, L] input."""
    out = np.zeros_like(b_log_attn, dtype=np.float32)
    for b in range(b_log_attn.shape[0]):
        t, l = int(out_lens[b]), int(in_lens[b])
        out[b, :t, :l] = mas_width1_numpy(b_log_attn[b, :t, :l])
    return out
