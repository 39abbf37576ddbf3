"""Length-mask utilities (parity with fs2/utils/heavy.py:11-15)."""

from __future__ import annotations

import jax.numpy as jnp


def mask_from_lens(lens: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] lengths -> [B, max_len] boolean mask (True inside the sequence)."""
    ids = jnp.arange(max_len, dtype=lens.dtype)
    return ids[None, :] < lens[:, None]
