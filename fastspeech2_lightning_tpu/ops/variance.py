"""Variance-adaptor ops: phone-level averaging and bucketized embedding lookup.

Semantics parity with fs2/variance_adaptor.py:183-222; implementation is
already XLA-friendly (cumsum + gather, searchsorted)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def average_variance(var: jnp.ndarray, durs: jnp.ndarray) -> jnp.ndarray:
    """Average a frame-level variance signal over each phone's frames.

    var: [B, T] frame-level values (zeros on padding); durs: [B, L] int.
    Returns [B, L]: mean of the *non-zero* frames within each phone span
    (zeros — unvoiced/padding — are excluded, matching
    fs2/variance_adaptor.py:207-222)."""
    durs = durs.astype(jnp.int32)
    T = var.shape[1]
    ends = jnp.clip(jnp.cumsum(durs, axis=1), 0, T)  # [B, L]
    starts = jnp.concatenate([jnp.zeros_like(ends[:, :1]), ends[:, :-1]], axis=1)

    cums = jnp.concatenate(
        [jnp.zeros_like(var[:, :1]), jnp.cumsum(var, axis=1)], axis=1
    )  # [B, T+1]
    nonzero = (var != 0.0).astype(var.dtype)
    cums_n = jnp.concatenate(
        [jnp.zeros_like(var[:, :1]), jnp.cumsum(nonzero, axis=1)], axis=1
    )

    sums = jnp.take_along_axis(cums, ends, axis=1) - jnp.take_along_axis(
        cums, starts, axis=1
    )
    nelems = jnp.take_along_axis(cums_n, ends, axis=1) - jnp.take_along_axis(
        cums_n, starts, axis=1
    )
    return jnp.where(nelems == 0.0, 0.0, sums / jnp.maximum(nelems, 1.0))


def bucketize(values: jnp.ndarray, boundaries: jnp.ndarray) -> jnp.ndarray:
    """torch.bucketize(v, b) parity (default right=False): the count of
    boundaries strictly below v, i.e. b[i-1] < v <= b[i] (= searchsorted
    side='left'; verified bit-for-bit against torch on exact-boundary
    values, incl. v == b[0] -> 0). Vectorized comparison-sum — searchsorted
    lowers to a sequential while-loop on TPU.

    NOTE: checkpoint-parity requires the *boundaries* to match bit-exactly
    too — torch.linspace's f32 rounding differs from jnp.linspace in the
    last ulp, so imported reference checkpoints carry their own bins (the
    'constants' collection, models/torch_import.extract_constants)."""
    flat = values.reshape(-1)
    idx = jnp.sum(
        boundaries[None, :] < flat[:, None], axis=-1, dtype=jnp.int32
    )
    return idx.reshape(values.shape)
