"""Per-module timing of the flagship synthesis forward (B=64, T=1024).

Forced-completion chained timing per module so the 22 ms/call budget can be
attributed. Run on an idle chip.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fastspeech2_lightning_tpu.models.conformer import (  # noqa: E402
    ConvolutionModule,
    FeedForwardModule,
    SelfAttentionModule,
)
from fastspeech2_lightning_tpu.models.layers import PostNet  # noqa: E402

B, T, L, D = 64, 1024, 128, 256
REPS = 20


def time_module(apply_fn, variables, x, extra=()) -> float:
    """best ms/call via carry-chained reps + one final host fetch."""

    def step(x):
        out = apply_fn(variables, x, *extra)
        return x + jnp.mean(out) * 1e-12  # chain

    jf = jax.jit(step)
    x = jax.device_put(x)
    y = jf(x)
    np.asarray(y[(0,) * y.ndim])
    best = float("inf")
    for _ in range(3):
        c = x
        t0 = time.perf_counter()
        for _ in range(REPS):
            c = jf(c)
        np.asarray(c[(0,) * c.ndim])
        best = min(best, time.perf_counter() - t0)
    return best / REPS * 1000


def main():
    rng = jax.random.PRNGKey(0)
    mask_t = jnp.ones((B, T), bool)
    x_t = jax.random.normal(rng, (B, T, D), jnp.float32)
    x_l = jax.random.normal(rng, (B, L, D), jnp.float32)
    mel = jax.random.normal(rng, (B, T, 80), jnp.float32)

    results = {}

    attn = SelfAttentionModule(num_heads=2, dropout=0.2)
    v = attn.init(rng, x_t, mask_t, True)
    results["attn_T1024_ms"] = time_module(
        lambda v, x: attn.apply(v, x, mask_t, True), v, x_t
    )

    ffn = FeedForwardModule(ffn_dim=1024, dropout=0.2)
    v = ffn.init(rng, x_t, True)
    results["ffn_T1024_ms"] = time_module(
        lambda v, x: ffn.apply(v, x, True), v, x_t
    )

    conv = ConvolutionModule(kernel_size=9, dropout=0.2)
    v = conv.init(rng, x_t, mask_t, True)
    results["conv_T1024_ms"] = time_module(
        lambda v, x: conv.apply(v, x, mask_t, True), v, x_t
    )

    pn = PostNet()
    v = pn.init({"params": rng}, mel, deterministic=True)
    results["postnet_ms"] = time_module(
        lambda v, x: pn.apply(v, x, deterministic=True), v, mel
    )

    # encoder-side shapes (L=128) for scale
    mask_l = jnp.ones((B, L), bool)
    v = attn.init(rng, x_l, mask_l, True)
    results["attn_L128_ms"] = time_module(
        lambda v, x: attn.apply(v, x, mask_l, True), v, x_l
    )

    # decoder layer budget: 4 layers x (2 ffn + attn + conv)
    results["decoder_estimate_ms"] = round(
        4 * (2 * results["ffn_T1024_ms"] + results["attn_T1024_ms"]
             + results["conv_T1024_ms"]), 3,
    )
    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
