"""Shared neural layers: positional embedding, variance conv stacks, PostNet.

Behavioral parity with fs2/layers.py and fs2/blocks.py, expressed as
flax.linen modules over [B, T, C] activations (TPU layout: time × feature
stays in the two minor dimensions, convs are NWC so XLA maps them onto the
MXU without transposes — unlike the reference's NCW + permute pattern)."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class FastDropout(nn.Module):
    """Dropout drawing the keep mask from uint8 random bits.

    `jax.random.bernoulli` (used by nn.Dropout) materializes a uint32 word
    per element; at the train step's mask shapes ([B, T, ffn_dim] etc.) that
    RNG tensor is pure HBM traffic — profiled at ~2 ms/step of
    rng-bit-generator plus as much again in the compares that re-read it.
    Drawing uint8 bits quarters both. The drop probability is quantized to
    t/256 and the rescale uses the exact quantized keep probability, so the
    layer stays exactly unbiased: E[output] == input."""

    rate: float
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: Optional[bool] = None):
        det = nn.merge_param("deterministic", self.deterministic, deterministic)
        if det or self.rate == 0.0:
            return x
        t = int(round(self.rate * 256.0))
        if t <= 0:
            return x
        if t >= 256:
            return jnp.zeros_like(x)
        bits = jax.random.bits(self.make_rng("dropout"), x.shape, jnp.uint8)
        keep = bits >= jnp.uint8(t)  # P(keep) = (256 - t) / 256
        scale = jnp.asarray(256.0 / (256 - t), x.dtype)
        return jnp.where(keep, x * scale, jnp.zeros_like(x))


def fastpitch_positional_embedding(
    positions: jnp.ndarray, dim: int, dtype=jnp.float32
) -> jnp.ndarray:
    """FastPitch-style sinusoidal embedding (fs2/layers.py:123-140).

    positions: [T] float -> [T, dim]; layout is [sin(all freqs), cos(all
    freqs)] concatenated (NOT interleaved), matching the reference."""
    half = (dim + 1) // 2
    inv_freq = 1.0 / (10000 ** (jnp.arange(0.0, dim, 2.0) / dim))
    sinusoid = positions[:, None] * inv_freq[None, :]  # [T, half]
    emb = jnp.concatenate([jnp.sin(sinusoid), jnp.cos(sinusoid)], axis=1)
    return emb[:, :dim].astype(dtype)


def sinusoidal_positional_embedding(
    num_embeddings: int, embedding_dim: int, padding_idx: Optional[int] = None
) -> jnp.ndarray:
    """tensor2tensor-style sinusoidal table (parity with the reference's
    SinusoidalPositionalEmbedding.get_embedding, fs2/layers.py:67-87 — unused
    by the model, kept for API parity)."""
    half_dim = embedding_dim // 2
    emb = jnp.log(10000.0) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = jnp.arange(num_embeddings, dtype=jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.concatenate([emb, jnp.zeros((num_embeddings, 1))], axis=1)
    if padding_idx is not None:
        emb = emb.at[padding_idx].set(0.0)
    return emb


class DepthwiseSeparableConv1d(nn.Module):
    """Depthwise conv + pointwise conv (fs2/blocks.py:4-19)."""

    features: int
    kernel_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        x = nn.Conv(
            features=in_ch,
            kernel_size=(self.kernel_size,),
            padding="SAME",
            feature_group_count=in_ch,
            name="depthwise",
            dtype=self.dtype,
        )(x)
        x = nn.Conv(
            features=self.features, kernel_size=(1,), name="pointwise",
            dtype=self.dtype,
        )(x)
        return x


class VarianceConvolutionLayer(nn.Module):
    """Conv (plain or depthwise-separable) + ReLU + LayerNorm + Dropout
    (fs2/layers.py:20-48)."""

    features: int
    kernel_size: int
    dropout: float
    depthwise: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.depthwise:
            x = DepthwiseSeparableConv1d(
                self.features, self.kernel_size, dtype=self.dtype
            )(x)
        else:
            x = nn.Conv(
                features=self.features,
                kernel_size=(self.kernel_size,),
                padding="SAME",
                dtype=self.dtype,
            )(x)
        x = nn.relu(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        x = FastDropout(self.dropout, deterministic=deterministic)(x)
        return x


class VariancePredictor(nn.Module):
    """N conv layers + linear scalar head (fs2/variance_adaptor.py:18-62)."""

    n_layers: int = 5
    n_channels: int = 384
    output_dim: int = 1
    kernel_size: int = 5
    dropout_rate: float = 0.1
    depthwise: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        x = x.astype(self.dtype)
        for i in range(self.n_layers):
            x = VarianceConvolutionLayer(
                features=self.n_channels,
                kernel_size=self.kernel_size,
                dropout=self.dropout_rate,
                depthwise=self.depthwise,
                dtype=self.dtype,
                name=f"conv_{i}",
            )(x, deterministic=deterministic)
        out = nn.Dense(self.output_dim, name="linear", dtype=self.dtype)(x)
        # scalar heads feed losses and duration rounding: return f32
        out = jnp.squeeze(out, axis=-1).astype(jnp.float32)
        if mask is not None:
            out = out * mask.astype(out.dtype)
        return out


class PostNet(nn.Module):
    """Five 1-d convolutions with 512 channels, kernel 5, tanh + BatchNorm,
    dropout 0.5 (fs2/layers.py:143-212). Residual is added by the caller."""

    n_mel_channels: int = 80
    postnet_embedding_dim: int = 512
    postnet_kernel_size: int = 5
    postnet_n_convolutions: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True, use_running_average=None
    ) -> jnp.ndarray:
        if use_running_average is None:
            use_running_average = deterministic
        x = x.astype(self.dtype)
        n = self.postnet_n_convolutions
        for i in range(n):
            last = i == n - 1
            features = self.n_mel_channels if last else self.postnet_embedding_dim
            x = nn.Conv(
                features=features,
                kernel_size=(self.postnet_kernel_size,),
                padding="SAME",
                name=f"conv_{i}",
                dtype=self.dtype,
            )(x)
            # dtype=self.dtype keeps the normalized activations in the
            # model's compute dtype (flax still reduces the batch statistics
            # in float32); without it BatchNorm promotes to f32 and the whole
            # postnet's activation traffic doubles — profiled as the largest
            # single block of the train step's HBM time.
            x = nn.BatchNorm(
                use_running_average=use_running_average,
                momentum=0.9,
                epsilon=1e-5,
                name=f"bn_{i}",
                dtype=self.dtype,
            )(x)
            if not last:
                x = jnp.tanh(x)
            x = FastDropout(0.5, deterministic=deterministic)(x)
        return x
