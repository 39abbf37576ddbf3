"""Conformer encoder/decoder blocks.

Same architecture as the reference's torchaudio.models.Conformer
(fs2/model.py:95-119): per layer — half-step FFN, multi-head self-attention,
convolution module (pointwise→GLU→depthwise→norm→SiLU→pointwise), half-step
FFN, final LayerNorm. Differences, deliberate and TPU-motivated:

 - activations are [B, T, C] end-to-end (NWC convs; no NCW transposes)
 - padded positions are zero-masked before the conv module and excluded from
   batch-norm statistics, so layer outputs are invariant to bucket padding —
   a requirement for static length-bucketed compilation (the reference's
   conv module lets padding bleed into edge frames)
 - attention uses one fused qkv projection (one MXU matmul instead of three)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import FastDropout


class MaskedBatchNorm(nn.Module):
    """BatchNorm over [B, T, C] computing statistics only on valid frames."""

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask, use_running_average: bool):
        C = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(C))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(C))
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            m = mask[:, :, None].astype(x.dtype)
            count = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(x * m, axis=(0, 1)) / count
            var = jnp.sum(((x - mean) ** 2) * m, axis=(0, 1)) / count
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class FeedForwardModule(nn.Module):
    ffn_dim: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool):
        d = x.shape[-1]
        x = nn.LayerNorm(epsilon=1e-5, name="norm", dtype=self.dtype)(x)
        x = nn.Dense(self.ffn_dim, name="linear1", dtype=self.dtype)(x)
        x = nn.silu(x)
        x = FastDropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(d, name="linear2", dtype=self.dtype)(x)
        x = FastDropout(self.dropout, deterministic=deterministic)(x)
        return x


def _attn_dropout_kernel_available(T: int, dh: int) -> bool:
    from ..ops import attention_dropout as attn_do

    # full-VMEM kernel below ~1536 frames, streaming kernel beyond
    return attn_do.supported(T, dh) or attn_do.streaming_supported(T, dh)


def _flash_attention_available(T: int, dh: int) -> bool:
    """The Pallas TPU flash kernel wants seq len a multiple of its 128 block
    and head dims that are <=128 or 128-multiples; only the TPU backend
    (incl. the remote 'axon' tunnel) can run it."""
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return T >= 128 and T % 128 == 0 and (dh <= 128 or dh % 128 == 0)


class SelfAttentionModule(nn.Module):
    num_heads: int
    dropout: float
    dtype: Any = jnp.float32
    attention_dropout: float = -1.0  # -1 -> follow `dropout`

    @nn.compact
    def __call__(self, x, mask, deterministic: bool):
        # mask: [B, T] valid-position mask -> attention bias on keys
        B, T, d = x.shape
        h = self.num_heads
        dh = d // h
        attn_drop = (
            self.dropout if self.attention_dropout < 0 else self.attention_dropout
        )
        x = nn.LayerNorm(epsilon=1e-5, name="norm", dtype=self.dtype)(x)
        qkv = nn.Dense(3 * d, name="qkv", dtype=self.dtype)(x)  # fused projection
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, h, dh)
        k = k.reshape(B, T, h, dh)
        v = v.reshape(B, T, h, dh)

        # At T=1024 the materialized [B, h, T, T] score tensor is pure HBM
        # traffic (attention is ~6% of model FLOPs but ~half of decoder
        # wall-clock). When attention-weight dropout is inactive, use the
        # Pallas flash kernel: streaming softmax, scores never leave VMEM.
        # Padding is carried as segment ids (valid=1, pad=0) so valid queries
        # attend only to valid keys.
        use_flash = (
            deterministic or attn_drop == 0.0
        ) and _flash_attention_available(T, dh)
        if use_flash:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes,
                SegmentIds,
                flash_attention,
            )

            # default blocks (128) leave the kernel launch-bound at these
            # shapes; measured sweep: 1024-wide q/k blocks are ~3x faster
            bq = min(T, 1024)
            bk = min(T, 1024)
            bs = BlockSizes(
                block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                block_q_major_dkv=bq, block_k_major_dkv=bk,
                block_k_dkv=bk, block_q_dkv=bq,
                block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
            )
            seg = mask.astype(jnp.int32)
            out = flash_attention(
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                segment_ids=SegmentIds(q=seg, kv=seg),
                sm_scale=float(1.0 / np.sqrt(dh)),
                block_sizes=bs,
            )
            out = out.transpose(0, 2, 1, 3).reshape(B, T, d).astype(self.dtype)
        elif (
            not deterministic
            and attn_drop > 0.0
            and _attn_dropout_kernel_available(T, dh)
        ):
            # Training with attention-probability dropout: the Pallas kernel
            # (ops/attention_dropout.py) draws the mask in-kernel from the
            # TPU PRNG, so the [B, h, T, T] probabilities never reach HBM —
            # the materialized einsum path below cost ~30% of the B=32
            # train step's device time.
            from ..ops import attention_dropout as attn_do

            seed = jax.random.randint(
                self.make_rng("dropout"), (1,),
                -(2 ** 31), 2 ** 31 - 1, jnp.int32,
            )
            key_bias = jnp.where(mask, 0.0, attn_do.NEG_INF)
            out = attn_do.attention_with_dropout_auto(
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                key_bias, seed,
                float(attn_drop), float(1.0 / np.sqrt(dh)),
            )
            out = out.transpose(0, 2, 1, 3).reshape(B, T, d).astype(self.dtype)
        else:
            # scores + softmax in f32 for stability; matmuls on the MXU
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) / jnp.sqrt(dh)
            bias = jnp.where(mask[:, None, None, :], 0.0, -1e9)
            weights = nn.softmax(scores + bias, axis=-1).astype(self.dtype)
            weights = FastDropout(attn_drop, deterministic=deterministic)(
                weights
            )
            out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(B, T, d)
        out = nn.Dense(d, name="out", dtype=self.dtype)(out)
        out = FastDropout(self.dropout, deterministic=deterministic)(out)
        return out


class ConvolutionModule(nn.Module):
    kernel_size: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic: bool):
        d = x.shape[-1]
        x = nn.LayerNorm(epsilon=1e-5, name="norm", dtype=self.dtype)(x)
        x = nn.Dense(2 * d, name="pointwise1", dtype=self.dtype)(x)
        x = nn.glu(x, axis=-1)
        # keep padding out of the depthwise receptive field
        x = x * mask[:, :, None].astype(x.dtype)
        x = nn.Conv(
            features=d,
            kernel_size=(self.kernel_size,),
            padding="SAME",
            feature_group_count=d,
            name="depthwise",
            dtype=self.dtype,
        )(x)
        x = MaskedBatchNorm(name="bn")(x, mask, use_running_average=deterministic)
        x = x.astype(self.dtype)
        x = nn.silu(x)
        x = nn.Dense(d, name="pointwise2", dtype=self.dtype)(x)
        x = FastDropout(self.dropout, deterministic=deterministic)(x)
        return x


class ConformerLayer(nn.Module):
    num_heads: int
    ffn_dim: int
    conv_kernel_size: int
    dropout: float
    dtype: Any = jnp.float32
    attention_dropout: float = -1.0

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        dt = self.dtype
        x = x + 0.5 * FeedForwardModule(
            self.ffn_dim, self.dropout, dtype=dt, name="ffn1"
        )(x, deterministic)
        x = x + SelfAttentionModule(
            self.num_heads, self.dropout, dtype=dt, name="attn",
            attention_dropout=self.attention_dropout,
        )(x, mask, deterministic)
        x = x + ConvolutionModule(
            self.conv_kernel_size, self.dropout, dtype=dt, name="conv"
        )(x, mask, deterministic)
        x = x + 0.5 * FeedForwardModule(
            self.ffn_dim, self.dropout, dtype=dt, name="ffn2"
        )(x, deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="final_norm", dtype=dt)(x)
        return x


class Conformer(nn.Module):
    """Stack of ConformerLayers over [B, T, C] with a [B, T] validity mask."""

    num_layers: int
    num_heads: int
    ffn_dim: int
    conv_kernel_size: int
    dropout: float
    dtype: Any = jnp.float32
    attention_dropout: float = -1.0

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        x = x.astype(self.dtype)
        for i in range(self.num_layers):
            x = ConformerLayer(
                num_heads=self.num_heads,
                ffn_dim=self.ffn_dim,
                conv_kernel_size=self.conv_kernel_size,
                dropout=self.dropout,
                dtype=self.dtype,
                attention_dropout=self.attention_dropout,
                name=f"layer_{i}",
            )(x, mask, deterministic)
        return x * mask[:, :, None].astype(x.dtype)
