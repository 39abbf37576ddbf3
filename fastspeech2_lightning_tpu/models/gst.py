"""Global Style Token module (GST-Tacotron, arXiv:1803.09017).

Behavioral parity with fs2/gst/model.py (ESPnet2 StyleEncoder): reference
encoder = 6 stride-2 Conv2d (no bias) + BatchNorm + ReLU over the mel
spectrogram, flattened and fed to a GRU whose final hidden state queries a
bank of learnable style tokens through multi-head attention.

TPU notes: the GRU runs over the 64×-downsampled time axis (T/64 steps of a
`lax.scan` — short), convs are NHWC."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class ReferenceEncoder(nn.Module):
    idim: int = 80
    conv_layers: int = 6
    conv_chans_list: Sequence[int] = (32, 32, 64, 64, 128, 128)
    conv_kernel_size: int = 3
    conv_stride: int = 2
    gru_units: int = 128

    @nn.compact
    def __call__(self, speech: jnp.ndarray, deterministic: bool = True):
        """speech: [B, T, idim] -> [B, gru_units]."""
        x = speech[..., None]  # NHWC: [B, T, idim, 1]
        for i in range(self.conv_layers):
            x = nn.Conv(
                features=self.conv_chans_list[i],
                kernel_size=(self.conv_kernel_size, self.conv_kernel_size),
                strides=(self.conv_stride, self.conv_stride),
                padding="SAME",
                use_bias=False,
                name=f"conv_{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=deterministic, momentum=0.9, name=f"bn_{i}"
            )(x)
            x = nn.relu(x)
        B, T, F, C = x.shape
        x = x.reshape(B, T, F * C)
        # GRU over the downsampled time axis; final hidden state is the
        # reference embedding (fs2/gst/model.py:196-198)
        cell = nn.GRUCell(features=self.gru_units, name="gru")
        rnn = nn.RNN(cell, name="gru_rnn")
        outputs = rnn(x)
        return outputs[:, -1, :]


class StyleTokenLayer(nn.Module):
    ref_embed_dim: int = 128
    gst_tokens: int = 10
    gst_token_dim: int = 256
    gst_heads: int = 4

    def setup(self):
        self.gst_embs = self.param(
            "gst_embs",
            nn.initializers.normal(stddev=1.0),
            (self.gst_tokens, self.gst_token_dim // self.gst_heads),
        )
        n_feat = self.gst_token_dim
        self.linear_q = nn.Dense(n_feat, name="linear_q")
        self.linear_k = nn.Dense(n_feat, name="linear_k")
        self.linear_v = nn.Dense(n_feat, name="linear_v")
        self.linear_out = nn.Dense(n_feat, name="linear_out")

    def _mha(self, q: jnp.ndarray, kv: jnp.ndarray) -> jnp.ndarray:
        """q: [B, 1, q_dim]; kv: [B, N, tok_dim] -> [B, 1, n_feat]."""
        B = q.shape[0]
        h = self.gst_heads
        dk = self.gst_token_dim // h
        Q = self.linear_q(q).reshape(B, -1, h, dk)
        K = self.linear_k(kv).reshape(B, -1, h, dk)
        V = self.linear_v(kv).reshape(B, -1, h, dk)
        scores = jnp.einsum("bqhd,bkhd->bhqk", Q, K) / jnp.sqrt(dk)
        w = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, V).reshape(B, -1, self.gst_token_dim)
        return self.linear_out(out)

    def __call__(self, ref_embs: jnp.ndarray) -> jnp.ndarray:
        """ref_embs: [B, ref_embed_dim] -> style embeddings [B, gst_token_dim]."""
        B = ref_embs.shape[0]
        tokens = jnp.tanh(self.gst_embs)[None].repeat(B, axis=0)  # [B, N, dk]
        out = self._mha(ref_embs[:, None, :], tokens)
        return out[:, 0, :]

    def condition_on_token(self, batch_size: int, index: int = 0) -> jnp.ndarray:
        """Text-only inference: attend from a zero query to one style token
        (fs2/gst/model.py:77-85)."""
        tokens = jnp.tanh(self.gst_embs)[index][None, None, :].repeat(
            batch_size, axis=0
        )  # [B, 1, dk]
        query = jnp.zeros((batch_size, 1, self.ref_embed_dim))
        return self._mha(query, tokens)[:, 0, :]


class StyleEncoder(nn.Module):
    idim: int = 80
    gst_tokens: int = 10
    gst_token_dim: int = 256
    gst_heads: int = 4

    def setup(self):
        self.ref_enc = ReferenceEncoder(idim=self.idim, name="ref_enc")
        self.stl = StyleTokenLayer(
            gst_tokens=self.gst_tokens,
            gst_token_dim=self.gst_token_dim,
            gst_heads=self.gst_heads,
            name="stl",
        )

    def __call__(self, speech: jnp.ndarray, deterministic: bool = True):
        ref = self.ref_enc(speech, deterministic=deterministic)
        return self.stl(ref)

    def condition_on_gst_tokens(self, batch_size: int, index: int = 0):
        if index >= self.gst_tokens:
            raise ValueError(
                f"We can only synthesize by conditioning on one of "
                f"{self.gst_tokens} GST tokens"
            )
        return self.stl.condition_on_token(batch_size, index)
