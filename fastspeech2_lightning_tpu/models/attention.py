"""Learned text↔mel alignment attention (one-TTS-alignment, arXiv:2108.10447).

Behavioral parity with fs2/attn/attention.py:101-251 (ConvAttention):
key/query conv projections, Gaussian-isotropic log-likelihood scores
``-0.0005 * Σ_c (q - k)²``, optional log attention prior, masked softmax over
the text axis.

TPU redesign: the reference materializes the [B, C, T_mel, T_text] broadcast
difference tensor (fs2/attn/attention.py:239) — pure HBM traffic. Here the
squared distance is expanded as ``|q|² + |k|² − 2·q·kᵀ`` so the dominant term
is one batched matmul on the MXU and the peak intermediate is [B, T_mel,
T_text]."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


class ConvNorm(nn.Module):
    """Xavier-initialized 1-D conv over [B, T, C] (fs2/attn/attention.py:23-56)."""

    features: int
    kernel_size: int = 1

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            padding="SAME",
            kernel_init=nn.initializers.xavier_uniform(),
        )(x)


class Invertible1x1ConvLUS(nn.Module):
    """LU-parameterized invertible 1x1 conv (fs2/attn/attention.py:59-98).

    Provided for the 'inv_conv' query-encoder variant; the default model path
    uses the 3xconv encoder."""

    channels: int

    @nn.compact
    def __call__(self, x):
        import jax

        c = self.channels

        # Random orthonormal W (det +1) decomposed as P @ L @ U from ONE rng
        # draw — the reference's init (fs2/attn/attention.py:62-78). P is a
        # fixed buffer; L (unit diagonal) and U are trainable, exactly as in
        # the reference (p buffer; lower/upper/upper_diag parameters).
        if self.is_initializing():
            w = jax.random.normal(self.make_rng("params"), (c, c), jnp.float32)
            q, _ = jnp.linalg.qr(w)
            sign = jnp.where(jnp.linalg.det(q) < 0, -1.0, 1.0)
            q = q.at[:, 0].multiply(sign)
            p0, l0, u0 = jax.scipy.linalg.lu(q)
        else:
            # On apply, flax re-evaluates init fns abstractly (eval_shape)
            # for validation — supply shape-correct dummies; values unused.
            p0 = l0 = u0 = jnp.zeros((c, c), jnp.float32)

        p = self.variable("constants", "p", lambda: p0).value
        lower = self.param("lower", lambda _rng, _shape: jnp.tril(l0, -1), (c, c))
        upper_diag = self.param(
            "upper_diag", lambda _rng, _shape: jnp.diag(u0), (c,)
        )
        upper = self.param("upper", lambda _rng, _shape: jnp.triu(u0, 1), (c, c))
        U = jnp.triu(upper, 1) + jnp.diag(upper_diag)
        L = jnp.tril(lower, -1) + jnp.eye(c)
        W = p @ L @ U
        return x @ W.T


class ConvAttention(nn.Module):
    n_mel_channels: int = 80
    n_text_channels: int = 512
    n_att_channels: int = 80
    align_query_enc_type: str = "3xconv"
    use_query_proj: bool = True

    @nn.compact
    def __call__(
        self,
        queries: jnp.ndarray,  # [B, T_mel, n_mel] mel frames
        keys: jnp.ndarray,  # [B, T_text, n_text] text embeddings
        key_mask: Optional[jnp.ndarray] = None,  # [B, T_text] True=valid
        attn_prior: Optional[jnp.ndarray] = None,  # [B, T_mel, T_text]
    ):
        """Returns (attn [B, T_mel, T_text] softmaxed over text,
        attn_logprob [B, T_mel, T_text])."""
        keys_enc = ConvNorm(
            self.n_text_channels * 2, kernel_size=3, name="key_proj_0"
        )(keys)
        keys_enc = nn.relu(keys_enc)
        keys_enc = ConvNorm(self.n_att_channels, kernel_size=1, name="key_proj_1")(
            keys_enc
        )

        if self.use_query_proj:
            if self.align_query_enc_type == "3xconv":
                q = ConvNorm(
                    self.n_mel_channels * 2, kernel_size=3, name="query_proj_0"
                )(queries)
                q = nn.relu(q)
                q = ConvNorm(self.n_mel_channels, kernel_size=1, name="query_proj_1")(q)
                q = nn.relu(q)
                queries_enc = ConvNorm(
                    self.n_att_channels, kernel_size=1, name="query_proj_2"
                )(q)
            elif self.align_query_enc_type == "inv_conv":
                queries_enc = Invertible1x1ConvLUS(
                    self.n_mel_channels, name="query_proj_inv"
                )(queries)
            else:
                raise ValueError("Unknown query encoder type specified")
        else:
            queries_enc = queries

        # -0.0005 * ||q - k||² via the matmul expansion
        q32 = queries_enc.astype(jnp.float32)
        k32 = keys_enc.astype(jnp.float32)
        q_sq = jnp.sum(q32 * q32, axis=-1, keepdims=True)  # [B, T_mel, 1]
        k_sq = jnp.sum(k32 * k32, axis=-1)[:, None, :]  # [B, 1, T_text]
        cross = jnp.einsum("bqc,bkc->bqk", q32, k32)  # MXU
        attn = -0.0005 * (q_sq + k_sq - 2.0 * cross)

        if attn_prior is not None:
            attn = nn.log_softmax(attn, axis=-1) + jnp.log(
                attn_prior.astype(jnp.float32) + 1e-8
            )

        attn_logprob = attn

        if key_mask is not None:
            attn = jnp.where(key_mask[:, None, :], attn, -jnp.inf)
        attn = nn.softmax(attn, axis=-1)
        return attn, attn_logprob
