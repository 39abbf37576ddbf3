"""Alignment losses: CTC forward-sum and binarization.

Parity with fs2/attn/attention_loss.py:
 - AttentionCTCLoss (:22-62): treat each text position 1..key_len as a distinct
   label; prepend a blank column with logprob -1; mask columns beyond key_len
   with -1e15; log_softmax; CTC with zero_infinity and per-target-length mean.
 - AttentionBinarizationLoss (:65-73): -mean log soft-attn mass under the hard
   alignment.

The forward-sum is an exact CTC alpha recursion as one `lax.scan` over mel
frames with carry alpha [B, 2L+1] (blank-interleaved states); all labels are
distinct by construction (text positions), so the skip transition is always
legal. Verified against brute-force path enumeration and torch.nn.CTCLoss
(tests/test_ops.py) — optax.ctc_loss is NOT an exact forward-sum (~1e-3
relative error), hence hand-rolled.

The backward pass is a custom VJP using the classic alpha–beta posterior
identity  ∂(−ll)/∂y_t(c) = −Σ_{s:label(s)=c} γ_t(s),  γ = exp(α+β−ll) —
one reverse scan instead of autodiff-through-scan (≈2× faster, no saved
per-step cotangents).

Ragged mel lengths are made uniform by forcing padded frames to emit blank
with certainty: the path then sits in the final blank state through padding,
so alpha at T-1 equals alpha at out_len-1 exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e15


def _state_maps(L: int):
    s_ids = jnp.arange(2 * L + 1)
    state_label = jnp.where(s_ids % 2 == 1, (s_ids + 1) // 2, 0)  # [S]
    odd = s_ids % 2 == 1
    return s_ids, state_label, odd


def _uniform_logprobs(logprobs, out_lens):
    """Force padded frames (t >= out_len) to emit blank with certainty."""
    B, T, Lp1 = logprobs.shape
    t_ids = jnp.arange(T)[None, :, None]
    padded = t_ids >= out_lens[:, None, None]
    col_blank = jnp.arange(Lp1)[None, None, :] == 0
    return jnp.where(padded, jnp.where(col_blank, 0.0, NEG_INF), logprobs)


def _lse2(a, b):
    m = jnp.maximum(a, b)
    out = m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))
    return jnp.where(jnp.isfinite(m), out, NEG_INF)


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    out = m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m))
    return jnp.where(jnp.isfinite(m), out, NEG_INF)


def _use_pallas(B, T, S) -> bool:
    if jax.default_backend() != "tpu":
        return False
    try:
        from . import ctc_pallas  # noqa: F401  (probe the kernel module)

        return B * S * 4 <= 2**20
    except Exception as exc:
        from ._fallback import warn_fallback_once

        warn_fallback_once("ctc banded_lse_scan_pallas", exc)
        return False


def _alpha_scan(logprobs, L):
    """alphas [T, B, S] for uniform (padding-blanked) logprobs."""
    B, T, _ = logprobs.shape
    s_ids, state_label, odd = _state_maps(L)
    S = 2 * L + 1

    if _use_pallas(B, T, S):
        try:
            from .ctc_pallas import banded_lse_scan_pallas

            emis = logprobs[:, :, state_label]  # [B, T, S] emissions
            alphas = banded_lse_scan_pallas(
                emis, left=False, add_emis_first=True
            )
            return jnp.swapaxes(alphas, 0, 1)  # [T, B, S]
        except Exception as exc:  # shape-specific lowering failure -> scan
            from ._fallback import warn_fallback_once

            warn_fallback_once("ctc alpha pallas (call)", exc)

    def emit(frame_logp):  # [B, L+1] -> [B, S]
        return frame_logp[:, state_label]

    frame0 = logprobs[:, 0, :]
    alpha0 = jnp.where(s_ids[None, :] <= 1, emit(frame0), NEG_INF)

    def shift1(a):
        return jnp.concatenate([jnp.full((B, 1), NEG_INF), a[:, :-1]], axis=1)

    def step(alpha, frame_logp):
        a0 = alpha
        a1 = shift1(alpha)
        a2 = jnp.where(odd[None, :], shift1(a1), NEG_INF)
        new_alpha = jnp.maximum(_lse3(a0, a1, a2) + emit(frame_logp), NEG_INF)
        return new_alpha, new_alpha

    _, alphas = jax.lax.scan(
        step, alpha0, jnp.swapaxes(logprobs, 0, 1)[1:], unroll=8
    )
    return jnp.concatenate([alpha0[None], alphas], axis=0)  # [T, B, S]


def _final_ll(alpha_last, in_lens, S):
    """logsumexp of the two legal final states at T-1."""
    B = alpha_last.shape[0]
    s_last_blank = jnp.clip(2 * in_lens.astype(jnp.int32), 0, S - 1)
    s_last_label = jnp.clip(2 * in_lens.astype(jnp.int32) - 1, 0, S - 1)
    a = jnp.take_along_axis(alpha_last, s_last_blank[:, None], axis=1)[:, 0]
    b = jnp.take_along_axis(alpha_last, s_last_label[:, None], axis=1)[:, 0]
    return _lse2(a, b)


@jax.custom_vjp
def ctc_forward_sum(
    logprobs: jnp.ndarray,  # [B, T, L+1]; column 0 = blank, k = text pos k
    in_lens: jnp.ndarray,  # [B] number of labels (text length)
    out_lens: jnp.ndarray,  # [B] number of frames (mel length)
) -> jnp.ndarray:
    """Exact CTC negative log-likelihood per example, labels = 1..in_len."""
    B, T, Lp1 = logprobs.shape
    L = Lp1 - 1
    y = _uniform_logprobs(logprobs, out_lens)
    alphas = _alpha_scan(y, L)
    return -_final_ll(alphas[-1], in_lens, 2 * L + 1)


def _ctc_fwd(logprobs, in_lens, out_lens):
    B, T, Lp1 = logprobs.shape
    L = Lp1 - 1
    y = _uniform_logprobs(logprobs, out_lens)
    alphas = _alpha_scan(y, L)
    ll = _final_ll(alphas[-1], in_lens, 2 * L + 1)
    return -ll, (y, alphas, ll, in_lens, out_lens)


def _ctc_bwd(residuals, g):
    """Reverse beta scan + posterior marginals."""
    y, alphas, ll, in_lens, out_lens = residuals
    T, B, S = alphas.shape
    L = (S - 1) // 2
    s_ids, state_label, odd = _state_maps(L)

    def emit(frame_logp):
        return frame_logp[:, state_label]

    # beta at T-1: 0 on the two legal final states
    s_last_blank = jnp.clip(2 * in_lens.astype(jnp.int32), 0, S - 1)
    s_last_label = jnp.clip(2 * in_lens.astype(jnp.int32) - 1, 0, S - 1)
    beta_last = jnp.where(
        (s_ids[None, :] == s_last_blank[:, None])
        | (s_ids[None, :] == s_last_label[:, None]),
        0.0,
        NEG_INF,
    )

    betas = None
    if _use_pallas(B, T, S):
        try:
            from .ctc_pallas import banded_lse_scan_pallas

            emis = y[:, :, state_label]  # [B, T, S]
            # feed reversed emissions with the final-state seed folded into
            # the first row: w_{T-1} = beta_{T-1} + emis_{T-1}
            emis_rev = jnp.flip(emis, axis=1)
            emis_rev = emis_rev.at[:, 0, :].add(beta_last)
            rows = banded_lse_scan_pallas(
                emis_rev, left=True, add_emis_first=False
            )  # [B,T,S]: rows[k] = beta_{T-2-k}; rows[T-1] unused
            betas_rev = jnp.swapaxes(rows, 0, 1)[: T - 1]
            betas = jnp.concatenate(
                [jnp.flip(betas_rev, axis=0), beta_last[None]], axis=0
            )  # [T, B, S]
        except Exception as exc:  # shape-specific lowering failure -> scan
            from ._fallback import warn_fallback_once

            warn_fallback_once("ctc beta pallas (call)", exc)
    if betas is None:
        def shift_left(a):
            return jnp.concatenate(
                [a[:, 1:], jnp.full((B, 1), NEG_INF)], axis=1
            )

        def step(beta_next, frame_logp_next):
            # beta_t(s) = lse over s' in {s, s+1, s+2 odd} of
            #             beta_{t+1}(s') + y_{t+1}(label(s'))
            w = beta_next + emit(frame_logp_next)  # [B, S]
            b0 = w
            b1 = shift_left(w)
            # skip into s+2 allowed only when s+2 is odd <=> s is odd
            b2 = jnp.where(odd[None, :], shift_left(b1), NEG_INF)
            beta = jnp.maximum(_lse3(b0, b1, b2), NEG_INF)
            return beta, beta_next  # record beta_{t+1}

        ys = jnp.flip(jnp.swapaxes(y, 0, 1)[1:], axis=0)  # y_{T-1} .. y_1
        beta_first, betas_rev = jax.lax.scan(step, beta_last, ys, unroll=8)
        betas = jnp.concatenate(
            [beta_first[None], jnp.flip(betas_rev, axis=0)], axis=0
        )  # [T, B, S]

    gamma = jnp.exp(
        jnp.clip(alphas + betas - ll[None, :, None], -80.0, 0.0)
    )  # [T, B, S]
    # collapse states -> label columns via one-hot matmul (MXU)
    M = jax.nn.one_hot(state_label, L + 1, dtype=gamma.dtype)  # [S, L+1]
    grad_y = -jnp.einsum("tbs,sc->btc", gamma, M)  # [B, T, L+1]
    # padded frames received forced emissions: no gradient flows to them
    t_ids = jnp.arange(T)[None, :, None]
    grad_y = jnp.where(t_ids >= out_lens[:, None, None], 0.0, grad_y)
    grad_y = grad_y * g[:, None, None]
    return grad_y, None, None


ctc_forward_sum.defvjp(_ctc_fwd, _ctc_bwd)


def attention_ctc_loss(
    attn_logprob: jnp.ndarray,
    in_lens: jnp.ndarray,
    out_lens: jnp.ndarray,
    blank_logprob: float = -1.0,
    sample_weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Forward-sum alignment loss over [B, T_mel, L_text] attention scores.

    `sample_weight` [B] (0/1) excludes static-shape filler rows from the
    batch mean (BucketedLoader's zero-weight partial-batch fill)."""
    B, T, L = attn_logprob.shape
    blank = jnp.full((B, T, 1), blank_logprob, dtype=jnp.float32)
    logits = jnp.concatenate([blank, attn_logprob.astype(jnp.float32)], axis=-1)
    key_ids = jnp.arange(L + 1)[None, None, :]
    logits = jnp.where(key_ids > in_lens[:, None, None], NEG_INF, logits)
    logprobs = jax.nn.log_softmax(logits, axis=-1)

    per_example = ctc_forward_sum(logprobs, in_lens, out_lens)
    # zero_infinity + "mean" reduction (per-target-length, then batch mean)
    per_example = jnp.where(jnp.isfinite(per_example), per_example, 0.0)
    per_example = jnp.where(per_example >= -NEG_INF * 1e-3, 0.0, per_example)
    per_example = per_example / jnp.maximum(in_lens.astype(jnp.float32), 1.0)
    if sample_weight is None:
        return jnp.mean(per_example)
    w = sample_weight.astype(jnp.float32)
    return jnp.sum(per_example * w) / jnp.maximum(jnp.sum(w), 1.0)


def attention_binarization_loss(
    hard_attention: jnp.ndarray,
    soft_attention: jnp.ndarray,
    eps: float = 1e-12,
    sample_weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """-sum(log soft | hard==1) / sum(hard) (fs2/attn/attention_loss.py:65-73)."""
    log_soft = jnp.log(jnp.clip(soft_attention, eps, None))
    hard = hard_attention
    if sample_weight is not None:
        w = sample_weight.astype(hard.dtype)
        hard = hard * w.reshape((-1,) + (1,) * (hard.ndim - 1))
    num = jnp.sum(log_soft * hard)
    den = jnp.maximum(jnp.sum(hard), 1.0)
    return -num / den
