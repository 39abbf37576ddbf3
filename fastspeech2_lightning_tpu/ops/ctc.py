"""Alignment losses: CTC forward-sum and binarization.

Parity with fs2/attn/attention_loss.py:
 - AttentionCTCLoss (:22-62): treat each text position 1..key_len as a distinct
   label; prepend a blank column with logprob -1; mask columns beyond key_len
   with -1e15; log_softmax; CTC with zero_infinity and per-target-length mean.
 - AttentionBinarizationLoss (:65-73): -mean log soft-attn mass under the hard
   alignment.

The forward-sum here is an exact CTC alpha recursion as one `lax.scan` over
mel frames with carry alpha [B, 2L+1] (blank-interleaved states). All labels
are distinct by construction (they are text positions), so the s-2 skip
transition is always legal. Verified against a brute-force path enumeration
and torch.nn.CTCLoss (tests/test_ops.py) — optax.ctc_loss was tried first and
is *not* an exact forward-sum (~1e-3 relative error), hence the hand-rolled
scan."""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e15


def _log_softmax_masked(logits: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.log_softmax(logits, axis=-1)


def ctc_forward_sum(
    logprobs: jnp.ndarray,  # [B, T, L+1]; column 0 = blank, k = text pos k
    in_lens: jnp.ndarray,  # [B] number of labels (text length)
    out_lens: jnp.ndarray,  # [B] number of frames (mel length)
) -> jnp.ndarray:
    """Exact CTC negative log-likelihood per example, labels = 1..in_len.

    States s = 0..2L: even s -> blank, odd s -> label (s+1)//2.
    alpha_t(s) = logp_t(label(s)) + logsumexp(alpha_{t-1}(s),
                 alpha_{t-1}(s-1), [s odd] alpha_{t-1}(s-2)).
    """
    B, T, Lp1 = logprobs.shape
    L = Lp1 - 1
    S = 2 * L + 1
    s_ids = jnp.arange(S)
    # label index per state (0 = blank)
    state_label = jnp.where(s_ids % 2 == 1, (s_ids + 1) // 2, 0)  # [S]
    odd = (s_ids % 2 == 1)

    def emit(frame_logp):  # [B, L+1] -> [B, S]
        return frame_logp[:, state_label]

    # init: alpha_0 = emit(0) at states 0 (blank) and 1 (first label)
    frame0 = logprobs[:, 0, :]
    alpha0 = jnp.where(s_ids[None, :] <= 1, emit(frame0), NEG_INF)

    def shift1(a):
        return jnp.concatenate([jnp.full((B, 1), NEG_INF), a[:, :-1]], axis=1)

    def step(alpha, frame_logp):
        a0 = alpha
        a1 = shift1(alpha)
        a2 = shift1(a1)
        a2 = jnp.where(odd[None, :], a2, NEG_INF)  # skip only into label states
        stacked = jnp.stack([a0, a1, a2], axis=0)
        m = jnp.max(stacked, axis=0)
        summed = m + jnp.log(
            jnp.sum(jnp.exp(stacked - m[None]), axis=0)
        )
        summed = jnp.where(jnp.isfinite(m), summed, NEG_INF)
        new_alpha = summed + emit(frame_logp)
        new_alpha = jnp.maximum(new_alpha, NEG_INF)
        return new_alpha, new_alpha

    _, alphas = jax.lax.scan(
        step, alpha0, jnp.swapaxes(logprobs, 0, 1)[1:], unroll=8
    )
    alphas = jnp.concatenate(
        [alpha0[None], alphas], axis=0
    )  # [T, B, S]

    # gather alpha at t = out_len-1, s in {2*in_len, 2*in_len-1}
    t_idx = jnp.clip(out_lens.astype(jnp.int32) - 1, 0, T - 1)  # [B]
    final = alphas[t_idx, jnp.arange(B)]  # [B, S]
    s_last_blank = jnp.clip(2 * in_lens.astype(jnp.int32), 0, S - 1)
    s_last_label = jnp.clip(2 * in_lens.astype(jnp.int32) - 1, 0, S - 1)
    a = jnp.take_along_axis(final, s_last_blank[:, None], axis=1)[:, 0]
    b = jnp.take_along_axis(final, s_last_label[:, None], axis=1)[:, 0]
    m = jnp.maximum(a, b)
    ll = m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))
    return -ll  # [B]


def attention_ctc_loss(
    attn_logprob: jnp.ndarray,
    in_lens: jnp.ndarray,
    out_lens: jnp.ndarray,
    blank_logprob: float = -1.0,
) -> jnp.ndarray:
    """Forward-sum alignment loss over [B, T_mel, L_text] attention scores."""
    B, T, L = attn_logprob.shape
    blank = jnp.full((B, T, 1), blank_logprob, dtype=jnp.float32)
    logits = jnp.concatenate([blank, attn_logprob.astype(jnp.float32)], axis=-1)
    key_ids = jnp.arange(L + 1)[None, None, :]
    logits = jnp.where(key_ids > in_lens[:, None, None], NEG_INF, logits)
    logprobs = _log_softmax_masked(logits)

    per_example = ctc_forward_sum(logprobs, in_lens, out_lens)
    # zero_infinity + "mean" reduction (per-target-length, then batch mean)
    per_example = jnp.where(jnp.isfinite(per_example), per_example, 0.0)
    per_example = jnp.where(per_example >= -NEG_INF * 1e-3, 0.0, per_example)
    return jnp.mean(per_example / jnp.maximum(in_lens.astype(jnp.float32), 1.0))


def attention_binarization_loss(
    hard_attention: jnp.ndarray, soft_attention: jnp.ndarray, eps: float = 1e-12
) -> jnp.ndarray:
    """-sum(log soft | hard==1) / sum(hard) (fs2/attn/attention_loss.py:65-73)."""
    log_soft = jnp.log(jnp.clip(soft_attention, eps, None))
    num = jnp.sum(log_soft * hard_attention)
    den = jnp.maximum(jnp.sum(hard_attention), 1.0)
    return -num / den
