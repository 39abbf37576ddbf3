"""Core op tests: MAS scan vs golden, length regulator vs repeat_interleave,
variance averaging, bucketize parity, CTC loss vs torch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastspeech2_lightning_tpu.ops import (
    attention_binarization_loss,
    attention_ctc_loss,
    average_variance,
    bucketize,
    length_regulate,
    mas_width1_batched,
)
from fastspeech2_lightning_tpu.ops.mas import b_mas_numpy


# ---------------------------------------------------------------------------
# MAS
# ---------------------------------------------------------------------------


def random_log_attn(rng, B, T, L):
    x = rng.standard_normal((B, T, L)).astype(np.float32)
    # log of a softmax-ish distribution
    x = x - x.max(axis=-1, keepdims=True)
    return x


def test_mas_matches_golden_full_lengths():
    rng = np.random.default_rng(0)
    B, T, L = 4, 37, 11
    la = random_log_attn(rng, B, T, L)
    in_lens = np.full(B, L, dtype=np.int32)
    out_lens = np.full(B, T, dtype=np.int32)
    hard, durs = mas_width1_batched(jnp.array(la), jnp.array(in_lens), jnp.array(out_lens))
    golden = b_mas_numpy(la, in_lens, out_lens)
    np.testing.assert_array_equal(np.asarray(hard), golden)
    np.testing.assert_array_equal(
        np.asarray(durs), golden.sum(axis=1).astype(np.int32)
    )


def test_mas_matches_golden_ragged_lengths():
    rng = np.random.default_rng(1)
    B, T, L = 6, 50, 16
    la = random_log_attn(rng, B, T, L)
    in_lens = rng.integers(2, L + 1, size=B).astype(np.int32)
    out_lens = np.maximum(
        rng.integers(4, T + 1, size=B).astype(np.int32), in_lens + 1
    )
    hard, durs = mas_width1_batched(jnp.array(la), jnp.array(in_lens), jnp.array(out_lens))
    golden = b_mas_numpy(la, in_lens, out_lens)
    np.testing.assert_array_equal(np.asarray(hard), golden)
    # durations sum to mel lengths — the invariant the reference asserts
    # (fs2/variance_adaptor.py:289-305)
    np.testing.assert_array_equal(np.asarray(durs).sum(axis=1), out_lens)


def test_mas_monotonic_path_properties():
    rng = np.random.default_rng(2)
    B, T, L = 3, 64, 20
    la = random_log_attn(rng, B, T, L)
    in_lens = np.array([20, 7, 13], dtype=np.int32)
    out_lens = np.array([64, 30, 45], dtype=np.int32)
    hard, durs = mas_width1_batched(jnp.array(la), jnp.array(in_lens), jnp.array(out_lens))
    hard = np.asarray(hard)
    for b in range(B):
        path = hard[b, : out_lens[b]].argmax(axis=1)
        assert path[0] == 0
        assert path[-1] == in_lens[b] - 1
        steps = np.diff(path)
        assert np.all((steps == 0) | (steps == 1))  # width-1 monotonic
        assert np.all(hard[b, out_lens[b]:] == 0)  # padding untouched
        assert np.all(np.asarray(durs)[b, in_lens[b]:] == 0)


# ---------------------------------------------------------------------------
# Length regulator
# ---------------------------------------------------------------------------


def test_length_regulate_matches_repeat_interleave():
    rng = np.random.default_rng(3)
    B, L, D = 3, 7, 5
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    durs = rng.integers(0, 4, size=(B, L)).astype(np.int32)
    max_len = int(durs.sum(axis=1).max())
    out, mask, mel_lens = length_regulate(jnp.array(x), jnp.array(durs), max_len)
    out = np.asarray(out)
    for b in range(B):
        expected = np.repeat(x[b], durs[b], axis=0)
        n = expected.shape[0]
        np.testing.assert_allclose(out[b, :n], expected, rtol=1e-6)
        assert np.all(out[b, n:] == 0)
        assert int(np.asarray(mel_lens)[b]) == n
        assert np.asarray(mask)[b, :n].all() and not np.asarray(mask)[b, n:].any()


def test_length_regulate_truncates_at_max_length():
    x = jnp.ones((1, 3, 2))
    durs = jnp.array([[5, 5, 5]])
    out, mask, mel_lens = length_regulate(x, durs, 8)
    assert out.shape == (1, 8, 2)
    assert int(mel_lens[0]) == 8
    assert bool(mask.all())


# ---------------------------------------------------------------------------
# Variance utils
# ---------------------------------------------------------------------------


def test_average_variance_excludes_zeros():
    # one phone spanning frames [0,3): values 2, 0, 4 -> mean of nonzero = 3
    var = jnp.array([[2.0, 0.0, 4.0, 5.0]])
    durs = jnp.array([[3, 1]])
    avg = average_variance(var, durs)
    np.testing.assert_allclose(np.asarray(avg), [[3.0, 5.0]])


def test_average_variance_zero_span():
    var = jnp.array([[0.0, 0.0, 1.0]])
    durs = jnp.array([[2, 1]])
    avg = average_variance(var, durs)
    np.testing.assert_allclose(np.asarray(avg), [[0.0, 1.0]])


def test_bucketize_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    vals = rng.standard_normal((2, 9)).astype(np.float32)
    bins = np.linspace(-2, 2, 15).astype(np.float32)
    ours = np.asarray(bucketize(jnp.array(vals), jnp.array(bins)))
    theirs = torch.bucketize(torch.tensor(vals), torch.tensor(bins)).numpy()
    np.testing.assert_array_equal(ours, theirs)


# ---------------------------------------------------------------------------
# CTC forward-sum + binarization losses
# ---------------------------------------------------------------------------


def torch_attention_ctc(attn_logprob, in_lens, out_lens, blank_logprob=-1.0):
    """The reference loss re-expressed in torch for cross-checking
    (fs2/attn/attention_loss.py:22-62)."""
    import torch
    import torch.nn.functional as F

    attn_logprob = torch.tensor(attn_logprob)[:, None]  # [B,1,T,L]
    key_lens = torch.tensor(in_lens)
    query_lens = torch.tensor(out_lens)
    max_key_len = attn_logprob.size(-1)
    x = attn_logprob.squeeze(1).permute(1, 0, 2)  # [T,B,L]
    x = F.pad(input=x, pad=(1, 0, 0, 0, 0, 0), value=blank_logprob)
    key_inds = torch.arange(max_key_len + 1, dtype=torch.long)
    x.masked_fill_(key_inds.view(1, 1, -1) > key_lens.view(1, -1, 1), -1e15)
    x = torch.log_softmax(x, dim=-1)
    target_seqs = key_inds[1:].unsqueeze(0).repeat(key_lens.numel(), 1)
    ctc = torch.nn.CTCLoss(zero_infinity=True)
    return float(
        ctc(x, target_seqs, input_lengths=query_lens, target_lengths=key_lens)
    )


def test_ctc_loss_matches_torch():
    pytest.importorskip("torch")
    rng = np.random.default_rng(5)
    B, T, L = 3, 24, 8
    attn = rng.standard_normal((B, T, L)).astype(np.float32) * 0.1
    in_lens = np.array([8, 5, 3], dtype=np.int32)
    out_lens = np.array([24, 15, 9], dtype=np.int32)
    ours = float(
        attention_ctc_loss(jnp.array(attn), jnp.array(in_lens), jnp.array(out_lens))
    )
    theirs = torch_attention_ctc(attn, in_lens, out_lens)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_binarization_loss_matches_reference_formula():
    rng = np.random.default_rng(6)
    soft = jax.nn.softmax(jnp.array(rng.standard_normal((2, 10, 4))), axis=-1)
    hard = jnp.zeros((2, 10, 4)).at[:, jnp.arange(10), jnp.arange(10) % 4].set(1.0)
    loss = float(attention_binarization_loss(hard, soft))
    expected = -float(
        jnp.sum(jnp.log(jnp.clip(soft, 1e-12, None)) * hard) / jnp.sum(hard)
    )
    np.testing.assert_allclose(loss, expected, rtol=1e-6)


def test_ctc_gradient_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(11)
    B, T, L = 3, 20, 6
    attn = rng.standard_normal((B, T, L)).astype(np.float32) * 0.3
    in_lens = np.array([6, 4, 3], dtype=np.int32)
    out_lens = np.array([20, 12, 8], dtype=np.int32)

    # torch gradient w.r.t. the raw attention scores
    x = torch.tensor(attn, requires_grad=True)
    logits = torch.cat([torch.full((B, T, 1), -1.0), x], dim=-1)
    key_ids = torch.arange(L + 1).view(1, 1, -1)
    logits = torch.where(
        key_ids > torch.tensor(in_lens).view(-1, 1, 1), torch.tensor(-1e15), logits
    )
    logp = torch.log_softmax(logits, dim=-1).permute(1, 0, 2)
    targets = torch.arange(1, L + 1).unsqueeze(0).repeat(B, 1)
    ctc = torch.nn.CTCLoss(zero_infinity=True)
    loss = ctc(
        logp, targets, input_lengths=torch.tensor(out_lens),
        target_lengths=torch.tensor(in_lens),
    )
    loss.backward()
    torch_grad = x.grad.numpy()

    ours_loss, ours_grad = jax.value_and_grad(
        lambda a: attention_ctc_loss(a, jnp.array(in_lens), jnp.array(out_lens))
    )(jnp.array(attn))
    np.testing.assert_allclose(float(ours_loss), float(loss), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(ours_grad), torch_grad, rtol=2e-3, atol=2e-5)


def test_mas_pallas_interpret_matches_golden():
    """Pallas MAS kernel (interpret mode on CPU) vs the NumPy golden."""
    from fastspeech2_lightning_tpu.ops.mas import NEG_INF
    from fastspeech2_lightning_tpu.ops.mas_pallas import mas_width1_pallas

    rng = np.random.default_rng(12)
    B, T, L = 4, 40, 16
    la = random_log_attn(rng, B, T, L)
    in_lens = np.array([16, 9, 5, 12], dtype=np.int32)
    out_lens = np.array([40, 30, 17, 25], dtype=np.int32)
    # pre-mask like mas_width1_batched does
    j_ids = np.arange(L)[None, None, :]
    i_ids = np.arange(T)[None, :, None]
    valid = (j_ids < in_lens[:, None, None]) & (i_ids < out_lens[:, None, None])
    masked = np.where(valid, np.maximum(la, NEG_INF), NEG_INF).astype(np.float32)

    hard = np.asarray(
        mas_width1_pallas(
            jnp.array(masked), jnp.array(in_lens), jnp.array(out_lens),
            interpret=True,
        )
    )
    frame_valid = (np.arange(T)[None, :] < out_lens[:, None])[:, :, None]
    hard = hard * frame_valid
    golden = b_mas_numpy(la, in_lens, out_lens)
    np.testing.assert_array_equal(hard, golden)


def test_ctc_pallas_kernels_match_scan():
    """Pallas banded-lse kernels (interpret mode) vs the scan implementations."""
    from fastspeech2_lightning_tpu.ops.ctc import (
        _alpha_scan,
        _state_maps,
        _uniform_logprobs,
        NEG_INF as CNEG,
    )
    from fastspeech2_lightning_tpu.ops.ctc_pallas import banded_lse_scan_pallas

    rng = np.random.default_rng(13)
    B, T, L = 2, 40, 5
    S = 2 * L + 1
    logits = rng.standard_normal((B, T, L + 1)).astype(np.float32)
    out_lens = np.array([40, 25], dtype=np.int32)
    y = _uniform_logprobs(
        jax.nn.log_softmax(jnp.array(logits), axis=-1), jnp.array(out_lens)
    )
    _, state_label, _ = _state_maps(L)
    alphas_scan = _alpha_scan(y, L)  # [T, B, S] (CPU -> scan path)
    emis = y[:, :, state_label]
    alphas_pal = banded_lse_scan_pallas(
        emis, left=False, add_emis_first=True, interpret=True
    )
    valid = np.asarray(alphas_scan) > 0.9 * CNEG
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(alphas_pal, 0, 1))[valid],
        np.asarray(alphas_scan)[valid],
        rtol=1e-5, atol=1e-5,
    )


def test_ctc_grad_pallas_interpret_matches_scan_grad():
    """End-to-end grad with kernels forced on (interpret) == scan grad."""
    import fastspeech2_lightning_tpu.ops.ctc as ctc_mod
    import fastspeech2_lightning_tpu.ops.ctc_pallas as cp

    rng = np.random.default_rng(14)
    B, T, L = 2, 30, 6
    attn = rng.standard_normal((B, T, L)).astype(np.float32) * 0.3
    il = jnp.array([6, 4], dtype=jnp.int32)
    ol = jnp.array([30, 18], dtype=jnp.int32)

    g_scan = jax.grad(lambda a: ctc_mod.attention_ctc_loss(a, il, ol))(
        jnp.array(attn)
    )

    orig_use, orig_scan = ctc_mod._use_pallas, cp.banded_lse_scan_pallas
    try:
        ctc_mod._use_pallas = lambda *a: True
        cp_fn = orig_scan

        def interp(*args, **kw):
            kw["interpret"] = True
            return cp_fn(*args, **kw)

        # patch the symbol the ctc module imports at call time
        cp.banded_lse_scan_pallas = interp
        import sys
        mod = sys.modules["fastspeech2_lightning_tpu.ops.ctc_pallas"]
        mod.banded_lse_scan_pallas = interp
        g_pal = jax.grad(lambda a: ctc_mod.attention_ctc_loss(a, il, ol))(
            jnp.array(attn)
        )
    finally:
        ctc_mod._use_pallas = orig_use
        cp.banded_lse_scan_pallas = orig_scan
        import sys
        sys.modules["fastspeech2_lightning_tpu.ops.ctc_pallas"].banded_lse_scan_pallas = orig_scan

    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_scan), rtol=1e-4, atol=1e-6
    )
