"""Self-attention with in-kernel attention-probability dropout (Pallas TPU).

Why: the conformer's reference semantics (torchaudio MultiheadAttention,
consumed at /root/reference/fs2/model.py:95-119) apply dropout to the
attention probabilities, which rules out the streaming flash kernel — so the
training path materialized [B, heads, T, T] score tensors in HBM (~30% of
the B=32 train step's device time). At this model's sizes the entire
per-(batch, head) problem fits in VMEM (T <= ~2048, head_dim <= 256:
S is T*T*4 bytes = 4 MB at T=1024), so no streaming softmax is needed:
one grid step = one (batch, head) — full-row softmax, dropout mask drawn
from the TPU PRNG inside the kernel, both matmuls on the MXU, and the
probabilities never touch HBM.

The backward kernel recomputes S and regenerates the SAME dropout mask from
the same (seed, batch, head) PRNG stream, then forms dQ, dK, dV in one pass
— probabilities never touch HBM there either.

Semantics: O = dropout(softmax(sm_scale * Q K^T + bias)) @ V with inverted
scaling (kept entries divided by 1-p), matching nn.Dropout on the weights of
the einsum path (the DRAW differs — dropout is stochastic across
implementations). p=0.0 is numerically the plain masked softmax attention.

Used by models/conformer.py for TRAINING when the shape fits; the einsum
path remains the fallback and golden reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _uniform_keep(shape, p: float):
    """Boolean keep-mask drawn from the already-seeded in-kernel PRNG."""
    bits = pltpu.prng_random_bits(shape)  # int32 bits
    # uint32 threshold comparison: keep iff U32(bits) >= p * 2^32
    thresh = jnp.uint32(min(int(p * (1 << 32)), (1 << 32) - 1))
    return pltpu.bitcast(bits, jnp.uint32) >= thresh


def _softmax_rows(s):
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=1, keepdims=True)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *, p, sm_scale):
    b, h = pl.program_id(0), pl.program_id(1)
    q = q_ref[0, 0]  # [T, dh]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * sm_scale + bias_ref[0, 0][None, :]  # key-side additive mask
    # softmax with the row normalization DEFERRED: the T*T division never
    # happens — E = exp(s - m) feeds the MXU unnormalized and 1/rowsum
    # (together with the dropout keep-scale) lands on the [T, dh] output
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    ssum = jnp.sum(e, axis=1, keepdims=True)
    eb = e.astype(v.dtype)
    scale = 1.0 / ssum
    if p > 0.0:
        # hardware seed takes at most 2 words: fold (b, h) into one
        pltpu.prng_seed(seed_ref[0], b * pl.num_programs(1) + h)
        keep = _uniform_keep(e.shape, p)
        eb = jnp.where(keep, eb, jnp.zeros_like(eb))
        scale = scale * (1.0 / (1.0 - p))
    acc = jnp.dot(eb, v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = (acc * scale).astype(o_ref.dtype)


def _bwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
    dq_ref, dk_ref, dv_ref, *, p, sm_scale,
):
    b, h = pl.program_id(0), pl.program_id(1)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * sm_scale + bias_ref[0, 0][None, :]
    # P = inv ∘ E with inv = 1/rowsum(E) is never materialized: every T*T
    # pass that used to touch P folds the row factor into a [T, 1] scale
    # on a matmul operand or output instead (deferred-normalization form
    # of the softmax VJP: ds = c·sm_scale·inv ∘ (t1 − E ∘ (inv·rowsum t1))
    # with t1 = D ∘ dpd ∘ E and c the dropout keep-scale)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    inv = 1.0 / jnp.sum(e, axis=1, keepdims=True)
    c = (1.0 / (1.0 - p)) if p > 0.0 else 1.0
    eb = e.astype(do.dtype)
    if p > 0.0:
        # same stream as the forward pass
        pltpu.prng_seed(seed_ref[0], b * pl.num_programs(1) + h)
        keep = _uniform_keep(e.shape, p)
        eb = jnp.where(keep, eb, jnp.zeros_like(eb))
    # dv = P'^T do = c · E_drop^T (inv ∘ do): the row factor rides the
    # [T, dh] operand, not a T*T pass
    dof = (do.astype(jnp.float32) * (c * inv)).astype(do.dtype)
    dv_ref[0, 0] = jax.lax.dot_general(
        eb, dof, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    dpd = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if p > 0.0:
        t1 = jnp.where(keep, dpd, 0.0) * e
    else:
        t1 = dpd * e
    r = jnp.sum(t1, axis=1, keepdims=True) * inv
    ds = ((t1 - e * r) * ((c * sm_scale) * inv)).astype(q.dtype)
    dq_ref[0, 0] = jnp.dot(
        ds, k, preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)
    dk_ref[0, 0] = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _specs(B, H, T, dh):
    qkv = pl.BlockSpec(
        (1, 1, T, dh), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM
    )
    bias = pl.BlockSpec(
        (1, 1, T), lambda b, h: (b, 0, 0), memory_space=pltpu.VMEM
    )
    return qkv, bias


def _vmem_params(T):
    # S + prob + mask (+ ds in bwd) in f32 plus tiles and slack.
    # (batch, head) programs are independent (the PRNG stream is seeded
    # from program_id, not grid order) — parallel semantics let megacore
    # parts split the grid across TensorCores (neutral on single-core
    # chips; measured so on this v5e-class device).
    return pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel"),
        vmem_limit_bytes=6 * T * T * 4 + (8 << 20),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def attention_with_dropout(q, k, v, key_bias, seed, p: float, sm_scale: float):
    """O = dropout_p(softmax(sm_scale·QKᵀ + key_bias)) V.

    q, k, v: [B, H, T, dh]; key_bias: [B, T] additive on the key axis
    (0 valid / NEG_INF padded); seed: int32 scalar array.
    """
    return _attention_fwd_impl(q, k, v, key_bias, seed, p, sm_scale)


def _attention_fwd_impl(q, k, v, key_bias, seed, p, sm_scale):
    B, H, T, dh = q.shape
    qkv_spec, bias_spec = _specs(B, H, T, dh)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, p=p, sm_scale=sm_scale),
        grid=(B, H),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            qkv_spec, qkv_spec, qkv_spec, bias_spec,
        ],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, T, dh), q.dtype),
        compiler_params=_vmem_params(T),
        interpret=_interpret(),
    )(seed.reshape(1).astype(jnp.int32), q, k, v,
      key_bias.astype(jnp.float32)[:, None, :])


def _attention_fwd(q, k, v, key_bias, seed, p, sm_scale):
    o = _attention_fwd_impl(q, k, v, key_bias, seed, p, sm_scale)
    return o, (q, k, v, key_bias, seed)


def _attention_bwd(p, sm_scale, res, do):
    q, k, v, key_bias, seed = res
    B, H, T, dh = q.shape
    qkv_spec, bias_spec = _specs(B, H, T, dh)
    shp = jax.ShapeDtypeStruct((B, H, T, dh), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, p=p, sm_scale=sm_scale),
        grid=(B, H),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            qkv_spec, qkv_spec, qkv_spec, bias_spec, qkv_spec,
        ],
        out_specs=[qkv_spec, qkv_spec, qkv_spec],
        out_shape=[shp, shp, shp],
        compiler_params=_vmem_params(T),
        interpret=_interpret(),
    )(seed.reshape(1).astype(jnp.int32), q, k, v,
      key_bias.astype(jnp.float32)[:, None, :], do)
    import numpy as np

    d_bias = jnp.zeros_like(key_bias)  # mask bias carries no useful gradient
    d_seed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, d_bias, d_seed


attention_with_dropout.defvjp(_attention_fwd, _attention_bwd)


def _round_up_128(n: int) -> int:
    return ((n + 127) // 128) * 128


def attention_with_dropout_padded(q, k, v, key_bias, seed, p, sm_scale):
    """Caller-proof wrapper: pad T and dh up to 128 multiples, run the
    kernel, slice back.

    Real training batches pad text to multiples of 16 and mel to 32
    (dataset.PAD_MULT_*), and 4-head d=256 configs have dh=64 — without this
    wrapper the kernel only fired on benchmark-shaped inputs. Zero-padding dh
    leaves QKᵀ scores and the PV product unchanged; padded key positions are
    masked via NEG_INF bias; padded query rows are sliced off (their
    cotangents are zero under autodiff, so dk/dv stay exact). dh padding
    doubles the two matmuls' contraction work for dh=64, which still beats
    materializing [B, h, T, T] in HBM by a wide margin.
    """
    B, H, T, dh = q.shape
    Tp, dhp = _round_up_128(T), _round_up_128(dh)
    if Tp == T and dhp == dh:
        return attention_with_dropout(q, k, v, key_bias, seed, p, sm_scale)
    pad4 = ((0, 0), (0, 0), (0, Tp - T), (0, dhp - dh))
    qp = jnp.pad(q, pad4)
    kp = jnp.pad(k, pad4)
    vp = jnp.pad(v, pad4)
    bias = jnp.pad(
        key_bias, ((0, 0), (0, Tp - T)), constant_values=NEG_INF
    )
    o = attention_with_dropout(qp, kp, vp, bias, seed, p, sm_scale)
    return o[:, :, :T, :dh]


def supported(T: int, dh: int) -> bool:
    """Full-VMEM (non-streaming) bound: S/prob/mask resident per (b, h).
    Arbitrary T/dh are handled by attention_with_dropout_padded; the bound
    applies to the 128-padded sequence length. Longer sequences use the
    streaming kernel (attention_with_dropout_streaming)."""
    Tp = _round_up_128(T)
    if 6 * Tp * Tp * 4 > 56 << 20:  # Tp <= ~1536
        return False
    return not _interpret()


# ---------------------------------------------------------------------------
# Streaming (flash-style) variant for T beyond the full-VMEM bound
# ---------------------------------------------------------------------------
#
# Dropout on attention PROBABILITIES under an online softmax: the running
# normalizer l accumulates the UNMASKED exponentials while the accumulator
# applies the per-element keep mask, so
#     O_i = (sum_j keep_ij e^{s_ij} v_j) / ((1-p) * sum_j e^{s_ij})
#         = sum_j [keep_ij softmax(s_i)_j / (1-p)] v_j
# which is exactly dropout(softmax(s)) @ V with inverted scaling. The keep
# mask for tile (qi, kj) is regenerated in the backward kernels from the
# same (seed, b, h, qi, kj) PRNG stream. Residuals (row max m, normalizer l)
# are saved by the forward pass, as in standard flash attention.

BQ = 1024  # query block (8x128 sublane tiles for the residual layout)
BK = 512   # key block


def _tile_seed(seed_ref, b, h, qi, kj, nq, nk, H):
    pltpu.prng_seed(seed_ref[0], ((b * H + h) * nq + qi) * nk + kj)


def _sfwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, m_ref, l_ref,
    acc_s, m_s, l_s, *, p, sm_scale, H,
):
    b, h = pl.program_id(0), pl.program_id(1)
    qi, kj = pl.program_id(2), pl.program_id(3)
    nq, nk = pl.num_programs(2), pl.num_programs(3)

    @pl.when(kj == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, -jnp.inf)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    q = q_ref[0, 0]  # [BQ, dh]
    k = k_ref[0, 0]  # [BK, dh]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * sm_scale + bias_ref[0, 0][None, :]

    m_prev = m_s[...]  # [BQ, 1]
    l_prev = l_s[...]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_cur)
    p_ij = jnp.exp(s - m_cur)
    l_s[...] = l_prev * alpha + jnp.sum(p_ij, axis=1, keepdims=True)
    m_s[...] = m_cur
    if p > 0.0:
        _tile_seed(seed_ref, b, h, qi, kj, nq, nk, H)
        keep = _uniform_keep(p_ij.shape, p)
        p_ij = jnp.where(keep, p_ij, 0.0)
    acc_s[...] = acc_s[...] * alpha + jax.lax.dot_general(
        p_ij.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kj == nk - 1)
    def _emit():
        l_fin = jnp.maximum(l_s[...], 1e-30)
        o_ref[0, 0] = (acc_s[...] / ((1.0 - p) * l_fin)).astype(o_ref.dtype)
        # residuals lane-broadcast to [BQ, 128] (Mosaic wants (8,128)-tiled
        # blocks and cannot shape-cast a tile back to a column; writing the
        # row value across lanes lets the backward read lane 0 directly)
        m_ref[0, 0] = jnp.broadcast_to(m_s[...], (BQ, 128))
        l_ref[0, 0] = jnp.broadcast_to(l_fin, (BQ, 128))


def _sbwd_dq_kernel(
    seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref, m_ref, l_ref, d_ref,
    dq_ref, dq_s, *, p, sm_scale, H,
):
    b, h = pl.program_id(0), pl.program_id(1)
    qi, kj = pl.program_id(2), pl.program_id(3)
    nq, nk = pl.num_programs(2), pl.num_programs(3)

    @pl.when(kj == 0)
    def _init():
        dq_s[...] = jnp.zeros_like(dq_s)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * sm_scale + bias_ref[0, 0][None, :]
    m_row = m_ref[0, 0][:, 0:1]
    l_row = l_ref[0, 0][:, 0:1]
    f = jnp.exp(s - m_row) / l_row
    dpd = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if p > 0.0:
        _tile_seed(seed_ref, b, h, qi, kj, nq, nk, H)
        keep = _uniform_keep(f.shape, p)
        dprob = jnp.where(keep, dpd, 0.0) * (1.0 / (1.0 - p))
    else:
        dprob = dpd
    ds = f * (dprob - d_ref[0, 0][:, 0:1])
    dq_s[...] += jax.lax.dot_general(
        (ds * sm_scale).astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kj == nk - 1)
    def _emit():
        dq_ref[0, 0] = dq_s[...].astype(dq_ref.dtype)


def _sbwd_dkv_kernel(
    seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref, m_ref, l_ref, d_ref,
    dk_ref, dv_ref, dk_s, dv_s, *, p, sm_scale, H,
):
    b, h = pl.program_id(0), pl.program_id(1)
    kj, qi = pl.program_id(2), pl.program_id(3)
    nk, nq = pl.num_programs(2), pl.num_programs(3)

    @pl.when(qi == 0)
    def _init():
        dk_s[...] = jnp.zeros_like(dk_s)
        dv_s[...] = jnp.zeros_like(dv_s)

    q = q_ref[0, 0]  # [BQ, dh]
    k = k_ref[0, 0]  # [BK, dh]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * sm_scale + bias_ref[0, 0][None, :]
    m_row = m_ref[0, 0][:, 0:1]
    l_row = l_ref[0, 0][:, 0:1]
    f = jnp.exp(s - m_row) / l_row  # [BQ, BK]
    if p > 0.0:
        _tile_seed(seed_ref, b, h, qi, kj, nq, nk, H)
        keep = _uniform_keep(f.shape, p)
        fm = jnp.where(keep, f, 0.0) * (1.0 / (1.0 - p))
    else:
        fm = f
    dv_s[...] += jax.lax.dot_general(
        fm.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dpd = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if p > 0.0:
        dprob = jnp.where(keep, dpd, 0.0) * (1.0 / (1.0 - p))
    else:
        dprob = dpd
    ds = f * (dprob - d_ref[0, 0][:, 0:1])  # [BQ, BK]
    dk_s[...] += jax.lax.dot_general(
        (ds * sm_scale).astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qi == nq - 1)
    def _emit():
        dk_ref[0, 0] = dk_s[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_s[...].astype(dv_ref.dtype)


def _stream_specs(B, H, T, dh):
    qb = pl.BlockSpec(
        (1, 1, BQ, dh), lambda b, h, qi, kj: (b, h, qi, 0),
        memory_space=pltpu.VMEM,
    )
    kb = pl.BlockSpec(
        (1, 1, BK, dh), lambda b, h, qi, kj: (b, h, kj, 0),
        memory_space=pltpu.VMEM,
    )
    bias = pl.BlockSpec(
        (1, 1, BK), lambda b, h, qi, kj: (b, 0, kj), memory_space=pltpu.VMEM
    )
    ob = pl.BlockSpec(
        (1, 1, BQ, dh), lambda b, h, qi, kj: (b, h, qi, 0),
        memory_space=pltpu.VMEM,
    )
    row = pl.BlockSpec(
        (1, 1, BQ, 128), lambda b, h, qi, kj: (b, h, qi, 0),
        memory_space=pltpu.VMEM,
    )
    return qb, kb, bias, ob, row


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def attention_with_dropout_streaming(q, k, v, key_bias, seed, p, sm_scale):
    """Flash-style streaming version of attention_with_dropout for sequences
    beyond the full-VMEM bound. Same semantics; T must be a BQ multiple and
    dh a 128 multiple (use attention_with_dropout_auto for arbitrary shapes).
    """
    o, _, _ = _stream_fwd_impl(q, k, v, key_bias, seed, p, sm_scale)
    return o


def _stream_fwd_impl(q, k, v, key_bias, seed, p, sm_scale):
    B, H, T, dh = q.shape
    nq, nk = T // BQ, T // BK
    qb, kb, bias, ob, row = _stream_specs(B, H, T, dh)
    o, m, l = pl.pallas_call(
        functools.partial(_sfwd_kernel, p=p, sm_scale=sm_scale, H=H),
        grid=(B, H, nq, nk),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), qb, kb, kb, bias],
        out_specs=[ob, row, row],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, T, dh), q.dtype),
            jax.ShapeDtypeStruct((B, H, T, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, H, T, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BQ, dh), jnp.float32),
            pltpu.VMEM((BQ, 1), jnp.float32),
            pltpu.VMEM((BQ, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(seed.reshape(1).astype(jnp.int32), q, k, v,
      key_bias.astype(jnp.float32)[:, None, :])
    return o, m, l


def _stream_fwd(q, k, v, key_bias, seed, p, sm_scale):
    o, m, l = _stream_fwd_impl(q, k, v, key_bias, seed, p, sm_scale)
    return o, (q, k, v, key_bias, seed, o, m, l)


def _stream_bwd(p, sm_scale, res, do):
    q, k, v, key_bias, seed, o, m, l = res
    B, H, T, dh = q.shape
    nq, nk = T // BQ, T // BK
    qb, kb, bias, ob, row = _stream_specs(B, H, T, dh)
    # delta term of the softmax jacobian: D_i = dO_i . O_i (lane-broadcast
    # to the residual layout)
    d = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    d = jnp.broadcast_to(d[..., None], (B, H, T, 128))
    seed_arg = seed.reshape(1).astype(jnp.int32)
    bias_arg = key_bias.astype(jnp.float32)[:, None, :]

    dq = pl.pallas_call(
        functools.partial(_sbwd_dq_kernel, p=p, sm_scale=sm_scale, H=H),
        grid=(B, H, nq, nk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            qb, kb, kb, bias, qb, row, row, row,
        ],
        out_specs=ob,
        out_shape=jax.ShapeDtypeStruct((B, H, T, dh), q.dtype),
        scratch_shapes=[pltpu.VMEM((BQ, dh), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(seed_arg, q, k, v, bias_arg, do, m, l, d)

    # dK/dV: key blocks outer, query blocks innermost (accumulated)
    qb2 = pl.BlockSpec(
        (1, 1, BQ, dh), lambda b, h, kj, qi: (b, h, qi, 0),
        memory_space=pltpu.VMEM,
    )
    kb2 = pl.BlockSpec(
        (1, 1, BK, dh), lambda b, h, kj, qi: (b, h, kj, 0),
        memory_space=pltpu.VMEM,
    )
    bias2 = pl.BlockSpec(
        (1, 1, BK), lambda b, h, kj, qi: (b, 0, kj), memory_space=pltpu.VMEM
    )
    row2 = pl.BlockSpec(
        (1, 1, BQ, 128), lambda b, h, kj, qi: (b, h, qi, 0),
        memory_space=pltpu.VMEM,
    )
    okv = pl.BlockSpec(
        (1, 1, BK, dh), lambda b, h, kj, qi: (b, h, kj, 0),
        memory_space=pltpu.VMEM,
    )
    shp = jax.ShapeDtypeStruct((B, H, T, dh), q.dtype)
    dk, dv = pl.pallas_call(
        functools.partial(_sbwd_dkv_kernel, p=p, sm_scale=sm_scale, H=H),
        grid=(B, H, nk, nq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            qb2, kb2, kb2, bias2, qb2, row2, row2, row2,
        ],
        out_specs=[okv, okv],
        out_shape=[shp, shp],
        scratch_shapes=[
            pltpu.VMEM((BK, dh), jnp.float32),
            pltpu.VMEM((BK, dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(seed_arg, q, k, v, bias_arg, do, m, l, d)

    import numpy as np

    d_bias = jnp.zeros_like(key_bias)
    d_seed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, d_bias, d_seed


attention_with_dropout_streaming.defvjp(_stream_fwd, _stream_bwd)


def streaming_supported(T: int, dh: int) -> bool:
    return not _interpret()


def attention_with_dropout_auto(q, k, v, key_bias, seed, p, sm_scale):
    """Dispatch: full-VMEM kernel when the padded length fits, else the
    streaming kernel; pads T/dh as needed and slices back."""
    B, H, T, dh = q.shape
    if supported(T, dh):
        return attention_with_dropout_padded(
            q, k, v, key_bias, seed, p, sm_scale
        )
    mult = max(BQ, BK)  # BQ is a BK multiple
    Tp = ((T + mult - 1) // mult) * mult
    dhp = _round_up_128(dh)
    pad4 = ((0, 0), (0, 0), (0, Tp - T), (0, dhp - dh))
    qp = jnp.pad(q, pad4)
    kp = jnp.pad(k, pad4)
    vp = jnp.pad(v, pad4)
    bias = jnp.pad(key_bias, ((0, 0), (0, Tp - T)), constant_values=NEG_INF)
    o = attention_with_dropout_streaming(qp, kp, vp, bias, seed, p, sm_scale)
    return o[:, :, :T, :dh]
