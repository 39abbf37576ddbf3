"""Fused HiFiGAN multi-receptive-field (MRF) resblock stage as a Pallas kernel.

The reference hands mels to a torch HiFiGAN whose generator spends most of its
time in the per-upsample-stage resblock group (3 resblocks x 3 dilations x 2
convs + leaky_relu + residual adds + final average — ~40 HBM round trips per
stage when executed op-by-op). On TPU the late stages (C=128/64/32 at 64-256x
the mel frame rate) are HBM-bandwidth-bound *and* MXU-underutilized (channel
counts below the 128-lane MXU width). This kernel computes the whole stage

    y = mean_j RB_j(x),   RB_j: for i: x += conv_{k_j,1}(lrelu(conv_{k_j,d_i}(lrelu(x))))

in VMEM: x is read from HBM once per block and y written once; all 18 convs run
as tap-stacked im2col matmuls ([rows, K*C] x [K*C, C]) so the contraction dim
is K*C (>= 96 even at C=32), with intermediates never leaving VMEM.

MEASURED NEGATIVE RESULT (v5e, bf16, B=8 / 256 mel frames; device times from
profiler traces, best block_t=1024): C=128 stage 4.15 ms vs XLA 3.87; C=64
6.20 vs 4.23; C=32 10.56 vs 9.51. The memory-bound hypothesis was wrong — XLA
already fuses the elementwise ops into its convs, and the fused kernel's costs
(tap roll-concats on the VPU, halo recompute, and N=C<=128 MXU lane waste that
a VMEM-resident schedule cannot fix either) exceed the HBM traffic it saves.
block_t<=256 is catastrophically slow (~70 ms, Mosaic pipelining collapse) and
block_t>=2048 spills VMEM. Kept opt-in (`fused=True` in make_vocoder_fn) as a
correctness-tested record so the dead end isn't re-walked; default stays on
XLA's schedule. Mirrors the round-2 decoder-fusion negative result (TODO.md
"Performance").

Blocking: grid (B, T/block_t); each block loads x with a halo of H rows on each
side. Convs are computed full-buffer with `pltpu.roll` shifts — wrap-around
garbage stays inside the halo margin because the stage's cumulative one-sided
receptive field is max_j 6*(k_j-1) = 60 <= H = 64 for HiFiGAN V1 kernels
(3, 7, 11) with dilations (1, 3, 5).

Inference-only (the vocoder is never trained here), so no custom VJP.

Reference semantics: torch HiFiGAN ResBlock1 (upstream everyvoice hfgl;
handoff at /root/reference/fs2/prediction_writing_callback.py:656-681).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1

HALO = 64  # >= max_j 6*(k_j-1) = 60 for V1 kernels; multiple of bf16 sublanes


def _leaky(x):
    # max/min formulation: bf16 compare+select has no Mosaic lowering
    slope = jnp.asarray(LRELU_SLOPE, x.dtype)
    return jnp.maximum(x, 0) + slope * jnp.minimum(x, 0)


def _conv_full_buffer(xb, w_stacked, bias, k: int, dilation: int):
    """SAME conv over the full [R, C] buffer via tap-stacked im2col.

    Output row r uses input rows r + (t - (k-1)//2) * dilation; each tap is a
    circular roll, so rows within (k-1)//2*dilation of the buffer edge see
    wrapped values — the caller keeps a halo margin larger than the chain's
    cumulative receptive field so the central region stays exact.
    """
    half = (k - 1) // 2
    rows = xb.shape[0]
    taps = []
    for t in range(k):
        off = (t - half) * dilation
        if off == 0:
            taps.append(xb)
        else:
            # circular shift by static slices (pltpu.roll lowers to
            # tpu.dynamic_rotate, which has no bf16 lowering)
            s = off % rows
            taps.append(jnp.concatenate([xb[s:], xb[:s]], axis=0))
    xcat = jnp.concatenate(taps, axis=-1)  # [R, k*C]
    out = jax.lax.dot_general(
        xcat,
        w_stacked,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (out + bias.astype(jnp.float32)).astype(xb.dtype)


def _mrf_kernel(
    x_ref,
    *refs,
    kernel_sizes: Tuple[int, ...],
    dilation_sizes: Tuple[Tuple[int, ...], ...],
    block_t: int,
    t_true: int,
):
    o_ref = refs[-1]
    wb = refs[:-1]
    xb = x_ref[0, 0]  # [block_t + 2H, C]
    # SAME-conv semantics zero-pads every conv's own input at the sequence
    # edges, so intermediates must be exactly zero outside [0, t_true) — a
    # conv's bias would otherwise leak into the halo near the boundaries.
    rows = jax.lax.broadcasted_iota(jnp.int32, (xb.shape[0], 1), 0)
    gpos = rows + (pl.program_id(1) * block_t - HALO)
    # multiplicative mask: bf16 select has no reliable Mosaic lowering
    in_range = jnp.logical_and(gpos >= 0, gpos < t_true).astype(xb.dtype)
    n = 0
    acc = None
    for j, (k, dils) in enumerate(zip(kernel_sizes, dilation_sizes)):
        s = xb
        for d in dils:
            w1, b1, w2, b2 = wb[n], wb[n + 1], wb[n + 2], wb[n + 3]
            n += 4
            t = _conv_full_buffer(_leaky(s), w1[:], b1[:], k, d)
            t = t * in_range
            t = _conv_full_buffer(_leaky(t), w2[:], b2[:], k, 1)
            t = t * in_range
            s = s + t
        acc = s if acc is None else acc + s
    y = acc * jnp.asarray(1.0 / len(kernel_sizes), dtype=xb.dtype)
    o_ref[0, 0] = y[HALO : HALO + block_t]


def _frame_overlapping(x, block_t: int):
    """[B, T, C] -> [B, nT, block_t + 2H, C] overlapping windows (stride
    block_t, halo H each side, zero-padded at the sequence edges)."""
    B, T, C = x.shape
    nt = T // block_t
    xp = jnp.pad(x, ((0, 0), (HALO, HALO), (0, 0)))
    central = x.reshape(B, nt, block_t, C)
    left = xp[:, :T].reshape(B, nt, block_t, C)[:, :, :HALO]
    right = xp[:, 2 * HALO : 2 * HALO + T].reshape(B, nt, block_t, C)[
        :, :, block_t - HALO :
    ]
    return jnp.concatenate([left, central, right], axis=2)


def prepare_stage_weights(
    stage_params: Sequence[Dict[str, Any]],
    kernel_sizes: Sequence[int],
    dilation_sizes: Sequence[Sequence[int]],
    dtype,
) -> List[jnp.ndarray]:
    """Flatten one upsample stage's resblock params (our [K, Cin, Cout]
    conv layout) into the kernel's tap-stacked order:
    for each resblock j, for each dilation i: W1 [(k*C), C], b1 [1, C],
    W2 [(k*C), C], b2 [1, C]."""
    flat: List[jnp.ndarray] = []
    for j, (k, dils) in enumerate(zip(kernel_sizes, dilation_sizes)):
        p = stage_params[j]
        for i in range(len(dils)):
            for name in (f"convs1_{i}", f"convs2_{i}"):
                w = p[f"{name}_w"]  # [k, C, C]
                b = p[f"{name}_b"]  # [C]
                kk, cin, cout = w.shape
                flat.append(jnp.asarray(w).reshape(kk * cin, cout).astype(dtype))
                flat.append(jnp.asarray(b).reshape(1, cout).astype(dtype))
    return flat


@functools.partial(
    jax.jit,
    static_argnames=("kernel_sizes", "dilation_sizes", "block_t", "interpret"),
)
def fused_mrf_stage(
    x: jnp.ndarray,
    flat_weights: Sequence[jnp.ndarray],
    kernel_sizes: Tuple[int, ...] = (3, 7, 11),
    dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3,
    block_t: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused resblock-group stage: x [B, T, C] -> mean_j RB_j(x) [B, T, C]."""
    B, T, C = x.shape
    pad_t = (-T) % block_t
    if pad_t:
        x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
    Tp = T + pad_t
    nt = Tp // block_t
    frames = _frame_overlapping(x, block_t)

    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat_weights]
    out = pl.pallas_call(
        functools.partial(
            _mrf_kernel,
            kernel_sizes=tuple(kernel_sizes),
            dilation_sizes=tuple(tuple(d) for d in dilation_sizes),
            block_t=block_t,
            t_true=T,
        ),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_t + 2 * HALO, C),
                lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        + wspecs,
        out_specs=pl.BlockSpec(
            (1, 1, block_t, C), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, nt, block_t, C), x.dtype),
        interpret=interpret,
    )(frames, *flat_weights)
    out = out.reshape(B, Tp, C)
    return out[:, :T] if pad_t else out


def mrf_stage_supported(C: int, kernel_sizes, dilation_sizes) -> bool:
    """The fused kernel targets the memory-bound low-channel stages; the
    C=256 stage's weights (126*C^2) don't fit VMEM and its matmuls are
    already MXU-shaped, so XLA keeps it."""
    if C > 128:
        return False
    # halo must cover the cumulative receptive field of the deepest chain
    worst = max(
        sum((k - 1) // 2 * d + (k - 1) // 2 for d in dils)
        for k, dils in zip(kernel_sizes, dilation_sizes)
    )
    return worst <= HALO


def _np_reference_stage(x, stage_params, kernel_sizes, dilation_sizes):
    """NumPy golden for tests: the unfused resblock group."""

    def conv(a, w, b, d):
        k = w.shape[0]
        pad = (k - 1) * d // 2
        B, T, Cin = a.shape
        ap = np.pad(a, ((0, 0), (pad, (k - 1) * d - pad), (0, 0)))
        out = np.zeros((B, T, w.shape[2]), np.float64)
        for t in range(k):
            out += ap[:, t * d : t * d + T] @ w[t]
        return out + b

    def lrelu(a):
        return np.where(a > 0, a, a * LRELU_SLOPE)

    acc = None
    for j, (k, dils) in enumerate(zip(kernel_sizes, dilation_sizes)):
        p = stage_params[j]
        s = np.asarray(x, np.float64)
        for i, d in enumerate(dils):
            t = conv(
                lrelu(s),
                np.asarray(p[f"convs1_{i}_w"], np.float64),
                np.asarray(p[f"convs1_{i}_b"], np.float64),
                d,
            )
            t = conv(
                lrelu(t),
                np.asarray(p[f"convs2_{i}_w"], np.float64),
                np.asarray(p[f"convs2_{i}_b"], np.float64),
                1,
            )
            s = s + t
        acc = s if acc is None else acc + s
    return acc / len(kernel_sizes)
