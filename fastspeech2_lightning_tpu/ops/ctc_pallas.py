"""Pallas TPU kernel for the CTC banded log-sum-exp recurrence.

Both CTC passes are the same shape of computation over blank-interleaved
states s = 0..2L:

  alpha_t(s) = emis_t(s) + lse(alpha_{t-1}(s), alpha_{t-1}(s-1),
                               [s odd] alpha_{t-1}(s-2))
  beta_t(s)  = lse(w(s), w(s+1), [s odd] w(s+2)),  w = beta_{t+1} + emis_{t+1}

i.e. a row recurrence with a 3-banded shift (right for alpha, left for beta)
and an odd-destination mask on the skip lane. This kernel runs it with a
chunked grid: each grid step streams CHUNK emission rows [CHUNK, B, S] through
VMEM (Pallas double-buffers the DMA), carrying the live row in a VMEM scratch
that persists across sequential grid steps. Emissions are pre-gathered to
state space ([B, T, S]) outside the kernel so the inner loop is pure VPU work.

The lax.scan implementation in ops/ctc.py is the fallback and golden
reference; this kernel is numerically identical up to f32 lse rounding."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e15
CHUNK = 128
BLK = 16  # rows per blocked VMEM load/store inside a chunk (divides CHUNK)


def _make_kernel(chunk: int, left: bool, add_emis_first: bool):
    """Kernel factory.

    add_emis_first=True  -> alpha form: row = emis + lse3(shifted prev)
    add_emis_first=False -> beta form:  w = prev + emis; row = lse3(shifted w)
    left=False shifts right (alpha), left=True shifts left (beta)."""

    def kernel(emis_ref, out_ref, carry):
        C, B, S = emis_ref.shape
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, S), dimension=1)
        odd = lane % 2 == 1

        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            if add_emis_first:
                # alpha_{-1}: only state 0 reachable (the lse then spreads it
                # to states {0, 1} for alpha_0)
                carry[:] = jnp.where(lane == 0, 0.0, NEG_INF)
            else:
                # beta seed rows are supplied by the caller via the first
                # emission row (w_{T-1} = beta_{T-1} + emis_{T-1})
                carry[:] = jnp.zeros((B, S), jnp.float32)

        def lse3(a, b, d):
            m = jnp.maximum(jnp.maximum(a, b), d)
            out = m + jnp.log(
                jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(d - m)
            )
            return jnp.where(m > 0.5 * NEG_INF, out, NEG_INF)

        def step(emis_row, prev):
            if add_emis_first:
                w = prev
            else:
                w = prev + emis_row
            if left:
                s1 = pltpu.roll(w, S - 1, 1)
                s1 = jnp.where(lane == S - 1, NEG_INF, s1)
                s2 = pltpu.roll(w, S - 2, 1)
                s2 = jnp.where(lane >= S - 2, NEG_INF, s2)
            else:
                s1 = pltpu.roll(w, 1, 1)
                s1 = jnp.where(lane == 0, NEG_INF, s1)
                s2 = pltpu.roll(w, 2, 1)
                s2 = jnp.where(lane <= 1, NEG_INF, s2)
            s2 = jnp.where(odd, s2, NEG_INF)  # skip lane: odd destinations only
            row = lse3(w, s1, s2)
            if add_emis_first:
                row = jnp.maximum(row + emis_row, NEG_INF)
            return row

        # rows go through ONE dynamic-indexed VMEM load + ONE store per BLK
        # block; per-row dynamic indexing leaves the loop bookkeeping, not
        # the lse math, as the bottleneck (same finding as ops/mas_pallas.py)
        def blk_step(kb, prev):
            base = kb * BLK
            emis_blk = emis_ref[pl.ds(base, BLK)]  # [BLK, B, S]
            rows = []
            for j in range(BLK):
                prev = step(emis_blk[j], prev)
                rows.append(prev)
            out_ref[pl.ds(base, BLK)] = jnp.stack(rows)
            return prev

        carry[:] = jax.lax.fori_loop(0, C // BLK, blk_step, carry[:])

    # name the kernel so profiler traces attribute it readably
    kernel.__name__ = (
        f"ctc_banded_lse_{'beta' if left else 'alpha'}"
    )
    return kernel


def _pad_states(x, S_pad):
    B, T, S = x.shape
    if S == S_pad:
        return x
    pad = jnp.full((B, T, S_pad - S), NEG_INF, x.dtype)
    return jnp.concatenate([x, pad], axis=-1)


@functools.partial(
    jax.jit, static_argnames=("left", "add_emis_first", "interpret")
)
def banded_lse_scan_pallas(
    emis: jnp.ndarray,  # [B, T, S] state-space emissions (or w-increments)
    left: bool = False,
    add_emis_first: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, T, S] recurrence outputs (alpha or beta rows, unpadded)."""
    B, T, S = emis.shape
    S_pad = max(128, -(-S // 128) * 128)
    # chunk sizing: in + out blocks are each double-buffered across grid
    # steps, so ~5 chunk-blocks must fit the scoped-VMEM budget; shrink the
    # chunk (to a BLK multiple) for wide batches instead of OOMing
    budget = 48 << 20
    chunk = min(CHUNK, max(BLK, (budget // (5 * B * S_pad * 4)) // BLK * BLK))
    T_pad = -(-T // chunk) * chunk
    x = _pad_states(emis.astype(jnp.float32), S_pad)
    if T_pad != T:
        x = jnp.concatenate(
            [x, jnp.full((B, T_pad - T, S_pad), NEG_INF, jnp.float32)], axis=1
        )
    x = jnp.swapaxes(x, 0, 1)  # [T_pad, B, S_pad]

    out = pl.pallas_call(
        _make_kernel(chunk, left, add_emis_first),
        grid=(T_pad // chunk,),
        in_specs=[
            pl.BlockSpec(
                (chunk, B, S_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (chunk, B, S_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T_pad, B, S_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, S_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=5 * chunk * B * S_pad * 4 + (2 << 20),
        ),
        interpret=interpret,
    )(x)
    return jnp.swapaxes(out[:T, :, :S], 0, 1)  # [B, T, S]
