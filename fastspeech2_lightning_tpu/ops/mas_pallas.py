"""Pallas TPU kernel for width-1 monotonic alignment search.

The lax.scan MAS (ops/mas.py) pays XLA loop machinery per mel frame. This
kernel runs the whole DP inside one Pallas program with everything resident
in VMEM:

 - layout [T, B, L]: each DP row is one (sublane=B, lane=L) tile; the
   forward recurrence is a single in-VMEM vector op per frame
 - the output buffer doubles as the DP table: the backtrack overwrites row i
   with the one-hot path row after reading row i-1 (row i is never read again)
 - the backtrack carries the current text position as a one-hot vector, so
   the move decision is two masked row-reductions and a lane roll — no
   gathers, no scalar extraction

Used automatically by mas_width1_batched when one B_BLOCK-item DP table
fits VMEM (~2 × T·B_BLOCK·L·4 bytes ≤ 10 MB); larger batches run as
sequential grid steps of B_BLOCK items. The scan implementation is the
fallback and golden reference."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
UNROLL = 32  # DP rows per blocked load/store
B_BLOCK = 8  # batch items per grid step (one DP table in VMEM at a time)


def _mas_kernel(la_ref, h_init_ref, out_lens_ref, work_ref):
    """la: [T, B, L] masked log-attention; h_init: [B, L] one-hot of
    in_len-1; out_lens: [B, 1] int32; work (output): [T, B, L] — DP table
    during the forward pass, one-hot hard alignment on exit.

    Each DP row is one (B, L) vector op, so the loop bookkeeping — not the
    math — sets the kernel's speed. Rows are therefore processed in blocks
    of UNROLL with ONE dynamic-indexed VMEM load and ONE store per block
    (per-row dynamic indexing measured ~3x slower end to end)."""
    T, B, L = la_ref.shape
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (B, L), dimension=1)

    # ---- forward DP ----
    row0 = la_ref[0] + jnp.where(lane_ids == 0, 0.0, NEG_INF)
    work_ref[0] = row0

    def fwd_blk(k, row):
        base = 1 + k * UNROLL
        la_blk = la_ref[pl.ds(base, UNROLL)]  # [UNROLL, B, L]
        rows = []
        for j in range(UNROLL):
            shifted = pltpu.roll(row, 1, 1)
            shifted = jnp.where(lane_ids == 0, NEG_INF, shifted)
            row = la_blk[j] + jnp.maximum(row, shifted)
            row = jnp.maximum(row, NEG_INF)
            rows.append(row)
        work_ref[pl.ds(base, UNROLL)] = jnp.stack(rows)
        return row

    jax.lax.fori_loop(0, (T - 1) // UNROLL, fwd_blk, row0)

    # ---- backtrack (overwrites work rows top-down) ----
    out_lens = out_lens_ref[:]  # [B, 1] int32

    def bwd_blk(k, h):
        base = T - 1 - k * UNROLL
        # rows base-UNROLL .. base-1, read before the overlapping writes
        prev_blk = work_ref[pl.ds(base - UNROLL, UNROLL)]
        outs = []
        for j in range(UNROLL):
            i = base - j
            active = (i < out_lens).astype(jnp.float32)  # [B, 1]
            prev = prev_blk[UNROLL - 1 - j]  # DP row i-1
            stay = jnp.sum(prev * h, axis=1, keepdims=True)
            h_left = pltpu.roll(h, L - 1, 1)  # circular left-by-1
            h_left = jnp.where(lane_ids == L - 1, 0.0, h_left)
            left = jnp.sum(prev * h_left, axis=1, keepdims=True)
            at_zero = h[:, :1]
            outs.append(h * active)  # hard-alignment row i
            dec = (active > 0.5) & (left >= stay) & (at_zero < 0.5)
            h = jnp.where(dec, h_left, h)
        # outs[j] is row base-j -> stack ascending rows base-UNROLL+1 .. base
        work_ref[pl.ds(base - UNROLL + 1, UNROLL)] = jnp.stack(outs[::-1])
        return h

    h = jax.lax.fori_loop(0, (T - 1) // UNROLL, bwd_blk, h_init_ref[:])
    work_ref[0] = h * (0 < out_lens).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mas_width1_pallas(
    log_attn: jnp.ndarray,  # [B, T, L], already masked to the valid region
    in_lens: jnp.ndarray,
    out_lens: jnp.ndarray,
    interpret: bool = False,
):
    """[B, T, L] hard alignment via the Pallas kernel (pre-masked input).

    Batches larger than B_BLOCK are processed as sequential grid steps of
    B_BLOCK items each, so VMEM holds one block's DP table at a time."""
    B, T, L = log_attn.shape
    # pad T so the kernel's blocked loops cover exactly T-1 rows; padded
    # rows sit beyond every out_len (forward junk, backtrack inactive)
    T_pad = T + ((-(T - 1)) % UNROLL)
    la_btl = log_attn.astype(jnp.float32)
    if T_pad != T:
        la_btl = jnp.concatenate(
            [la_btl, jnp.full((B, T_pad - T, L), NEG_INF, jnp.float32)], axis=1
        )
    # pad B to a block multiple; padded entries have out_len 0 (backtrack
    # inactive, output row zeroed) and in_len 1 (valid one-hot seed)
    B_pad = -(-B // B_BLOCK) * B_BLOCK
    if B_pad != B:
        la_btl = jnp.concatenate(
            [
                la_btl,
                jnp.full((B_pad - B, T_pad, L), NEG_INF, jnp.float32),
            ],
            axis=0,
        )
        in_lens = jnp.concatenate(
            [in_lens, jnp.ones((B_pad - B,), in_lens.dtype)]
        )
        out_lens = jnp.concatenate(
            [out_lens, jnp.zeros((B_pad - B,), out_lens.dtype)]
        )
    la = jnp.swapaxes(la_btl, 0, 1)  # [T_pad, B_pad, L]
    h_init = jax.nn.one_hot(in_lens - 1, L, dtype=jnp.float32)
    out_lens_col = out_lens.astype(jnp.int32)[:, None]

    hard_tbl = pl.pallas_call(
        _mas_kernel,
        grid=(B_pad // B_BLOCK,),
        out_shape=jax.ShapeDtypeStruct((T_pad, B_pad, L), jnp.float32),
        in_specs=[
            pl.BlockSpec(
                (T_pad, B_BLOCK, L), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (B_BLOCK, L), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (B_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (T_pad, B_BLOCK, L), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            # batch blocks are independent DPs: declare the grid parallel so
            # megacore parts can split it across TensorCores. Measured
            # NEUTRAL on this chip (single-core v5e-class: 1.22 ms/step
            # before and after, bit-identical trace) — kept as correct
            # semantics metadata for multi-core parts
            dimension_semantics=("parallel",),
            # in + out blocks, each double-buffered across grid steps,
            # plus slack for the carried row registers; sized on the
            # HARDWARE-TILED block (lanes pad L up to 128, sublanes pad
            # B_BLOCK up to 8) — sizing on the logical L under-budgeted
            # small text buckets (e.g. L=32) and the compile failed with
            # a scoped-vmem stack OOM
            vmem_limit_bytes=int(5 * T_pad * B_BLOCK * _lane_pad(L) * 4)
            + (2 << 20),
        ),
        interpret=interpret,
    )(la, h_init, out_lens_col)
    return jnp.swapaxes(hard_tbl[:T], 0, 1)[:B]  # [B, T, L]


def _lane_pad(L: int) -> int:
    """Lanes the hardware actually allocates for a length-L minor dim."""
    return -(-L // 128) * 128


def fits_vmem(B: int, T: int, L: int, budget_bytes: int = 28 * 2**20) -> bool:
    """Per-grid-step VMEM check, mirroring the kernel's ACTUAL request
    (vmem_limit_bytes = 5 * T_pad * B_BLOCK * lane_pad(L) * 4 + 2 MB) so the
    gate and the allocation agree; a shape passing here but rejected by
    Mosaic still degrades to the scan path via the caller's try/except."""
    t_pad = T + ((-(T - 1)) % UNROLL)  # the kernel's own T padding
    return (
        5 * t_pad * B_BLOCK * _lane_pad(L) * 4 + (2 << 20) <= budget_bytes
    )
