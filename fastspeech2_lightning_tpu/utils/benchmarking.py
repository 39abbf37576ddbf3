"""Honest TPU timing utilities.

Through a relay/tunnel runtime, ``jax.block_until_ready`` can return before
the device has actually executed the dispatched computation, which makes
naive async timing report physically impossible numbers. The discipline here
(mirrors the reference's benchmark semantics, fs2/cli/benchmark.py:48-80, but
with forced completion):

* the timed step threads a scalar ``carry`` through every call — the carry is
  ADDED to a real input and re-derived from the output, so call i+1 has a
  genuine data dependency on call i and the chain cannot be elided;
* each trial runs ``reps`` chained calls over several distinct device-resident
  batches, then fetches the final carry to host (``np.asarray``) — a forced
  device->host readback that cannot complete until the whole chain executed.
  One scalar fetch per trial amortizes relay RTT over ``reps`` calls;
* XLA's own cost analysis supplies analytic FLOPs so the implied MFU can be
  sanity-bounded: an implied MFU > 100% means the timing is broken, not fast.
"""

from __future__ import annotations

import time
from typing import Any, Callable

import numpy as np

# TPU v5e peak bf16 matmul throughput per chip; the MFU denominator.
V5E_PEAK_FLOPS = 197e12


def chainable(apply_fn: Callable[[Any, dict], Any], carry_key: str):
    """Wrap ``apply_fn(variables, batch) -> array`` into
    ``fn(variables, batch, carry) -> (out, new_carry)`` with a real data
    dependency through ``batch[carry_key]`` (must be a float array)."""
    import jax.numpy as jnp

    def fn(variables, batch, carry):
        batch = dict(batch)
        batch[carry_key] = batch[carry_key] + carry
        out = apply_fn(variables, batch)
        return out, jnp.sum(jnp.ravel(out)[:4]) * 1e-12

    return fn


def compiled_flops(jf, *args) -> float:
    """Analytic FLOPs per call from XLA's cost analysis (0.0 if unavailable)."""
    try:
        cost = jf.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def time_chained(
    jf,
    variables,
    staged_batches: list[dict],
    *,
    reps: int,
    trials: int = 5,
    warmup: int = 5,
) -> list[float]:
    """Run ``trials`` fully-synchronized chains of ``reps`` calls each.

    Returns per-trial seconds (total chain wall-clock including exactly one
    device->host scalar fetch). ``jf`` must have the ``chainable`` signature.
    """
    import jax.numpy as jnp

    zero = jnp.float32(0.0)
    n = len(staged_batches)
    carry = zero
    for i in range(warmup):
        _, carry = jf(variables, staged_batches[i % n], carry)
    np.asarray(carry)  # forced completion of warmup/compile

    times = []
    for _ in range(trials):
        carry = zero
        t0 = time.perf_counter()
        for i in range(reps):
            _, carry = jf(variables, staged_batches[i % n], carry)
        final = float(np.asarray(carry))  # device->host: forces the chain
        times.append(time.perf_counter() - t0)
        assert np.isfinite(final), "non-finite output in timed chain"
    return times


def time_pipelined(
    jf_scalar,
    variables,
    staged_batches: list[dict],
    *,
    reps: int,
    trials: int = 5,
    warmup: int = 5,
) -> list[float]:
    """Throughput timing: issue ``reps`` independent calls (cycling over the
    pre-staged device-resident batches), then force completion of EVERY call
    with one device->host fetch of a scalar that sums all per-call summaries.

    ``jf_scalar(variables, batch)`` must return a scalar derived from the
    call's full output (so no call can be elided). Unlike ``time_chained``,
    calls carry no data dependency on each other, so host dispatch overlaps
    device execution — this measures sustained serving throughput; the
    chained number is per-call latency. The final fetch depends on all
    ``reps`` outputs, so the device really executed every call before the
    clock stops.
    """
    import jax.numpy as jnp

    n = len(staged_batches)
    outs = [jf_scalar(variables, staged_batches[i % n]) for i in range(warmup)]
    np.asarray(sum(outs))  # compile + warmup, forced

    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        outs = [
            jf_scalar(variables, staged_batches[i % n]) for i in range(reps)
        ]
        total = float(np.asarray(jnp.sum(jnp.stack(outs))))
        times.append(time.perf_counter() - t0)
        assert np.isfinite(total), "non-finite output in timed pipeline"
    return times


def check_mfu(flops_per_call: float, sec_per_call: float) -> float:
    """Return implied MFU; raise if it exceeds 100% (impossible => broken)."""
    if flops_per_call <= 0 or sec_per_call <= 0:
        return 0.0
    mfu = flops_per_call / sec_per_call / V5E_PEAK_FLOPS
    if mfu > 1.0:
        raise SystemExit(
            f"BENCH INVALID: implied MFU {mfu * 100:.1f}% > 100% "
            f"({flops_per_call / 1e12:.2f} TFLOP/call at "
            f"{sec_per_call * 1e3:.3f} ms/call) — timing did not force real "
            "execution; refusing to report fiction."
        )
    return mfu
