"""Hardware validation of every Pallas kernel at HEAD, on the real chip.

The pytest suite pins itself to the CPU backend (tests/conftest.py), so the
compiled-kernel paths are exercised there only in interpret mode. This script
runs the same golden comparisons on the default (axon/TPU) backend:

  * MAS width-1 binarization (ops/mas_pallas) vs the NumPy golden — bit exact
  * CTC forward-sum value + gradient: Pallas alpha/beta kernels vs the pure
    lax.scan path, both executed on the chip
  * attention_with_dropout_padded (p=0) vs a masked-softmax einsum over a
    (T, dh) matrix incl. the padded dh=64 / non-128-multiple-T cases, fwd+grad
  * attention_with_dropout_streaming (T=2048) vs einsum, fwd+grad
  * dropout keep-rate sanity at p=0.3 for both kernels

Prints one JSON line per check and exits non-zero on any failure.
Run serially on an otherwise idle chip (the tunnel is single-tenant).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

try:  # persistent compile cache: repeat runs skip relay compiles
    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parents[1] / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass

FAILURES: list[str] = []


def report(name: str, ok: bool, **extra):
    line = {"check": name, "ok": bool(ok)}
    line.update(extra)
    print(json.dumps(line), flush=True)
    if not ok:
        FAILURES.append(name)


def check_mas():
    from fastspeech2_lightning_tpu.ops.mas import NEG_INF, b_mas_numpy
    from fastspeech2_lightning_tpu.ops.mas_pallas import mas_width1_pallas

    rng = np.random.default_rng(0)
    B, T, L = 8, 1024, 128
    la = rng.standard_normal((B, T, L)).astype(np.float32)
    in_lens = rng.integers(8, L + 1, size=B).astype(np.int32)
    out_lens = rng.integers(64, T + 1, size=B).astype(np.int32)
    in_lens[0], out_lens[0] = L, T  # one full-size item
    # mask invalid cells the way the caller does (ops/mas.py:108-112)
    j = np.arange(L)[None, None, :]
    i = np.arange(T)[None, :, None]
    valid = (j < in_lens[:, None, None]) & (i < out_lens[:, None, None])
    la_m = np.where(valid, np.maximum(la, NEG_INF), NEG_INF).astype(np.float32)

    t0 = time.perf_counter()
    hard = np.asarray(
        jax.jit(mas_width1_pallas)(
            jnp.asarray(la_m), jnp.asarray(in_lens), jnp.asarray(out_lens)
        )
    )
    wall = time.perf_counter() - t0
    golden = b_mas_numpy(la_m, in_lens, out_lens)
    ok = np.array_equal(hard, golden)
    report("mas_pallas_bit_exact", ok, shape=[B, T, L],
           compile_plus_run_s=round(wall, 2),
           platform=jax.devices()[0].platform)


def check_ctc():
    import fastspeech2_lightning_tpu.ops.ctc as ctc_mod

    rng = np.random.default_rng(1)
    B, T, L = 8, 1024, 128
    logits = rng.standard_normal((B, T, L + 1)).astype(np.float32)
    in_lens = jnp.asarray(rng.integers(8, L + 1, size=B).astype(np.int32))
    out_lens = jnp.asarray(rng.integers(64, T + 1, size=B).astype(np.int32))
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)

    def loss(lp):
        return jnp.sum(ctc_mod.ctc_forward_sum(lp, in_lens, out_lens))

    assert ctc_mod._use_pallas(B, T, 2 * L + 1), "pallas gate unexpectedly off"
    v_pal, g_pal = jax.jit(jax.value_and_grad(loss))(lp)
    v_pal, g_pal = np.asarray(v_pal), np.asarray(g_pal)

    orig = ctc_mod._use_pallas
    ctc_mod._use_pallas = lambda *a, **k: False
    try:
        v_ref, g_ref = jax.jit(jax.value_and_grad(loss))(lp)
        v_ref, g_ref = np.asarray(v_ref), np.asarray(g_ref)
    finally:
        ctc_mod._use_pallas = orig

    val_rel = abs(v_pal - v_ref) / max(abs(v_ref), 1e-9)
    gmax = np.abs(g_pal - g_ref).max()
    gscale = np.abs(g_ref).max()
    ok = val_rel < 1e-5 and gmax < 1e-4 * max(gscale, 1.0)
    report("ctc_pallas_vs_scan_on_device", ok,
           value_rel=float(val_rel), grad_max_abs=float(gmax),
           grad_scale=float(gscale))


def _einsum_attention(q, k, v, key_bias, sm_scale):
    s = jnp.einsum("bhtd,bhsd->bhts", q, k) * sm_scale
    s = s + key_bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", p, v)


def check_attention(T, dh, streaming=False):
    from fastspeech2_lightning_tpu.ops import attention_dropout as ad

    fn = (ad.attention_with_dropout_streaming if streaming
          else ad.attention_with_dropout_padded)
    B, H = 2, 4 if dh == 64 else 2
    rng = np.random.default_rng(2)
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, T, dh)).astype(np.float32) * 0.3)
               for _ in range(3))
    lens = np.full((B,), T, np.int32)
    lens[1] = max(T - 37, 1)
    bias = jnp.asarray(
        np.where(np.arange(T)[None, :] < lens[:, None], 0.0, ad.NEG_INF
                 ).astype(np.float32))
    seed = jnp.asarray(7, jnp.int32)
    sm = 1.0 / np.sqrt(dh)

    def f(q, k, v):
        return jnp.sum(fn(q, k, v, bias, seed, 0.0, sm) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(_einsum_attention(q, k, v, bias, sm) ** 2)

    o = np.asarray(jax.jit(lambda q, k, v: fn(q, k, v, bias, seed, 0.0, sm))(q, k, v))
    o_ref = np.asarray(jax.jit(
        lambda q, k, v: _einsum_attention(q, k, v, bias, sm))(q, k, v))
    fwd_max = np.abs(o - o_ref).max()

    def _rel(a, b):
        return max(
            float(np.abs(np.asarray(x) - np.asarray(y)).max()
                  / max(np.abs(np.asarray(y)).max(), 1e-9))
            for x, y in zip(a, b)
        )

    g = jax.jit(jax.grad(f, argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.jit(jax.grad(f_ref, argnums=(0, 1, 2)))(q, k, v)
    # noise floor: the same einsum at highest matmul precision — on TPU the
    # default-precision reference is itself bf16-rounded, so the kernel only
    # has to sit within a small multiple of that rounding distance
    with jax.default_matmul_precision("highest"):
        g_hp = jax.jit(jax.grad(f_ref, argnums=(0, 1, 2)))(q, k, v)
    grad_rel = _rel(g, g_ref)
    kernel_vs_hp = _rel(g, g_hp)
    ref_vs_hp = _rel(g_ref, g_hp)
    noise_floor = max(ref_vs_hp, 1e-6)
    # block-order numerics: streaming accumulates in a different order
    ftol = 3e-3 if streaming else 1e-4
    ok = fwd_max < ftol and kernel_vs_hp < 8.0 * noise_floor
    # dropout keep-rate sanity at p=0.3 on valid rows of item 0
    od = np.asarray(jax.jit(
        lambda q, k, v: fn(q, k, v, bias, seed, 0.3, sm))(q, k, v))
    changed = np.abs(od[0] - o[0]).max() > 1e-6
    report(("attn_streaming" if streaming else "attn_padded") + f"_T{T}_dh{dh}",
           ok and changed, fwd_max_abs=float(fwd_max),
           grad_rel=float(grad_rel), kernel_vs_highest=float(kernel_vs_hp),
           einsum_vs_highest=float(ref_vs_hp), dropout_active=bool(changed))


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    check_mas()
    check_ctc()
    for T, dh in [(512, 64), (992, 128), (1024, 128)]:
        check_attention(T, dh)
    check_attention(2048, 128, streaming=True)
    ok = not FAILURES
    print(json.dumps({"result": "PASS" if ok else "FAIL",
                      "failures": FAILURES}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
