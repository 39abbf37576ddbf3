"""Tests for ops/attention_dropout.py (in-kernel attention-prob dropout).

p=0 runs everywhere (Pallas interpret mode off-TPU) and must match the
masked-softmax einsum reference; p>0 paths need the TPU PRNG primitives, so
they only run on a TPU backend (covered there by the hardware validation in
PARITY.md and exercised via the training path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastspeech2_lightning_tpu.ops.attention_dropout import (
    NEG_INF,
    attention_with_dropout,
    supported,
)

B, H, T, DH = 2, 2, 256, 128
SM = float(1.0 / np.sqrt(DH))


def _inputs(dtype=jnp.float32):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, T, DH)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, T, DH)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, T, DH)).astype(np.float32))
    lens = np.array([T, T - 64])
    key_bias = jnp.asarray(
        np.where(np.arange(T)[None, :] < lens[:, None], 0.0, NEG_INF).astype(
            np.float32
        )
    )
    return (
        q.astype(dtype), k.astype(dtype), v.astype(dtype), key_bias,
        jnp.asarray([1234], jnp.int32),
    )


def _reference(q, k, v, key_bias):
    s = (
        jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        * SM
    )
    s = s + key_bias[:, None, None, :]
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd",
        w.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


def test_p0_matches_masked_softmax_attention():
    q, k, v, key_bias, seed = _inputs()
    o = attention_with_dropout(q, k, v, key_bias, seed, 0.0, SM)
    r = _reference(q, k, v, key_bias)
    np.testing.assert_allclose(
        np.asarray(o), np.asarray(r), atol=5e-3, rtol=5e-3
    )


def test_p0_gradients_match_reference():
    q, k, v, key_bias, seed = _inputs()

    def loss_k(q, k, v):
        return jnp.sum(
            attention_with_dropout(q, k, v, key_bias, seed, 0.0, SM) ** 2
        )

    def loss_r(q, k, v):
        return jnp.sum(_reference(q, k, v, key_bias) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-3
        )


@pytest.mark.skipif(
    not supported(T, DH), reason="needs the TPU PRNG primitives"
)
def test_dropout_deterministic_per_seed_and_seed_sensitive():
    q, k, v, key_bias, seed = _inputs(jnp.bfloat16)
    o1 = attention_with_dropout(q, k, v, key_bias, seed, 0.5, SM)
    o2 = attention_with_dropout(q, k, v, key_bias, seed, 0.5, SM)
    o3 = attention_with_dropout(
        q, k, v, key_bias, jnp.asarray([999], jnp.int32), 0.5, SM
    )
    assert bool(jnp.all(o1 == o2))
    assert bool(jnp.any(o1 != o3))
    g = jax.grad(
        lambda q: jnp.sum(
            attention_with_dropout(q, k, v, key_bias, seed, 0.5, SM).astype(
                jnp.float32
            )
            ** 2
        )
    )(q)
    assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))


@pytest.mark.parametrize(
    "t,dh",
    [(200, 64), (256, 64), (200, 128), (96, 32), (512, 64)],
)
def test_padded_wrapper_matches_reference_on_odd_shapes(t, dh):
    """attention_with_dropout_padded must equal the einsum reference for
    ANY (T, dh) — real training batches pad mel to 32-multiples and 4-head
    d=256 configs have dh=64, neither of which is 128-aligned."""
    from fastspeech2_lightning_tpu.ops.attention_dropout import (
        attention_with_dropout_padded,
    )

    sm = float(1.0 / np.sqrt(dh))
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((2, 2, t, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 2, t, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 2, t, dh)).astype(np.float32))
    lens = np.array([t, max(t - 37, 1)])
    key_bias = jnp.asarray(
        np.where(np.arange(t)[None, :] < lens[:, None], 0.0, NEG_INF).astype(
            np.float32
        )
    )
    seed = jnp.asarray([5], jnp.int32)

    def ref(q, k, v):
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * sm + key_bias[:, None, None, :]
        w = jax.nn.softmax(s, axis=-1)
        return jnp.einsum(
            "bhqk,bhkd->bhqd", w.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)

    o = attention_with_dropout_padded(q, k, v, key_bias, seed, 0.0, sm)
    assert o.shape == (2, 2, t, dh)
    np.testing.assert_allclose(
        np.asarray(o), np.asarray(ref(q, k, v)), atol=5e-3, rtol=5e-3
    )

    gk = jax.grad(
        lambda q, k, v: jnp.sum(
            attention_with_dropout_padded(q, k, v, key_bias, seed, 0.0, sm)
            ** 2
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    gr = jax.grad(
        lambda q, k, v: jnp.sum(ref(q, k, v) ** 2), argnums=(0, 1, 2)
    )(q, k, v)
    for a, b in zip(gk, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-3
        )


def test_supported_covers_unaligned_shapes():
    assert supported(992, 64) == supported(1024, 128)  # padding handles both
    assert not supported(2048, 128)  # streaming variant not built yet


@pytest.mark.parametrize("t,dh", [(1024, 128), (2048, 64)])
def test_streaming_kernel_matches_reference_p0(t, dh):
    """Flash-style streaming kernel (T beyond the full-VMEM bound) must
    equal the einsum reference at p=0, forward and gradients. Runs in
    interpret mode off-TPU."""
    from fastspeech2_lightning_tpu.ops.attention_dropout import (
        attention_with_dropout_streaming,
    )

    sm = float(1.0 / np.sqrt(dh))
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((1, 2, t, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2, t, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, t, dh)).astype(np.float32))
    lens = np.array([t - 100])
    key_bias = jnp.asarray(
        np.where(np.arange(t)[None, :] < lens[:, None], 0.0, NEG_INF).astype(
            np.float32
        )
    )
    seed = jnp.asarray([11], jnp.int32)

    def ref(q, k, v):
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * sm + key_bias[:, None, None, :]
        w = jax.nn.softmax(s, axis=-1)
        return jnp.einsum(
            "bhqk,bhkd->bhqd", w.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)

    o = attention_with_dropout_streaming(q, k, v, key_bias, seed, 0.0, sm)
    np.testing.assert_allclose(
        np.asarray(o), np.asarray(ref(q, k, v)), atol=5e-3, rtol=5e-3
    )

    gk = jax.grad(
        lambda q, k, v: jnp.sum(
            attention_with_dropout_streaming(
                q, k, v, key_bias, seed, 0.0, sm
            )
            ** 2
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    gr = jax.grad(
        lambda q, k, v: jnp.sum(ref(q, k, v) ** 2), argnums=(0, 1, 2)
    )(q, k, v)
    for a, b, name in zip(gk, gr, "qkv"):
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-3,
            err_msg=f"d{name}",
        )


def test_streaming_auto_dispatch_odd_shape():
    """auto pads odd T to the streaming block multiple and slices back."""
    from fastspeech2_lightning_tpu.ops.attention_dropout import (
        attention_with_dropout_auto,
    )

    t, dh = 700, 64
    sm = float(1.0 / np.sqrt(dh))
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.standard_normal((1, 1, t, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 1, t, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 1, t, dh)).astype(np.float32))
    key_bias = jnp.zeros((1, t), jnp.float32)
    seed = jnp.asarray([2], jnp.int32)

    o = attention_with_dropout_auto(q, k, v, key_bias, seed, 0.0, sm)
    assert o.shape == (1, 1, t, dh)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * sm
    w = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    np.testing.assert_allclose(
        np.asarray(o), np.asarray(ref), atol=5e-3, rtol=5e-3
    )
