"""block_matmul_conv1d: exactness vs lax.conv_general_dilated (values and
gradients) over the HiFiGAN geometry matrix, including the odd avg-pooled
lengths, dilation, and the fallback conditions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastspeech2_lightning_tpu.ops.packed_conv import block_matmul_conv1d


def _ref(x, w, s, g, d):
    k = w.shape[0]
    pad = (k - 1) // 2 * d
    return jax.lax.conv_general_dilated(
        x, w, (s,), [(pad, pad)], rhs_dilation=(d,),
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=g,
    )


# (T, cin, cout, k, stride, groups, dilation) — MSD scale-1 layers, the odd
# scale-2 lengths after AvgPool1d(4,2,2), and generator-resblock shapes.
GEOMETRIES = [
    (1024, 128, 128, 41, 2, 4, 1),
    (512, 128, 256, 41, 2, 16, 1),
    (256, 256, 512, 41, 4, 16, 1),
    (256, 512, 1024, 41, 4, 16, 1),
    (128, 1024, 1024, 41, 1, 16, 1),
    (513, 128, 128, 41, 2, 4, 1),
    (257, 128, 256, 41, 2, 16, 1),
    (129, 256, 512, 41, 4, 16, 1),
    (256, 64, 64, 3, 1, 1, 1),
    (256, 64, 64, 7, 1, 1, 3),
    (250, 32, 32, 11, 1, 1, 5),
]


@pytest.mark.parametrize("geom", GEOMETRIES)
def test_block_matmul_conv1d_matches_lax(geom):
    T, cin, cout, k, s, g, d = geom
    rng = np.random.default_rng(hash(geom) % 2**32)
    x = jnp.asarray(rng.standard_normal((2, T, cin)).astype(np.float32))
    w = jnp.asarray(
        (rng.standard_normal((k, cin // g, cout)) * 0.05).astype(np.float32)
    )
    want = _ref(x, w, s, g, d)
    got = block_matmul_conv1d(x, w, stride=s, groups=g, dilation=d)
    assert got is not None, geom
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("geom", [GEOMETRIES[1], GEOMETRIES[5], GEOMETRIES[9]])
def test_block_matmul_conv1d_grads_match(geom):
    """d/dx and d/dw of the packed form match the plain conv's gradients —
    the whole point is that training flows through this path."""
    T, cin, cout, k, s, g, d = geom
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, T, cin)).astype(np.float32))
    w = jnp.asarray(
        (rng.standard_normal((k, cin // g, cout)) * 0.05).astype(np.float32)
    )
    cot = jnp.asarray(
        rng.standard_normal(_ref(x, w, s, g, d).shape).astype(np.float32)
    )

    def loss(fn):
        return lambda x, w: jnp.sum(fn(x, w) * cot)

    gx_ref, gw_ref = jax.grad(
        loss(lambda x, w: _ref(x, w, s, g, d)), argnums=(0, 1)
    )(x, w)
    gx, gw = jax.grad(
        loss(
            lambda x, w: block_matmul_conv1d(
                x, w, stride=s, groups=g, dilation=d
            )
        ),
        argnums=(0, 1),
    )(x, w)
    np.testing.assert_allclose(
        np.asarray(gx), np.asarray(gx_ref), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(gw), np.asarray(gw_ref), rtol=2e-4, atol=2e-4
    )


def test_fallback_conditions():
    rng = np.random.default_rng(2)
    # >= 64 output lanes per group: not worth packing
    x = jnp.asarray(rng.standard_normal((2, 64, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((15, 8, 128)).astype(np.float32))
    assert block_matmul_conv1d(x, w) is None
    # cout=1 post-conv with huge cin: packed weight would blow the budget
    # only when it exceeds the element cap — small case still packs
    x = jnp.asarray(rng.standard_normal((2, 64, 1024)).astype(np.float32))
    w = jnp.asarray(
        (rng.standard_normal((3, 1024, 1)) * 0.05).astype(np.float32)
    )
    got = block_matmul_conv1d(x, w)
    if got is not None:  # packs under the cap: must still be exact
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(_ref(x, w, 1, 1, 1)),
            rtol=2e-5, atol=2e-5,
        )
    # channel mismatch
    x = jnp.asarray(rng.standard_normal((2, 64, 16)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 8, 32)).astype(np.float32))
    assert block_matmul_conv1d(x, w, groups=4) is None


def test_bf16_path():
    """bf16 inputs (the training compute dtype) stay exact to bf16
    tolerance."""
    T, cin, cout, k, s, g, d = GEOMETRIES[1]
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, T, cin)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, cin // g, cout)) * 0.05,
                    jnp.bfloat16)
    want = np.asarray(_ref(x, w, s, g, d), np.float32)
    got = np.asarray(
        block_matmul_conv1d(x, w, stride=s, groups=g, dilation=d), np.float32
    )
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)
