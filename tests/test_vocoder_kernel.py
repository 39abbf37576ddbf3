"""Fused HiFiGAN MRF-stage Pallas kernel vs the unfused/NumPy references.

Runs in Pallas interpret mode on CPU; the kernel's compiled path is
hardware-validated separately (tools/profile_kernels.py vocoder).
Reference semantics: torch HiFiGAN ResBlock1 (handoff at
/root/reference/fs2/prediction_writing_callback.py:656-681)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fastspeech2_lightning_tpu.models.hifigan import (
    HiFiGANConfig,
    _resblock1,
    hifigan_generator,
    init_random_hifigan,
)
from fastspeech2_lightning_tpu.ops.vocoder_resblocks import (
    _np_reference_stage,
    fused_mrf_stage,
    mrf_stage_supported,
    prepare_stage_weights,
)

KS = (3, 7, 11)
DILS = ((1, 3, 5),) * 3


def _stage_params(C, seed=0):
    rng = np.random.default_rng(seed)

    def w(k):
        return rng.standard_normal((k, C, C)).astype(np.float32) * 0.05

    out = []
    for k in KS:
        block = {}
        for i in range(3):
            block[f"convs1_{i}_w"] = w(k)
            block[f"convs1_{i}_b"] = rng.standard_normal(C).astype(np.float32) * 0.1
            block[f"convs2_{i}_w"] = w(k)
            block[f"convs2_{i}_b"] = rng.standard_normal(C).astype(np.float32) * 0.1
        out.append(block)
    return out


@pytest.mark.parametrize(
    "C,T,block_t",
    [
        (32, 512, 256),  # two blocks
        (64, 640, 256),  # T not a multiple of block_t -> tail padding
        (128, 256, 256),  # single block
    ],
)
def test_fused_stage_matches_numpy_reference(C, T, block_t):
    stage = _stage_params(C)
    x = np.random.default_rng(1).standard_normal((2, T, C)).astype(np.float32)
    want = _np_reference_stage(x, stage, KS, DILS)
    flat = prepare_stage_weights(stage, KS, DILS, jnp.float32)
    got = fused_mrf_stage(
        jnp.asarray(x), flat, KS, DILS, block_t=block_t, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=2e-4)


def test_fused_stage_matches_unfused_jax_path():
    C, T = 64, 512
    stage = _stage_params(C, seed=3)
    x = np.random.default_rng(4).standard_normal((1, T, C)).astype(np.float32)
    acc = None
    for j, (k, d) in enumerate(zip(KS, DILS)):
        out = _resblock1(jnp.asarray(x), stage[j], k, d)
        acc = out if acc is None else acc + out
    want = np.asarray(acc / len(KS))
    flat = prepare_stage_weights(stage, KS, DILS, jnp.float32)
    got = fused_mrf_stage(jnp.asarray(x), flat, KS, DILS, block_t=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=2e-4)


def test_supported_gate():
    assert mrf_stage_supported(128, KS, DILS)
    assert mrf_stage_supported(32, KS, DILS)
    assert not mrf_stage_supported(256, KS, DILS)  # weights too big for VMEM


def test_full_generator_fused_equals_unfused():
    """End-to-end: fused=True generator output == fused=False (interpret via
    CPU backend pallas interpret fallback is implicit on CPU? no — force
    small shapes through the unfused path comparison with fused path in
    interpret mode by monkeypatching)."""
    config = HiFiGANConfig(
        upsample_rates=(8, 2),
        upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=128,
    )
    params = init_random_hifigan(config, seed=7)
    mel = jnp.asarray(
        np.random.default_rng(8).standard_normal((1, 48, 80)).astype(np.float32)
    )
    want = hifigan_generator(params, mel, config, fused=False)

    import fastspeech2_lightning_tpu.models.hifigan as hg
    import fastspeech2_lightning_tpu.ops.vocoder_resblocks as vr

    orig = vr.fused_mrf_stage

    def interp(x, flat, ks, dils, block_t=512, interpret=False):
        return orig(x, flat, ks, dils, block_t=block_t, interpret=True)

    # hifigan_generator imports the symbol at call time from the module
    vr_dict = vr.__dict__
    vr_dict["fused_mrf_stage"] = interp
    try:
        got = hg.hifigan_generator(params, mel, config, fused=True)
    finally:
        vr_dict["fused_mrf_stage"] = orig
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0, atol=5e-5
    )


class TestPolyphaseConvTranspose:
    """The polyphase ConvTranspose1d form must stay exactly equivalent to
    the default input-dilated form (it is the documented alternative and
    the base a future fused upsample kernel would build on)."""

    CASES = [
        (16, 8, 12, 6, 37),  # V1 stage-0/1 geometry, odd T
        (4, 2, 8, 4, 33),  # V1 stage-2/3 geometry
        (8, 4, 10, 5, 25),  # non-V1 stride
        (12, 4, 9, 4, 23),  # K = 3*stride
        (3, 1, 5, 5, 11),  # stride-1 degenerate (delegates to dilated)
    ]

    @pytest.mark.parametrize("K,s,cin,cout,T", CASES)
    def test_matches_dilated(self, K, s, cin, cout, T):
        from fastspeech2_lightning_tpu.models.hifigan import (
            _conv_transpose1d_dilated,
            _conv_transpose1d_polyphase,
        )

        rng = np.random.default_rng(K * 100 + s)
        x = jnp.asarray(rng.standard_normal((2, T, cin)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((K, cin, cout)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32))
        got = _conv_transpose1d_polyphase(x, w, b, s)
        want = _conv_transpose1d_dilated(x, w, b, s)
        assert got.shape == want.shape == (2, T * s, cout)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )

    def test_gradients_match(self):
        import jax

        from fastspeech2_lightning_tpu.models.hifigan import (
            _conv_transpose1d_dilated,
            _conv_transpose1d_polyphase,
        )

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((2, 20, 16)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((16, 16, 8)).astype(np.float32))
        b = jnp.zeros(8)

        def loss(fn, w, x):
            return jnp.sum(jnp.sin(fn(x, w, b, 8)))

        gw1, gx1 = jax.grad(lambda w, x: loss(_conv_transpose1d_polyphase, w, x), (0, 1))(w, x)
        gw2, gx2 = jax.grad(lambda w, x: loss(_conv_transpose1d_dilated, w, x), (0, 1))(w, x)
        np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-4, atol=1e-4)
