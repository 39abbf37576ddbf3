"""Native C++ kernel tests: MAS parity with the NumPy/scan goldens, YIN F0
parity with the NumPy tracker."""

import numpy as np
import pytest

from fastspeech2_lightning_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_native_mas_matches_numpy():
    from fastspeech2_lightning_tpu.ops.mas import b_mas_numpy

    rng = np.random.default_rng(0)
    B, T, L = 5, 60, 17
    la = rng.standard_normal((B, T, L)).astype(np.float32)
    in_lens = rng.integers(2, L + 1, size=B).astype(np.int32)
    out_lens = np.maximum(rng.integers(5, T + 1, size=B).astype(np.int32), in_lens + 1)
    ours = native.b_mas_width1_native(la, in_lens, out_lens)
    golden = b_mas_numpy(la, in_lens, out_lens)
    np.testing.assert_array_equal(ours, golden)


def test_native_mas_matches_jax_scan():
    import jax.numpy as jnp

    from fastspeech2_lightning_tpu.ops.mas import mas_width1_batched

    rng = np.random.default_rng(1)
    B, T, L = 3, 40, 11
    la = rng.standard_normal((B, T, L)).astype(np.float32)
    in_lens = np.array([11, 6, 9], dtype=np.int32)
    out_lens = np.array([40, 25, 30], dtype=np.int32)
    hard, _ = mas_width1_batched(jnp.array(la), jnp.array(in_lens), jnp.array(out_lens))
    ours = native.b_mas_width1_native(la, in_lens, out_lens)
    np.testing.assert_array_equal(ours, np.asarray(hard))


def test_native_f0_matches_numpy_on_tones():
    from fastspeech2_lightning_tpu.preprocessing.f0 import estimate_f0

    SR = 22050
    for freq in (110.0, 220.0, 330.0):
        t = np.arange(int(0.4 * SR)) / SR
        audio = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
        ref = estimate_f0(audio, SR, 256)
        ours = native.yin_f0_native(audio, SR, 256)
        assert ours.shape == ref.shape
        voiced_ref = ref[ref > 0]
        voiced_ours = ours[ours > 0]
        assert abs(np.median(voiced_ours) - freq) / freq < 0.02
        # voicing decisions broadly agree
        agree = np.mean((ref > 0) == (ours > 0))
        assert agree > 0.9, agree


def test_native_f0_silence():
    audio = np.zeros(11025, dtype=np.float32)
    f0 = native.yin_f0_native(audio, 22050, 256)
    assert (f0 == 0).all()
