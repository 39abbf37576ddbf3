"""Windowed/streaming vocoder (synthesis/streaming.py): TTFA path.

Contract: concatenating the streamed segments equals vocoding the whole mel
in one call — the window margin covers the generator's receptive field, so
every emitted sample's context lies inside its slice."""

import json
import urllib.request

import numpy as np
import pytest

from fastspeech2_lightning_tpu.models.hifigan import HiFiGANConfig
from fastspeech2_lightning_tpu.synthesis.api import Synthesizer
from fastspeech2_lightning_tpu.synthesis.streaming import windowed_vocode
from fastspeech2_lightning_tpu.testing import get_stubbed_model, get_stubbed_vocoder


@pytest.fixture(scope="module")
def vocoder(tmp_path_factory):
    voc, _ = get_stubbed_vocoder(tmp_path_factory.mktemp("voc"))
    return voc


def _full(voc, mel):
    wav, _sr = voc(mel[None])
    return np.asarray(wav, dtype=np.float32)[0]


@pytest.mark.parametrize("window", [32, 64, 100])
def test_windowed_matches_full(vocoder, window):
    mel = np.random.default_rng(0).normal(size=(300, 20)).astype(np.float32)
    segs = list(windowed_vocode(vocoder, mel, window=window))
    assert len(segs) > 1
    out = np.concatenate(segs)
    full = _full(vocoder, mel)
    assert out.shape == full.shape
    np.testing.assert_allclose(out, full, atol=2e-5)


def test_short_mel_single_call(vocoder):
    """T <= window + 2*margin falls back to one bucket-padded call: exact
    match to the padded full vocode (the compiled shape), exact match to
    the raw full vocode everywhere the receptive field stays inside the
    real frames, and a BOUNDED compiled-shape set (32-frame buckets)."""
    mel = np.random.default_rng(1).normal(size=(40, 20)).astype(np.float32)
    segs = list(windowed_vocode(vocoder, mel, window=128))
    assert len(segs) == 1
    T, hop = 40, vocoder.hop
    margin = vocoder.receptive_margin_frames
    padded = np.pad(mel, ((0, 64 - T), (0, 0)))  # round_up(40, 32) = 64
    np.testing.assert_allclose(
        segs[0], _full(vocoder, padded)[: T * hop], atol=2e-5
    )
    head = (T - margin) * hop
    np.testing.assert_allclose(
        segs[0][:head], _full(vocoder, mel)[:head], atol=2e-5
    )
    assert segs[0].shape[0] == T * hop


def test_margin_defaults_to_receptive_field(vocoder):
    """The default margin is the generator's computed one-sided receptive
    field; an explicit too-small margin visibly breaks the equality, which
    proves the bound is load-bearing."""
    assert vocoder.receptive_margin_frames == HiFiGANConfig(
        upsample_rates=(8, 8, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4),
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    ).receptive_margin_frames
    mel = np.random.default_rng(2).normal(size=(300, 20)).astype(np.float32)
    full = _full(vocoder, mel)
    ok = np.concatenate(list(windowed_vocode(vocoder, mel, window=64)))
    np.testing.assert_allclose(ok, full, atol=2e-5)
    bad = np.concatenate(
        list(windowed_vocode(vocoder, mel, window=64, margin=0))
    )
    # stub-vocoder amplitudes are ~1e-6, so measure relative to the signal:
    # dropping the margin corrupts window edges by ~50% of peak amplitude
    assert np.abs(bad - full).max() > 0.05 * np.abs(full).max()


def test_v1_receptive_margin_value():
    # hand-derived for the V1 generator: conv_pre 3 + stage ctx
    # (2 + 7.5 + .25 + .94 + .016 + .47 + .008 + .23) + conv_post .012 -> 15
    assert HiFiGANConfig().receptive_margin_frames == 15


def test_synthesize_stream_matches_per_mel_vocode(tmp_path):
    _, ckpt = get_stubbed_model(tmp_path)
    _voc, voc_path = get_stubbed_vocoder(tmp_path)
    syn = Synthesizer.from_checkpoint(ckpt, vocoder_path=voc_path, max_frames=128)
    text = "abcd efg hij. klm nopq rstu."
    segs = list(syn.synthesize_stream(text, window=32))
    assert len(segs) >= 1
    streamed = np.concatenate(segs)
    mels = syn.synthesize(
        syn._chunk_text(text, None), vocode=False
    ).mels
    direct = np.concatenate([_full(syn.vocoder, m) for m in mels])
    assert streamed.shape == direct.shape
    np.testing.assert_allclose(streamed, direct, atol=2e-5)


def test_server_low_latency_stream(tmp_path):
    from fastspeech2_lightning_tpu.serving.server import serve

    _, ckpt = get_stubbed_model(tmp_path)
    _voc, voc_path = get_stubbed_vocoder(tmp_path)
    srv = serve(ckpt, vocoder_path=voc_path, port=0, max_batch=2, max_frames=128)
    try:
        srv.start()
        body = json.dumps(
            {"text": "abc def", "low_latency": True, "window": 32}
        ).encode()
        req = urllib.request.Request(
            f"http://{srv.address[0]}:{srv.address[1]}/synthesize",
            data=body, headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"] == "audio/wav"
            data = resp.read()
        assert data[:4] == b"RIFF"
        n_samples = (len(data) - 44) // 2
        expected = sum(
            len(s) for s in srv.synthesizer.synthesize_stream(
                "abc def", window=32
            )
        )
        assert n_samples == expected
    finally:
        srv.shutdown()


# ---------------------------------------------------------------------------
# Sequence-parallel vocoding (models/hifigan.make_parallel_vocoder_fn):
# the frame axis split into receptive-field-padded windows sharded over the
# mesh — same window contract as streaming, parallel instead of sequential.
# ---------------------------------------------------------------------------


def _tiny_gen():
    from fastspeech2_lightning_tpu.models.hifigan import (
        HiFiGANConfig,
        init_random_hifigan,
    )

    config = HiFiGANConfig(
        upsample_rates=(8, 8, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
        n_mels=20,
    )
    return init_random_hifigan(config), config


@pytest.mark.parametrize("shape", [(1, 300), (2, 257), (1, 2048)])
def test_parallel_vocoder_matches_single_device(shape):
    """Window-parallel vocode over the 8-virtual-device mesh is identical
    to the plain single-device generator, including non-divisible T."""
    import jax.numpy as jnp

    from fastspeech2_lightning_tpu.models.hifigan import (
        hifigan_generator,
        make_parallel_vocoder_fn,
    )
    from fastspeech2_lightning_tpu.parallel.mesh import make_mesh

    params, config = _tiny_gen()
    mesh = make_mesh()
    voc = make_parallel_vocoder_fn(params, config, mesh)
    B, T = shape
    mel = np.random.default_rng(T).normal(size=(B, T, 20)).astype(np.float32)
    wav, sr = voc(mel)
    assert sr == config.sampling_rate
    full = np.asarray(hifigan_generator(params, jnp.asarray(mel), config))
    assert wav.shape == full.shape
    np.testing.assert_allclose(wav, full, atol=2e-5)


def test_mesh_synthesizer_engages_window_parallel_vocoder(tmp_path):
    """Through the REAL serving path (Synthesizer with a data mesh), a
    single long request must window-split the vocoder — the mesh padding
    (duplicate rows to fill the data axis) must not disguise B=1 as a full
    batch. Output stays identical to the meshless synthesizer."""
    import numpy as np

    from fastspeech2_lightning_tpu.synthesis.api import Synthesizer
    from fastspeech2_lightning_tpu.testing import (
        get_stubbed_model,
        get_stubbed_vocoder,
    )

    _m, ckpt = get_stubbed_model(tmp_path / "m")
    _v, voc = get_stubbed_vocoder(tmp_path / "v")
    text = ["window parallel engagement check"]
    kwargs = dict(duration_control=30.0, vocode=True)  # force a long mel
    syn_dp = Synthesizer.from_checkpoint(
        ckpt, vocoder_path=voc, data_parallel=8, max_frames=512
    )
    r_dp = syn_dp.synthesize(text, **kwargs)
    cache = getattr(syn_dp.vocoder, "_window_cache", {})
    assert any(b == 1 for (b, _t) in cache), (
        f"window-parallel path never engaged for B=1 (cache: {list(cache)})"
    )
    syn_1 = Synthesizer.from_checkpoint(ckpt, vocoder_path=voc, max_frames=512)
    r_1 = syn_1.synthesize(text, **kwargs)
    assert r_dp.wavs[0].shape == r_1.wavs[0].shape
    np.testing.assert_allclose(r_dp.wavs[0], r_1.wavs[0], atol=2e-5)


def test_parallel_vocoder_short_mel_plain_path(monkeypatch):
    """T too short to split must fall back to one plain call (and still
    match the generator exactly)."""
    import jax.numpy as jnp

    from fastspeech2_lightning_tpu.models.hifigan import (
        hifigan_generator,
        make_parallel_vocoder_fn,
    )
    from fastspeech2_lightning_tpu.parallel.mesh import make_mesh

    params, config = _tiny_gen()
    voc = make_parallel_vocoder_fn(params, config, make_mesh())
    mel = np.random.default_rng(3).normal(size=(1, 24, 20)).astype(np.float32)
    wav, _ = voc(mel)
    full = np.asarray(hifigan_generator(params, jnp.asarray(mel), config))
    np.testing.assert_allclose(wav, full, atol=2e-5)
