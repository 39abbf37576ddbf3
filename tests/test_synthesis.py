"""Synthesis layer tests: writers (chunk reassembly, filenames, formats),
HiFiGAN generator parity vs torch primitives, prepare_data chunking."""

import numpy as np
import pytest

from fastspeech2_lightning_tpu.synthesis import (
    get_synthesis_output_writers,
    prepare_data,
    validate_data_keys_with_model_keys,
)
from fastspeech2_lightning_tpu.type_definitions import SynthesizeOutputFormats

from helpers import tiny_config, tiny_stats

N_MELS = 20


def fake_outputs(B, T, L, n_mels=N_MELS, seed=0):
    rng = np.random.default_rng(seed)
    # durations that sum to T exactly for clean seconds math
    logd = np.log(np.full((B, L), T // L, dtype=np.float32) + 1)
    return {
        "output": rng.standard_normal((B, T, n_mels)).astype(np.float32),
        "postnet_output": rng.standard_normal((B, T, n_mels)).astype(np.float32),
        "tgt_lens": np.full(B, T, dtype=np.int32),
        "duration_prediction": logd,
    }


def fake_batch(B, L, texts=None, last_flags=None):
    texts = texts or [f"ab c{i}" for i in range(B)]
    # ids: a, b, <space>, c, d, ... (space id=1 so word boundaries exist)
    ids = np.array([8, 9, 1, 10] + list(range(11, 11 + max(L - 4, 0))))[:L]
    return {
        "text": np.tile(ids.astype(np.int32), (B, 1)),
        "src_lens": np.full(B, L, dtype=np.int32),
        "raw_text": texts,
        "basename": [f"utt{i}" for i in range(B)],
        "speaker": ["default"] * B,
        "language": ["default"] * B,
        "duration_control": np.ones(B, dtype=np.float32),
        "is_last_input_chunk": last_flags or [True] * B,
    }


@pytest.fixture
def cfg():
    c = tiny_config()
    return c


def test_spec_writer_chunk_reassembly(cfg, tmp_path):
    writers = get_synthesis_output_writers(
        [SynthesizeOutputFormats.spec], tmp_path, cfg, "postnet_output", 77
    )
    w = writers[SynthesizeOutputFormats.spec]
    # two chunks then a final chunk: one file with concatenated frames
    out = fake_outputs(2, 16, 4)
    batch = fake_batch(2, 4, texts=["hello ", "world"], last_flags=[False, True])
    w.on_predict_batch_end(out, batch)
    files = list((tmp_path / "synthesized_spec").glob("*.npy"))
    assert len(files) == 1
    spec = np.load(files[0])
    assert spec.shape == (N_MELS, 32)  # [K, T1+T2]
    assert "hello-world" in files[0].name
    # chunk-reassembly invariant from the reference tests: 1 chunk * 2 == 2 chunks
    # (fs2/tests/test_chunking.py:223)
    w2 = get_synthesis_output_writers(
        [SynthesizeOutputFormats.spec], tmp_path / "b", cfg, "postnet_output", 77
    )[SynthesizeOutputFormats.spec]
    w2.on_predict_batch_end(fake_outputs(1, 16, 4), fake_batch(1, 4, ["hello "]))
    single = np.load(list((tmp_path / "b" / "synthesized_spec").glob("*.npy"))[0])
    assert spec.shape[-1] == 2 * single.shape[-1]


def test_textgrid_writer(cfg, tmp_path):
    writers = get_synthesis_output_writers(
        [SynthesizeOutputFormats.textgrid], tmp_path, cfg, "postnet_output", 3
    )
    w = writers[SynthesizeOutputFormats.textgrid]
    out = fake_outputs(1, 16, 4)
    # text ids 8.. decode to letters; raw text "ab cd" -> 2 words
    w.on_predict_batch_end(out, fake_batch(1, 4, texts=["ab cd"]))
    files = list((tmp_path / "textgrids").glob("*.TextGrid"))
    assert len(files) == 1
    content = files[0].read_text()
    assert 'Object class = "TextGrid"' in content
    assert '"phones"' in content and '"words"' in content
    assert "intervals" in content


def test_readalong_writers(cfg, tmp_path):
    writers = get_synthesis_output_writers(
        [SynthesizeOutputFormats.readalong_xml], tmp_path, cfg, "postnet_output", 3
    )
    w = writers[SynthesizeOutputFormats.readalong_xml]
    w.on_predict_batch_end(fake_outputs(1, 16, 4), fake_batch(1, 4, texts=["ab cd"]))
    files = list((tmp_path / "readalongs").glob("*.readalong"))
    assert len(files) == 1
    xml = files[0].read_text()
    assert "<read-along" in xml and "<w time=" in xml


def test_wav_writer_trims_and_reassembles(cfg, tmp_path):
    hop = cfg.preprocessing.audio.fft_hop_size

    def fake_vocoder(mel):
        B, T, K = mel.shape
        return np.zeros((B, T * hop), dtype=np.float32), 22050

    writers = get_synthesis_output_writers(
        [SynthesizeOutputFormats.wav], tmp_path, cfg, "postnet_output", 9,
        vocoder=fake_vocoder, vocoder_global_step=5,
    )
    w = writers[SynthesizeOutputFormats.wav]
    out = fake_outputs(2, 16, 4)
    out["tgt_lens"] = np.array([10, 12], dtype=np.int32)
    w.on_predict_batch_end(out, fake_batch(2, 4, ["a ", "b"], [False, True]))
    files = list((tmp_path / "wav").glob("*.wav"))
    assert len(files) == 1
    assert "ckpt=9" in files[0].name and "v_ckpt=5" in files[0].name
    from scipy.io import wavfile

    sr, data = wavfile.read(files[0])
    assert sr == 22050
    assert len(data) == (10 + 12) * hop  # trimmed per chunk, then concatenated


def test_wav_requires_vocoder(cfg, tmp_path):
    with pytest.raises(ValueError, match="vocoder"):
        get_synthesis_output_writers(
            [SynthesizeOutputFormats.wav], tmp_path, cfg, "postnet_output", 0
        )


def test_validate_data_keys():
    validate_data_keys_with_model_keys({"eng"}, {"eng", "fra"}, "language", True)
    with pytest.raises(ValueError, match="not"):
        validate_data_keys_with_model_keys({"deu"}, {"eng"}, "language", True)
    with pytest.raises(ValueError, match="multiple"):
        validate_data_keys_with_model_keys({"x", "y"}, {"x"}, "speaker", False)


def test_prepare_data_chunks_long_text(cfg):
    stats = tiny_stats()
    data = prepare_data(
        texts=["one two three. four five six. seven eight nine. ten!"],
        language=None,
        speaker=None,
        filelist=None,
        config=cfg,
        stats=stats,
        lang2id={"default": 0},
        speaker2id={"default": 0},
        duration_control=1.5,
    )
    assert len(data) > 1
    assert data[-1]["is_last_input_chunk"] is True
    assert all(not d["is_last_input_chunk"] for d in data[:-1])
    assert all(d["duration_control"] == 1.5 for d in data)
    assert all(d["language"] == "default" for d in data)


# ---------------------------------------------------------------------------
# HiFiGAN
# ---------------------------------------------------------------------------


def test_hifigan_shapes_and_upsampling():
    import jax.numpy as jnp

    from fastspeech2_lightning_tpu.models.hifigan import (
        HiFiGANConfig,
        hifigan_generator,
        init_random_hifigan,
    )

    config = HiFiGANConfig(
        upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32, n_mels=N_MELS,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    )
    params = init_random_hifigan(config)
    mel = jnp.zeros((2, 10, N_MELS))
    wav = hifigan_generator(params, mel, config)
    assert wav.shape == (2, 10 * 16)


def test_conv_transpose_matches_torch():
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from fastspeech2_lightning_tpu.models.hifigan import _conv_transpose1d

    rng = np.random.default_rng(0)
    B, T, Cin, Cout, K, s = 2, 7, 6, 4, 16, 8
    x = rng.standard_normal((B, T, Cin)).astype(np.float32)
    w_torch = rng.standard_normal((Cin, Cout, K)).astype(np.float32)
    b = rng.standard_normal(Cout).astype(np.float32)

    conv = torch.nn.ConvTranspose1d(Cin, Cout, K, stride=s, padding=(K - s) // 2)
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(w_torch))
        conv.bias.copy_(torch.tensor(b))
        ref = conv(torch.tensor(x).transpose(1, 2)).transpose(1, 2).numpy()

    ours = np.asarray(
        _conv_transpose1d(
            jnp.array(x), jnp.array(np.transpose(w_torch, (2, 0, 1))), jnp.array(b), s
        )
    )
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_load_torch_hifigan_roundtrip():
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from fastspeech2_lightning_tpu.models.hifigan import (
        HiFiGANConfig,
        hifigan_generator,
        load_torch_hifigan,
    )

    config = HiFiGANConfig(
        upsample_rates=(4,), upsample_kernel_sizes=(8,),
        upsample_initial_channel=16, n_mels=8,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    )
    # build a canonical torch state dict
    sd = {}
    rng = np.random.default_rng(1)

    def t(shape):
        return torch.tensor(rng.standard_normal(shape).astype(np.float32) * 0.1)

    sd["conv_pre.weight"] = t((16, 8, 7))
    sd["conv_pre.bias"] = t((16,))
    sd["ups.0.weight"] = t((16, 8, 8))  # [Cin, Cout, K]
    sd["ups.0.bias"] = t((8,))
    for di in range(2):
        sd[f"resblocks.0.convs1.{di}.weight"] = t((8, 8, 3))
        sd[f"resblocks.0.convs1.{di}.bias"] = t((8,))
        sd[f"resblocks.0.convs2.{di}.weight"] = t((8, 8, 3))
        sd[f"resblocks.0.convs2.{di}.bias"] = t((8,))
    sd["conv_post.weight"] = t((1, 8, 7))
    sd["conv_post.bias"] = t((1,))

    params, cfg2 = load_torch_hifigan(sd, config)
    wav = hifigan_generator(params, jnp.zeros((1, 5, 8)), cfg2)
    assert wav.shape == (1, 20)
    assert np.isfinite(np.asarray(wav)).all()
