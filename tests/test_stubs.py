"""Stub fixture kit tests: stubbed checkpoints load through the real paths
and drive wav synthesis end to end (the everyvoice get_stubbed_* pattern)."""

import numpy as np

from fastspeech2_lightning_tpu.testing import get_stubbed_model, get_stubbed_vocoder


def test_stubbed_model_roundtrip(tmp_path):
    from fastspeech2_lightning_tpu.synthesis.synthesize import (
        load_model_from_checkpoint,
    )

    _, ckpt_path = get_stubbed_model(tmp_path)
    model, variables, config, stats, lang2id, speaker2id, step = (
        load_model_from_checkpoint(ckpt_path)
    )
    assert step == 0
    assert lang2id == {"default": 0}
    assert config.model.encoder.input_dim == 32


def test_stubbed_vocoder_roundtrip(tmp_path):
    from fastspeech2_lightning_tpu.models.hifigan import load_vocoder_checkpoint

    vocoder, path = get_stubbed_vocoder(tmp_path)
    loaded, step, hop = load_vocoder_checkpoint(path)
    assert hop == 256  # 8*8*2*2
    mel = np.zeros((1, 7, 20), dtype=np.float32)
    wav1, sr1 = vocoder(mel)
    wav2, sr2 = loaded(mel)
    assert wav1.shape == wav2.shape == (1, 7 * 256)
    np.testing.assert_allclose(wav1, wav2, rtol=1e-5, atol=1e-6)


def test_stubbed_model_synthesizes_wav(tmp_path):
    """Full wav path with the stub vocoder (mirrors
    fs2/tests/test_writing_callbacks.py:263 pattern)."""
    from fastspeech2_lightning_tpu.synthesis.prepare import prepare_data
    from fastspeech2_lightning_tpu.synthesis.synthesize import (
        load_model_from_checkpoint,
        synthesize_items,
    )
    from fastspeech2_lightning_tpu.synthesis.writers import (
        get_synthesis_output_writers,
    )
    from fastspeech2_lightning_tpu.type_definitions import SynthesizeOutputFormats

    _, ckpt_path = get_stubbed_model(tmp_path / "model")
    vocoder, _ = get_stubbed_vocoder(tmp_path / "vocoder")
    model, variables, config, stats, lang2id, speaker2id, step = (
        load_model_from_checkpoint(ckpt_path)
    )
    items = prepare_data(
        texts=["hello world"], language=None, speaker=None, filelist=None,
        config=config, stats=stats, lang2id=lang2id, speaker2id=speaker2id,
    )
    out_dir = tmp_path / "out"
    writers = get_synthesis_output_writers(
        [SynthesizeOutputFormats.wav], out_dir, config, "postnet_output",
        step, vocoder=vocoder, vocoder_global_step=0, output_hop_size=256,
    )
    synthesize_items(
        items, model, variables, config, lang2id, speaker2id, writers,
        max_target_len=128,
    )
    wavs = list((out_dir / "wav").glob("*.wav"))
    assert len(wavs) == 1
    from scipy.io import wavfile

    sr, data = wavfile.read(wavs[0])
    assert sr == 22050
    assert data.dtype == np.int16


def test_synthesizer_api(tmp_path):
    """Resident serving API: one object, jitted once, text -> mel/dur/wav."""
    from fastspeech2_lightning_tpu.synthesis.api import Synthesizer

    _, ckpt = get_stubbed_model(tmp_path / "m")
    _, vpath = get_stubbed_vocoder(tmp_path / "v")
    synth = Synthesizer.from_checkpoint(ckpt, vocoder_path=vpath, max_frames=64)
    result = synth.synthesize(["hello world", "ab"], duration_control=1.0)
    assert len(result.mels) == 2
    assert result.mels[0].shape[1] == 20
    assert result.sample_rate == 22050
    assert len(result.wavs) == 2
    hop = 256
    assert result.wavs[0].shape[0] == result.mels[0].shape[0] * hop
    # same padded shape -> no recompile on second call (cached jit)
    r2 = synth.synthesize(["another phrase here"])
    assert len(r2.mels) == 1
    # valid names pass; unknown names error (reference CLI semantics)
    synth.synthesize(["ok"], language="default", speaker="default", vocode=False)
    import pytest

    with pytest.raises(ValueError, match="unknown language"):
        synth.synthesize(["ok"], language="klingon")
    with pytest.raises(ValueError, match="unknown speaker"):
        synth.synthesize(["ok"], speaker="nobody")


def test_synthesizer_phones_level_runs_g2p(tmp_path):
    """Serving a phones-trained model must g2p the text first (the CLI
    dataset path already does; a bare character encode would feed letters
    to a phone-trained embedding). english_g2p('ab') yields IPA tokens
    not present in the raw characters, so the encodings must differ."""
    from fastspeech2_lightning_tpu.synthesis.api import Synthesizer
    from fastspeech2_lightning_tpu.testing import stub_config

    cfg = stub_config(target_text_representation_level="phones")
    cfg.text.g2p_engines = {"default": "english"}  # bundled english rules
    _, ckpt = get_stubbed_model(tmp_path / "m", config=cfg)
    synth = Synthesizer.from_checkpoint(ckpt, max_frames=64)
    r = synth.synthesize(["abc def"], vocode=False)
    assert r.mels[0].ndim == 2
    tp = synth.text_processor
    from fastspeech2_lightning_tpu.text.g2p import english_g2p

    expected_ids = tp.encode_tokens(
        [t for t in english_g2p("abc def") if t in tp.symbol_to_id]
    )
    # durations come back per encoded token -> the model saw the g2p ids
    assert len(r.durations[0]) == len(expected_ids)
    assert expected_ids != tp.encode_text("abc def"), (
        "phones ids must differ from raw character ids for this input"
    )


def test_synthesizer_pfs_level_serves(tmp_path):
    """Serving a phonological_features-trained model through the resident
    API must build the pfs input matrices the same way the dataset path does
    (the reference serves every representation level through its one predict
    path, fs2/dataset.py:155-174). Durations come back per g2p token, so the
    model really consumed one pfs row per token."""
    from fastspeech2_lightning_tpu.synthesis.api import Synthesizer
    from fastspeech2_lightning_tpu.testing import stub_config
    from fastspeech2_lightning_tpu.text.g2p import english_g2p

    cfg = stub_config(
        target_text_representation_level="phonological_features"
    )
    cfg.text.g2p_engines = {"default": "english"}
    _, ckpt = get_stubbed_model(tmp_path / "m", config=cfg)
    synth = Synthesizer.from_checkpoint(ckpt, max_frames=64)
    r = synth.synthesize(["abc def"], vocode=False)
    assert r.mels[0].ndim == 2
    tp = synth.text_processor
    n_tokens = len(
        [t for t in english_g2p("abc def") if t in tp.symbol_to_id]
    )
    assert len(r.durations[0]) == n_tokens


def test_synthesizer_upsampling_vocoder_hop(tmp_path):
    """A vocoder whose total upsampling != the analysis fft_hop_size (an
    output-rate-upsampling generator, e.g. 44.1 kHz audio from 22.05 kHz
    mels) must get lens * GENERATOR-hop samples per utterance — trimming
    by the analysis hop truncated the wav to half its duration."""
    import jax

    from fastspeech2_lightning_tpu.models.hifigan import (
        HiFiGANConfig,
        init_random_hifigan,
    )
    from fastspeech2_lightning_tpu.synthesis.api import Synthesizer
    from fastspeech2_lightning_tpu.testing import dataclass_to_dict

    voc_cfg = HiFiGANConfig(
        upsample_rates=(8, 8, 2, 2, 2),  # 512 = 2x the 256 analysis hop
        upsample_kernel_sizes=(16, 16, 4, 4, 4),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
        n_mels=20,
        sampling_rate=44100,
    )
    assert voc_cfg.total_upsampling == 512
    params = init_random_hifigan(voc_cfg)
    voc_path = tmp_path / "up_vocoder.npz"
    np.savez(
        voc_path,
        params=np.array(
            jax.tree_util.tree_map(np.asarray, params), dtype=object
        ),
        config=np.array(dataclass_to_dict(voc_cfg), dtype=object),
    )
    _, ckpt = get_stubbed_model(tmp_path / "m")
    synth = Synthesizer.from_checkpoint(
        ckpt, vocoder_path=voc_path, max_frames=64
    )
    r = synth.synthesize(["hello world"])
    assert r.sample_rate == 44100
    assert r.wavs[0].shape[0] == r.mels[0].shape[0] * 512


def test_synthesizer_style_reference(tmp_path):
    """GST style conditioning through the resident API (CLI
    --style-reference parity): a reference wav shifts the output, and a
    non-GST model rejects the argument."""
    import pytest

    from fastspeech2_lightning_tpu.preprocessing.pipeline import save_wav
    from fastspeech2_lightning_tpu.synthesis.api import Synthesizer
    from fastspeech2_lightning_tpu.testing import stub_config

    sr = 22050
    t = np.arange(sr // 2) / sr
    ref_wav = tmp_path / "ref.wav"
    save_wav(ref_wav, (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), sr)

    cfg = stub_config(use_global_style_token_module=True)
    _, ckpt = get_stubbed_model(tmp_path / "m", config=cfg)
    synth = Synthesizer.from_checkpoint(ckpt, max_frames=64)
    # the random stub's duration head predicts logd < 0 for every token
    # (zero frames — a vacuous comparison); bias it positive so the test
    # compares real mel content
    synth.variables["params"]["variance_adaptor"]["duration_predictor"][
        "linear"
    ]["bias"] += 1.0
    base = synth.synthesize(["hello"], vocode=False)
    styled = synth.synthesize(["hello"], vocode=False, style_reference=ref_wav)
    assert styled.mels[0].shape[1] == base.mels[0].shape[1]
    # GST conditioning must actually change the output
    n = min(styled.mels[0].shape[0], base.mels[0].shape[0])
    assert n > 0, "stub produced an empty mel — styled/base incomparable"
    assert not np.allclose(styled.mels[0][:n], base.mels[0][:n])

    _, ckpt_plain = get_stubbed_model(tmp_path / "plain")
    plain = Synthesizer.from_checkpoint(ckpt_plain, max_frames=64)
    with pytest.raises(ValueError, match="use_global_style_token_module"):
        plain.synthesize(["hello"], style_reference=ref_wav)


def test_synthesizer_long_form(tmp_path):
    from fastspeech2_lightning_tpu.synthesis.api import Synthesizer

    _, ckpt = get_stubbed_model(tmp_path / "m")
    synth = Synthesizer.from_checkpoint(ckpt, max_frames=64)
    long_text = "one two three. four five six. seven eight nine. ten eleven."
    result = synth.synthesize_long(long_text)
    assert len(result.mels) == 1
    # reassembled length equals the sum of per-chunk lengths
    chunks = synth.synthesize(
        ["one two three.", "four five six.", "seven eight nine.", "ten eleven."]
    )
    # same total frame budget ballpark (chunk boundaries differ slightly)
    assert result.mels[0].shape[0] > 0
    assert result.mels[0].shape[1] == 20
