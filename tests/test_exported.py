"""jax.export serving artifacts (synthesis/exported.py).

The exported StableHLO program set must reproduce the live Synthesizer
bit-for-bit: same bucket selection, padding, duration-overflow re-run, and
vocoder trim — with no model code or checkpoint at load time."""

import zipfile
from pathlib import Path

import numpy as np
import pytest

from fastspeech2_lightning_tpu.testing import (
    get_stubbed_model,
    get_stubbed_vocoder,
)


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    td = tmp_path_factory.mktemp("exported")
    _model, ckpt_path = get_stubbed_model(td)
    _voc, voc_path = get_stubbed_vocoder(td)
    from fastspeech2_lightning_tpu.synthesis.exported import (
        export_serving_artifact,
    )

    art = export_serving_artifact(
        ckpt_path,
        td / "model.fs2x",
        vocoder_path=voc_path,
        batch_sizes=(2,),
        text_buckets=(16, 48),
        max_frames=512,
    )
    return art, ckpt_path, voc_path


def test_artifact_layout(artifact):
    art, _ckpt, _voc = artifact
    zf = zipfile.ZipFile(art)
    names = set(zf.namelist())
    assert "meta.json" in names
    assert "params.npz" in names
    assert "vocoder_params.npz" in names
    assert any(n.startswith("acoustic/") for n in names)
    assert any(n.startswith("vocoder/") for n in names)
    # the largest text bucket gets an extra full-cap program for
    # duration-overflow re-runs
    assert "acoustic/B2_L48_T512.jaxexp" in names


def test_exported_matches_live_synthesizer(artifact):
    art, ckpt_path, voc_path = artifact
    from fastspeech2_lightning_tpu.synthesis.api import Synthesizer
    from fastspeech2_lightning_tpu.synthesis.exported import (
        ExportedSynthesizer,
    )

    texts = ["hello world", "a longer sentence to synthesize today"]
    with ExportedSynthesizer(art) as ex:
        r = ex.synthesize(texts)
    live = Synthesizer.from_checkpoint(ckpt_path, vocoder_path=voc_path)
    r2 = live.synthesize(texts)
    assert r.sample_rate == r2.sample_rate
    for a, b in zip(r.mels, r2.mels):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-6)
    for a, b in zip(r.durations, r2.durations):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(r.wavs, r2.wavs):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_exported_needs_no_checkpoint(artifact, tmp_path):
    """The artifact is self-contained: copy it elsewhere, delete nothing
    else matters — loading reads only the zip."""
    art, _ckpt, _voc = artifact
    moved = tmp_path / "standalone.fs2x"
    moved.write_bytes(Path(art).read_bytes())
    from fastspeech2_lightning_tpu.synthesis.exported import (
        ExportedSynthesizer,
    )

    with ExportedSynthesizer(moved) as ex:
        r = ex.synthesize(["hello"], vocode=False)
    assert r.mels[0].ndim == 2
    assert r.wavs is None


def test_exported_uncovered_shape_errors(artifact):
    art, _ckpt, _voc = artifact
    from fastspeech2_lightning_tpu.synthesis.exported import (
        ExportedSynthesizer,
    )

    with ExportedSynthesizer(art) as ex:
        with pytest.raises(ValueError, match="no exported acoustic program"):
            ex.synthesize(["x" * 100])  # L=112 > largest exported bucket 48
        # B=3 > exported batch 2: micro-batched through the B=2 program
        r = ex.synthesize(["one", "two", "three"], vocode=False)
        assert len(r.mels) == 3


def test_exported_long_text_chunks(artifact):
    art, _ckpt, _voc = artifact
    from fastspeech2_lightning_tpu.synthesis.exported import (
        ExportedSynthesizer,
    )

    long_text = "hello there. " * 8  # 104 chars; chunks must fit 48-buckets
    with ExportedSynthesizer(art) as ex:
        r = ex.synthesize_long(long_text)
    assert len(r.mels) == 1 and len(r.wavs) == 1
    assert r.mels[0].shape[0] * ex.meta["hop"] == r.wavs[0].shape[0]


def test_multi_platform_export_matches_live(artifact, tmp_path):
    """platforms=("cpu","tpu") lowers once per platform into one artifact;
    the CPU execution must still match the live Synthesizer exactly."""
    art, ckpt_path, _voc = artifact
    from fastspeech2_lightning_tpu.synthesis.api import Synthesizer
    from fastspeech2_lightning_tpu.synthesis.exported import (
        ExportedSynthesizer,
        export_serving_artifact,
    )

    multi = export_serving_artifact(
        ckpt_path, tmp_path / "multi.fs2x", batch_sizes=(1,),
        text_buckets=(16,), max_frames=256, platforms=("cpu", "tpu"),
    )
    with ExportedSynthesizer(multi) as ex:
        assert ex.meta["platforms"] == ["cpu", "tpu"]
        r = ex.synthesize(["hello"], vocode=False)
    live = Synthesizer.from_checkpoint(ckpt_path)
    r2 = live.synthesize(["hello"], vocode=False)
    assert r.mels[0].shape == r2.mels[0].shape
    np.testing.assert_allclose(r.mels[0], r2.mels[0], atol=1e-6)


def test_serve_from_artifact(artifact):
    """`fs2t serve model.fs2x`: the HTTP server runs on the exported
    program set — health, mel and wav formats, low_latency rejected."""
    import json as _json
    import urllib.request

    from fastspeech2_lightning_tpu.serving.server import serve

    art, _ckpt, _voc = artifact
    srv = serve(str(art), port=0, max_batch=2, warmup=True)
    srv.start()
    try:
        host, port = srv.address
        base = f"http://{host}:{port}"
        with urllib.request.urlopen(f"{base}/health", timeout=30) as r:
            body = _json.loads(r.read())
        assert body["status"] == "ok" and body["has_vocoder"] is True

        def post(payload):
            req = urllib.request.Request(
                f"{base}/synthesize",
                data=_json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            return urllib.request.urlopen(req, timeout=300)

        with post({"text": "hello world", "format": "mel"}) as r:
            assert r.status == 200
            assert len(r.read()) > 0
        with post({"text": "hello world"}) as r:  # wav
            data = r.read()
            assert data[:4] == b"RIFF"
        # low_latency works from the artifact (streaming programs exported)
        with post({"text": "hello", "low_latency": True}) as r:
            data = r.read()
            assert data[:4] == b"RIFF"
        import urllib.error

        # a window that was not exported fails loudly
        with pytest.raises(urllib.error.HTTPError) as err:
            post({"text": "hello", "low_latency": True, "window": 64})
        assert err.value.code == 400
    finally:
        srv.shutdown()


def test_exported_streaming_matches_full_vocode(artifact):
    """synthesize_stream from the artifact: for mels longer than the
    window slice, the concatenated stream equals full-mel vocoding of the
    same (trimmed) mel — the windowed_vocode receptive-field contract."""
    import jax.numpy as jnp

    from fastspeech2_lightning_tpu.models.hifigan import (
        hifigan_generator,
        load_vocoder_params,
    )
    from fastspeech2_lightning_tpu.synthesis.exported import (
        ExportedSynthesizer,
    )

    art, _ckpt, voc_path = artifact
    with ExportedSynthesizer(art) as ex:
        margin = ex.meta["vocoder_meta"]["margin"]
        W = 128 + 2 * margin
        # duration_control inflates the stub model's tiny durations so the
        # mel comfortably exceeds one window slice
        kwargs = dict(duration_control=40.0)
        mel = ex.synthesize(
            ["hello world"], vocode=False, **kwargs
        ).mels[0]
        assert mel.shape[0] > W, f"need T>{W}, got {mel.shape[0]}"
        segs = list(ex.synthesize_stream("hello world", window=128, **kwargs))
        stream = np.concatenate(segs)
    vp, vcfg, _ = load_vocoder_params(voc_path)
    full = np.asarray(hifigan_generator(vp, jnp.asarray(mel[None]), vcfg))[0]
    assert stream.shape == full.shape
    np.testing.assert_allclose(stream, full, atol=2e-5)

    with ExportedSynthesizer(art) as ex:
        with pytest.raises(ValueError, match="was not exported"):
            list(ex.synthesize_stream("hello", window=64))


def test_serve_artifact_rejects_checkpoint_flags(artifact):
    from fastspeech2_lightning_tpu.serving.server import serve

    art, _ckpt, voc_path = artifact
    with pytest.raises(ValueError, match="fixed at export time"):
        serve(str(art), vocoder_path=str(voc_path))


def test_cli_export_serving(artifact, tmp_path):
    art, ckpt_path, voc_path = artifact
    from click.testing import CliRunner

    from fastspeech2_lightning_tpu.cli import app

    out = tmp_path / "cli.fs2x"
    res = CliRunner().invoke(
        app,
        [
            "export-serving", str(ckpt_path), "-o", str(out),
            "-v", str(voc_path), "-b", "1",
            "--text-bucket", "16", "--max-frames", "256",
        ],
    )
    assert res.exit_code == 0, res.output
    assert out.exists()
    assert "exported serving artifact" in res.output
