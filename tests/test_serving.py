"""Streaming synthesis server: health, wav chunked streaming, mel format,
cross-request micro-batching, and error paths. The server is started on an
ephemeral port with a stubbed model + vocoder (testing.py fixture kit)."""

import json
import struct
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from fastspeech2_lightning_tpu.serving.server import (
    SynthesisServer,
    pcm16,
    wav_stream_header,
)
from fastspeech2_lightning_tpu.synthesis.api import Synthesizer
from fastspeech2_lightning_tpu.testing import get_stubbed_model, get_stubbed_vocoder


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("serving")
    _model, ckpt = get_stubbed_model(root)
    _voc, voc_path = get_stubbed_vocoder(root)
    syn = Synthesizer.from_checkpoint(ckpt, vocoder_path=voc_path, max_frames=128)
    srv = SynthesisServer(syn, host="127.0.0.1", port=0, max_batch=4,
                          batch_window_ms=20.0, global_step=7)
    srv.start()
    yield srv
    srv.shutdown()


def _url(server, path):
    host, port = server.address
    return f"http://{host}:{port}{path}"


def _post(server, payload, path="/synthesize"):
    req = urllib.request.Request(
        _url(server, path),
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    return urllib.request.urlopen(req, timeout=300)


def test_health(server):
    with urllib.request.urlopen(_url(server, "/health"), timeout=30) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["global_step"] == 7
    assert body["has_vocoder"] is True
    assert body["sample_rate"] == 22050


def test_wav_streaming(server):
    with _post(server, {"text": "hello world"}) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        data = r.read()
    # RIFF streaming header + nonempty PCM16 payload
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    assert struct.unpack("<I", data[4:8])[0] == 0xFFFFFFFF
    pcm = data[44:]
    assert len(pcm) > 0 and len(pcm) % 2 == 0
    samples = np.frombuffer(pcm, dtype="<i2")
    assert np.abs(samples).max() <= 32767


def test_mel_format(server):
    with _post(server, {"text": "hello world", "format": "mel"}) as r:
        chunks = int(r.headers["X-Chunks"])
        buf = r.read()
    import io

    mel = np.load(io.BytesIO(buf))
    assert chunks >= 1
    assert mel.ndim == 2 and mel.shape[1] == 20 and mel.shape[0] > 0
    assert mel.dtype == np.float32


def test_long_text_is_chunked_and_reassembled(server):
    long_text = ". ".join(["the quick brown fox jumps over the lazy dog"] * 6)
    with _post(server, {"text": long_text}) as r:
        chunks = int(r.headers["X-Chunks"])
        data = r.read()
    assert chunks > 1
    assert len(data) > 44


def test_concurrent_requests_microbatch(server):
    def one(i):
        with _post(server, {"text": f"concurrent request number {i}"}) as r:
            return r.read()

    with ThreadPoolExecutor(max_workers=4) as ex:
        outs = list(ex.map(one, range(4)))
    assert all(len(o) > 44 for o in outs)


def test_error_paths(server):
    # unknown path
    try:
        _post(server, {"text": "x"}, path="/nope")
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 404
    assert raised
    # missing text
    try:
        _post(server, {})
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
    assert raised
    # unknown speaker/language error instead of silently conditioning on
    # id 0 (reference fs2/cli/synthesize.py:28-72 semantics)
    for payload in (
        {"text": "hi", "speaker": "nobody"},
        {"text": "hi", "language": "klingon"},
    ):
        try:
            _post(server, payload)
            raised = False
        except urllib.error.HTTPError as e:
            raised = e.code in (400, 500) and b"unknown" in e.read()
        assert raised, payload


def test_serve_style_reference(tmp_path):
    """serve(--style-reference): GST conditioning applied to every request;
    output differs from the unstyled server for the same text."""
    from fastspeech2_lightning_tpu.preprocessing.pipeline import save_wav
    from fastspeech2_lightning_tpu.serving.server import serve
    from fastspeech2_lightning_tpu.testing import stub_config

    sr = 22050
    t = np.arange(sr // 2) / sr
    ref = tmp_path / "ref.wav"
    save_wav(ref, (0.3 * np.sin(2 * np.pi * 330 * t)).astype(np.float32), sr)
    cfg = stub_config(use_global_style_token_module=True)
    _, ckpt = get_stubbed_model(tmp_path / "m", config=cfg)

    def fetch_mel(srv):
        with _post(srv, {"text": "hello", "format": "mel"}) as r:
            from io import BytesIO

            return np.load(BytesIO(r.read()))

    def bias_durations(srv):
        # the random stub predicts logd < 0 (zero frames -> vacuous mels);
        # bias the duration head positive so mels have content to compare
        srv.synthesizer.variables["params"]["variance_adaptor"][
            "duration_predictor"
        ]["linear"]["bias"] += 1.0

    srv_plain = serve(ckpt, port=0, max_batch=2, max_frames=64)
    bias_durations(srv_plain)
    srv_plain.start()
    try:
        plain = fetch_mel(srv_plain)
    finally:
        srv_plain.shutdown()
    srv_styled = serve(
        ckpt, port=0, max_batch=2, max_frames=64, style_reference=ref
    )
    bias_durations(srv_styled)
    srv_styled.start()
    try:
        styled = fetch_mel(srv_styled)
    finally:
        srv_styled.shutdown()
    n = min(len(plain), len(styled))
    assert n > 0, "stub produced an empty mel — styled/unstyled incomparable"
    assert not np.allclose(plain[:n], styled[:n])


def test_pcm16_and_header_helpers():
    hdr = wav_stream_header(16000)
    assert len(hdr) == 44
    assert struct.unpack("<I", hdr[24:28])[0] == 16000
    pcm = pcm16(np.array([0.0, 1.0, -1.0, 2.0]))
    vals = np.frombuffer(pcm, dtype="<i2")
    np.testing.assert_array_equal(vals, [0, 32767, -32767, 32767])


def test_adaptive_frame_buckets_match_fixed(tmp_path):
    """Adaptive target-length bucketing must be output-identical to running
    at max_frames (short input -> small bucket; duration-total check)."""
    from fastspeech2_lightning_tpu.testing import get_stubbed_model

    _, ckpt = get_stubbed_model(tmp_path)
    syn = Synthesizer.from_checkpoint(ckpt, max_frames=256)
    texts = ["abc"]  # short: 12 * L rounds to a bucket below max_frames
    fixed = syn.synthesize(texts, adaptive_max_frames=False)
    adaptive = syn.synthesize(texts, adaptive_max_frames=True)
    assert len(fixed.mels) == len(adaptive.mels) == 1
    assert fixed.mels[0].shape == adaptive.mels[0].shape
    np.testing.assert_allclose(
        fixed.mels[0], adaptive.mels[0], atol=1e-5, rtol=1e-5
    )
    np.testing.assert_array_equal(fixed.durations[0], adaptive.durations[0])


def test_serve_data_parallel_mesh(tmp_path):
    """serve(data_parallel=N) builds a Synthesizer with an N-wide data mesh
    and answers a request (rows shard across virtual devices)."""
    import io

    from fastspeech2_lightning_tpu.serving.server import serve

    _model, ckpt = get_stubbed_model(tmp_path)
    srv = serve(ckpt, port=0, max_batch=4, data_parallel=2, max_frames=128)
    try:
        srv.start()
        assert srv.synthesizer.mesh is not None
        assert srv.synthesizer.mesh.shape["data"] == 2
        body = json.dumps({"text": "abc", "format": "mel"}).encode()
        req = urllib.request.Request(
            f"http://{srv.address[0]}:{srv.address[1]}/synthesize",
            data=body, headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as resp:
            assert resp.status == 200
            mel = np.load(io.BytesIO(resp.read()))
        assert mel.ndim == 2 and mel.shape[0] > 0
    finally:
        srv.shutdown()


def test_warmup_precompiles_serving_buckets(tmp_path):
    """Synthesizer.warmup visits the (batch, text-bucket, frame-bucket)
    shape set so a following synthesize call hits only warm programs."""
    from fastspeech2_lightning_tpu.testing import get_stubbed_vocoder

    _, ckpt = get_stubbed_model(tmp_path)
    _voc, voc_path = get_stubbed_vocoder(tmp_path)
    syn = Synthesizer.from_checkpoint(ckpt, vocoder_path=voc_path, max_frames=128)
    n = syn.warmup(batch_size=2, text_buckets=[16, 32])
    # 2 acoustic buckets (both estimate to the 128 cap) + vocoder buckets
    assert n >= 3
    # both frame buckets' programs are resident
    assert ("fn", 128) in syn._predict_cache
    before = set(syn._predict_cache)
    out = syn.synthesize(["ab", "cd"])  # L rounds to 16 -> warmed bucket
    assert set(syn._predict_cache) == before
    assert out.wavs is not None and len(out.wavs) == 2


def test_stats_endpoint(tmp_path):
    """GET /stats reports request/batch counters and occupancy after real
    traffic has flowed through the micro-batcher."""
    import io

    from fastspeech2_lightning_tpu.serving.server import serve

    _, ckpt = get_stubbed_model(tmp_path)
    srv = serve(ckpt, port=0, max_batch=4, max_frames=128)
    try:
        srv.start()
        base = f"http://{srv.address[0]}:{srv.address[1]}"
        body = json.dumps({"text": "abc", "format": "mel"}).encode()
        req = urllib.request.Request(
            f"{base}/synthesize", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as resp:
            np.load(io.BytesIO(resp.read()))
        with urllib.request.urlopen(f"{base}/stats", timeout=30) as resp:
            stats = json.loads(resp.read())
        assert stats["requests"] == 1
        assert stats["chunks"] >= 1
        assert stats["batches_dispatched"] >= 1
        assert 0 < stats["batch_occupancy"] <= 1
        assert stats["batch_ms"]["p50"] > 0
        assert stats["uptime_s"] > 0
        assert "request_errors" not in stats
    finally:
        srv.shutdown()


def test_serve_pfs_level_model(tmp_path):
    """A phonological_features-level model serves through the HTTP server:
    the request path builds pfs matrices via the same articulatory table the
    dataset path uses (parity with the reference's single predict path,
    fs2/dataset.py:155-174)."""
    import io

    from fastspeech2_lightning_tpu.serving.server import serve
    from fastspeech2_lightning_tpu.testing import stub_config

    cfg = stub_config(
        target_text_representation_level="phonological_features"
    )
    cfg.text.g2p_engines = {"default": "english"}
    _, ckpt = get_stubbed_model(tmp_path, config=cfg)
    srv = serve(ckpt, port=0, max_batch=4, max_frames=64)
    try:
        srv.start()
        base = f"http://{srv.address[0]}:{srv.address[1]}"
        body = json.dumps({"text": "abc", "format": "mel"}).encode()
        req = urllib.request.Request(
            f"{base}/synthesize", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as resp:
            mel = np.load(io.BytesIO(resp.read()))
        assert mel.ndim == 2 and mel.shape[0] > 0
    finally:
        srv.shutdown()
