"""Loading a reference PyTorch Lightning .ckpt FILE directly.

The reference embeds config/stats/lookups in hyper_parameters
(fs2/model.py:369-378 via save_hyperparameters) and the weights in
state_dict; load_model_from_checkpoint + Synthesizer accept such a file
and convert it on the fly (models/torch_import.py::
load_reference_lightning_checkpoint), so reference users synthesize from
their existing checkpoints with no conversion step.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from fastspeech2_lightning_tpu import MODEL_VERSION  # noqa: E402
from fastspeech2_lightning_tpu.text import TextProcessor  # noqa: E402

from helpers import tiny_config, tiny_stats  # noqa: E402
from torch_replica import TorchReferenceFastSpeech2  # noqa: E402


def _make_ckpt(tmp_path, version=MODEL_VERSION, multispeaker=False, multilingual=False):
    cfg = tiny_config(
        learn_alignment=True,
        use_postnet=True,
        multispeaker=multispeaker,
        multilingual=multilingual,
        dtype="float32",
        max_mel_length=64,
    )
    stats = tiny_stats()
    n_symbols = len(TextProcessor(cfg.text).symbols)
    torch.manual_seed(1)
    replica = TorchReferenceFastSpeech2(
        cfg,
        stats,
        n_symbols=n_symbols,
        n_speakers=2 if multispeaker else 1,
        n_languages=2 if multilingual else 1,
    ).eval()
    ckpt = {
        "state_dict": replica.state_dict(),
        "hyper_parameters": {
            "config": cfg.model_dump(mode="json"),
            "stats": stats.model_dump(mode="json"),
            "lang2id": {"default": 0, "l2": 1} if multilingual else {"default": 0},
            "speaker2id": {"default": 0, "spk2": 1} if multispeaker else {"default": 0},
        },
        "model_info": {"name": "FastSpeech2", "version": version},
        "global_step": 77,
    }
    path = tmp_path / "last.ckpt"
    torch.save(ckpt, path)
    return path, cfg, n_symbols


def test_load_model_from_reference_ckpt_file(tmp_path):
    from fastspeech2_lightning_tpu.synthesis.synthesize import (
        load_model_from_checkpoint,
    )

    path, cfg, n_symbols = _make_ckpt(tmp_path)
    model, variables, config, stats, lang2id, speaker2id, step = (
        load_model_from_checkpoint(path)
    )
    assert step == 77
    assert lang2id == {"default": 0}
    assert config.model.use_postnet
    assert variables["params"]["text_input_layer"]["embedding"].shape[0] == n_symbols
    # bit-exact variance bins travel via the constants collection
    assert "variance_adaptor" in variables["constants"]
    # EMA only exists for checkpoints trained here
    with pytest.raises(ValueError, match="use-ema"):
        load_model_from_checkpoint(path, use_ema=True)


def test_synthesizer_from_reference_ckpt_file(tmp_path):
    from fastspeech2_lightning_tpu.synthesis.api import Synthesizer

    path, cfg, _ = _make_ckpt(tmp_path)
    synth = Synthesizer.from_checkpoint(path)
    result = synth.synthesize(["abc def"], adaptive_max_frames=True)
    mel = result.mels[0]
    assert mel.ndim == 2 and mel.shape[1] == cfg.preprocessing.audio.n_mels
    assert mel.shape[0] >= 1
    assert np.all(np.isfinite(mel))
    assert result.durations[0].sum() == mel.shape[0]


def test_multispeaker_multilingual_ckpt(tmp_path):
    """Speaker/language embeddings travel, and conditioning changes output."""
    from fastspeech2_lightning_tpu.synthesis.api import Synthesizer

    path, cfg, _ = _make_ckpt(tmp_path, multispeaker=True, multilingual=True)
    synth = Synthesizer.from_checkpoint(path)
    assert synth.speaker2id == {"default": 0, "spk2": 1}
    assert synth.lang2id == {"default": 0, "l2": 1}
    a = synth.synthesize(["abc"], speaker="default", language="default")
    b = synth.synthesize(["abc"], speaker="spk2", language="l2")
    # different embedding rows must change the mel (same text)
    if a.mels[0].shape == b.mels[0].shape:
        assert not np.allclose(a.mels[0], b.mels[0])


def test_older_version_ckpt_migrates(tmp_path):
    """A 1.1 character-level ckpt goes through the symbol remap (identity
    here — same inventory) and loads (fs2/model.py:313-349 semantics)."""
    from fastspeech2_lightning_tpu.synthesis.synthesize import (
        load_model_from_checkpoint,
    )

    path, cfg, n_symbols = _make_ckpt(tmp_path, version="1.1")
    model, variables, config, *_ = load_model_from_checkpoint(path)
    assert variables["params"]["text_input_layer"]["embedding"].shape[0] == n_symbols


def test_newer_version_ckpt_rejected(tmp_path):
    from fastspeech2_lightning_tpu.synthesis.synthesize import (
        load_model_from_checkpoint,
    )

    path, *_ = _make_ckpt(tmp_path, version="99.0")
    with pytest.raises(ValueError, match="newer version"):
        load_model_from_checkpoint(path)
