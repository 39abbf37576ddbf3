"""Config system tests: defaults, partial composition, overrides, versioning
(mirrors the reference's config tests, fs2/tests/test_loading.py:174-203)."""

from pathlib import Path

import pytest

from fastspeech2_lightning_tpu.config import (
    FastSpeech2Config,
    LATEST_VERSION,
    apply_overrides,
    load_config_base_command,
)

SHARED_DATA = """
audio: {n_fft: 1024, fft_hop_size: 256, fft_window_size: 1024, n_mels: 80,
  input_sampling_rate: 22050, output_sampling_rate: 22050,
  max_audio_length: 11.0, min_audio_length: 0.4, spec_type: mel-librosa,
  f_min: 0, f_max: 8000}
save_dir: ./preprocessed
"""

SHARED_TEXT = """
cleaners: [everyvoice.utils.lower, everyvoice.utils.collapse_whitespace, everyvoice.utils.nfc_normalize]
symbols:
  dataset_0-symbols: [' ', a, b, c, d, e, f, g, h, i]
  pad: _
  silence: [<SIL>]
"""

MAIN = """
contact: {contact_name: Test, contact_email: info@example.com}
model:
  encoder: {layers: 2, heads: 2, input_dim: 64, feedforward_dim: 128, conv_kernel_size: 9, dropout: 0.2}
  decoder: {layers: 2, heads: 2, input_dim: 64, feedforward_dim: 128, conv_kernel_size: 9, dropout: 0.2}
  learn_alignment: true
path_to_preprocessing_config_file: shared-data.yaml
path_to_text_config_file: shared-text.yaml
training:
  batch_size: 4
  optimizer: {learning_rate: 0.0001, warmup_steps: 100}
"""


@pytest.fixture
def config_dir(tmp_path: Path) -> Path:
    (tmp_path / "shared-data.yaml").write_text(SHARED_DATA)
    (tmp_path / "shared-text.yaml").write_text(SHARED_TEXT)
    (tmp_path / "main.yaml").write_text(MAIN)
    return tmp_path


def test_defaults():
    cfg = FastSpeech2Config()
    assert cfg.model.encoder.layers == 4
    assert cfg.model.learn_alignment is True
    assert cfg.training.optimizer.name == "noam"
    assert cfg.VERSION == LATEST_VERSION


def test_partial_composition(config_dir: Path):
    cfg = FastSpeech2Config.load_config_from_path(config_dir / "main.yaml")
    # from partials
    assert cfg.preprocessing.audio.n_mels == 80
    assert "dataset_0-symbols" in cfg.text.symbols
    assert cfg.text.cleaners == ["lower", "collapse_whitespace", "nfc_normalize"]
    # inline values survive
    assert cfg.model.encoder.input_dim == 64
    assert cfg.training.batch_size == 4
    # relative save_dir resolved against the partial file location
    assert cfg.preprocessing.save_dir.is_absolute()


def test_cli_overrides(config_dir: Path):
    cfg = load_config_base_command(
        config_dir / "main.yaml",
        ["training.batch_size=2", "model.encoder.layers=1", "model.use_postnet=false"],
    )
    assert cfg.training.batch_size == 2
    assert cfg.model.encoder.layers == 1
    assert cfg.model.use_postnet is False


def test_version_upgrade():
    cfg = FastSpeech2Config.model_validate({"VERSION": "0.5"})
    assert cfg.VERSION == "1.0"


def test_newer_version_rejected():
    with pytest.raises(ValueError, match="newer version"):
        FastSpeech2Config.model_validate({"VERSION": "99.0"})


def test_apply_overrides_types():
    d = {"a": {"b": 1}}
    apply_overrides(d, ["a.b=2", "a.c=hello", "a.d=1.5", "a.e=[1,2]"])
    assert d["a"] == {"b": 2, "c": "hello", "d": 1.5, "e": [1, 2]}


def test_checkpoint_dump_roundtrip():
    cfg = FastSpeech2Config()
    dump = cfg.model_checkpoint_dump()
    cfg2 = FastSpeech2Config.model_validate(dump)
    assert cfg2.model.encoder.layers == cfg.model.encoder.layers
