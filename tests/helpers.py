"""Shared test fixtures: tiny configs, stats, synthetic batches."""

import numpy as np

from fastspeech2_lightning_tpu.config import FastSpeech2Config
from fastspeech2_lightning_tpu.type_definitions import Stats, StatsInfo


def tiny_config(**model_overrides) -> FastSpeech2Config:
    cfg = FastSpeech2Config.model_validate(
        {
            "model": {
                "encoder": {
                    "layers": 1,
                    "heads": 2,
                    "input_dim": 32,
                    "feedforward_dim": 64,
                    "conv_kernel_size": 3,
                    "dropout": 0.1,
                },
                "decoder": {
                    "layers": 1,
                    "heads": 2,
                    "input_dim": 32,
                    "feedforward_dim": 64,
                    "conv_kernel_size": 3,
                    "dropout": 0.1,
                },
                "variance_predictors": {
                    "energy": {"input_dim": 32, "n_layers": 2, "n_bins": 16},
                    "pitch": {"input_dim": 32, "n_layers": 2, "n_bins": 16},
                    "duration": {"input_dim": 32, "n_layers": 2, "n_bins": 16},
                },
                "max_mel_length": 64,
                **model_overrides,
            },
            "preprocessing": {"audio": {"n_mels": 20}},
            "text": {"symbols": {"letters": list("abcdefghijklmnopqrstuvwxyz")}},
            "training": {"batch_size": 2},
        }
    )
    return cfg


def tiny_stats() -> Stats:
    si = dict(min=-2.0, max=2.0, std=1.0, mean=0.0, norm_min=-2.0, norm_max=2.0)
    return Stats(
        pitch=StatsInfo(**si),
        energy=StatsInfo(**si),
        character_length=StatsInfo(
            min=5, max=40, std=8.0, mean=20.0, norm_min=5, norm_max=40
        ),
    )


def synthetic_batch(
    rng: np.random.Generator,
    B: int = 2,
    L: int = 12,
    T: int = 48,
    n_mels: int = 20,
    n_symbols: int = 30,
    learn_alignment: bool = True,
    inference: bool = False,
):
    src_lens = rng.integers(L // 2, L + 1, size=B).astype(np.int32)
    src_lens[0] = L
    mel_lens = rng.integers(T // 2, T + 1, size=B).astype(np.int32)
    mel_lens[0] = T
    text = np.zeros((B, L), dtype=np.int32)
    for b in range(B):
        text[b, : src_lens[b]] = rng.integers(1, n_symbols, size=src_lens[b])
    batch = {
        "text": text,
        "src_lens": src_lens,
        "speaker_id": np.zeros(B, dtype=np.int32),
        "language_id": np.zeros(B, dtype=np.int32),
    }
    if inference:
        batch["mel"] = None
        batch["mel_lens"] = None
        return batch

    mel = rng.standard_normal((B, T, n_mels)).astype(np.float32)
    for b in range(B):
        mel[b, mel_lens[b]:] = 0.0
    # When alignment is learned, pitch/energy targets are frame-level [B, T]
    # (averaged to phones on the fly); with precomputed durations and
    # phone-level variances they are stored phone-level [B, L]
    # (fs2/variance_adaptor.py:269-288 and fs2/model.py:465-475).
    var_len = T if learn_alignment else L
    var_lens = mel_lens if learn_alignment else src_lens
    pitch = rng.standard_normal((B, var_len)).astype(np.float32)
    energy = np.abs(rng.standard_normal((B, var_len))).astype(np.float32)
    for b in range(B):
        pitch[b, var_lens[b]:] = 0.0
        energy[b, var_lens[b]:] = 0.0
    batch.update({"mel": mel, "mel_lens": mel_lens, "pitch": pitch, "energy": energy})

    if learn_alignment:
        # beta-binomial-ish diagonal prior
        prior = np.zeros((B, T, L), dtype=np.float32)
        for b in range(B):
            tl, ll = mel_lens[b], src_lens[b]
            for t in range(tl):
                center = t / max(tl - 1, 1) * (ll - 1)
                prior[b, t, :ll] = np.exp(
                    -((np.arange(ll) - center) ** 2) / (2 * (ll / 6 + 1) ** 2)
                )
                prior[b, t, :ll] /= prior[b, t, :ll].sum()
        batch["attn_prior"] = prior
    else:
        # oracle durations summing exactly to mel_lens
        durs = np.zeros((B, L), dtype=np.int32)
        for b in range(B):
            ll = src_lens[b]
            base = mel_lens[b] // ll
            durs[b, :ll] = base
            durs[b, ll - 1] += mel_lens[b] - base * ll
        batch["duration"] = durs
    return batch


def make_training_workspace(
    tmp_path,
    n_utts: int = 4,
    model_overrides: dict | None = None,
    text_overrides: dict | None = None,
    **training_overrides,
):
    """Tiny end-to-end workspace: writes wavs + filelist, runs `preprocess`,
    and returns the loaded FastSpeech2Config (save_dir etc. under tmp_path)."""
    import yaml
    from click.testing import CliRunner

    from fastspeech2_lightning_tpu.cli import app
    from fastspeech2_lightning_tpu.preprocessing.pipeline import save_wav
    from fastspeech2_lightning_tpu.utils import write_filelist

    SR = 22050
    wav_dir = tmp_path / "wavs"
    rows = []
    for i in range(n_utts):
        t = np.arange(int(0.5 * SR)) / SR
        save_wav(
            wav_dir / f"utt{i}.wav",
            (0.4 * np.sin(2 * np.pi * (150 + 30 * i) * t)).astype(np.float32),
            SR,
        )
        rows.append({"basename": f"utt{i}", "characters": "ab cd",
                     "language": "default", "speaker": "default"})
    write_filelist(rows, tmp_path / "filelist.psv")
    config = {
        "model": {
            "encoder": {"layers": 1, "heads": 2, "input_dim": 32,
                        "feedforward_dim": 64, "conv_kernel_size": 3},
            "decoder": {"layers": 1, "heads": 2, "input_dim": 32,
                        "feedforward_dim": 64, "conv_kernel_size": 3},
            "variance_predictors": {
                "energy": {"input_dim": 32, "n_layers": 1, "n_bins": 16},
                "pitch": {"input_dim": 32, "n_layers": 1, "n_bins": 16},
                "duration": {"input_dim": 32, "n_layers": 1, "n_bins": 16}},
            "max_mel_length": 64, "use_postnet": False,
            **(model_overrides or {})},
        "preprocessing": {"save_dir": str(tmp_path / "pre"), "train_split": 0.75,
            "audio": {"n_mels": 20},
            "source_data": [{"data_dir": str(wav_dir),
                             "filelist": str(tmp_path / "filelist.psv")}]},
        "text": {"symbols": {"letters": list("abcd")},
                 **(text_overrides or {})},
        "training": {"batch_size": 2, "bucket_count": 1,
            "training_filelist": str(tmp_path / "pre" / "training_filelist.psv"),
            "validation_filelist": str(tmp_path / "pre" / "validation_filelist.psv"),
            "logger": {"save_dir": str(tmp_path / "logs")},
            "optimizer": {"warmup_steps": 5},
            **training_overrides},
    }
    (tmp_path / "config.yaml").write_text(yaml.safe_dump(config))
    result = CliRunner().invoke(
        app, ["preprocess", str(tmp_path / "config.yaml"), "--cpus", "1"]
    )
    assert result.exit_code == 0, result.output

    from fastspeech2_lightning_tpu.config import FastSpeech2Config

    return FastSpeech2Config.load_config_from_path(tmp_path / "config.yaml")
