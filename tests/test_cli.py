"""CLI tests (click CliRunner — parity with fs2/tests/test_cli.py patterns)
plus the full end-to-end slice: preprocess -> train -> synthesize -> check-data
on a tiny synthetic corpus."""

import json

import numpy as np
import pytest
from click.testing import CliRunner

from fastspeech2_lightning_tpu.cli import app
from fastspeech2_lightning_tpu.preprocessing.pipeline import save_wav
from fastspeech2_lightning_tpu.utils import write_filelist

SR = 22050


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    """Tiny corpus + composed config files on disk."""
    root = tmp_path_factory.mktemp("corpus")
    wav_dir = root / "wavs"
    rng = np.random.default_rng(0)
    rows = []
    sentences = [
        "hello world", "the quick brown fox", "jumps over the lazy dog",
        "pack my box", "with five dozen", "liquor jugs now",
    ]
    for i, sentence in enumerate(sentences):
        freq = 140 + 30 * i
        seconds = 0.6 + 0.1 * i
        t = np.arange(int(seconds * SR)) / SR
        audio = (
            0.4 * np.sin(2 * np.pi * freq * t)
            + 0.2 * np.sin(2 * np.pi * 2 * freq * t)
        ).astype(np.float32)
        audio += 0.01 * rng.standard_normal(len(audio)).astype(np.float32)
        save_wav(wav_dir / f"utt{i}.wav", audio, SR)
        rows.append(
            {
                "basename": f"utt{i}",
                "characters": sentence,
                "language": "default",
                "speaker": "default",
            }
        )
    write_filelist(rows, root / "filelist.psv")

    config = {
        "model": {
            "encoder": {"layers": 1, "heads": 2, "input_dim": 32,
                        "feedforward_dim": 64, "conv_kernel_size": 3},
            "decoder": {"layers": 1, "heads": 2, "input_dim": 32,
                        "feedforward_dim": 64, "conv_kernel_size": 3},
            "variance_predictors": {
                "energy": {"input_dim": 32, "n_layers": 1, "n_bins": 16},
                "pitch": {"input_dim": 32, "n_layers": 1, "n_bins": 16},
                "duration": {"input_dim": 32, "n_layers": 1, "n_bins": 16},
            },
            "learn_alignment": True,
            "max_mel_length": 128,
            "use_postnet": True,
        },
        "preprocessing": {
            "save_dir": str(root / "preprocessed"),
            "train_split": 0.8,
            "source_data": [
                {"data_dir": str(wav_dir), "filelist": str(root / "filelist.psv")}
            ],
            "audio": {"n_mels": 20},
        },
        "text": {
            "symbols": {"letters": list("abcdefghijklmnopqrstuvwxyz")}
        },
        "training": {
            "batch_size": 2,
            "bucket_count": 1,
            "training_filelist": str(root / "preprocessed" / "training_filelist.psv"),
            "validation_filelist": str(root / "preprocessed" / "validation_filelist.psv"),
            "logger": {"save_dir": str(root / "logs")},
            "val_check_interval": 2,
            "optimizer": {"warmup_steps": 10},
        },
    }
    import yaml

    (root / "config.yaml").write_text(yaml.safe_dump(config))
    return root


def test_help_lists_subcommands():
    runner = CliRunner()
    result = runner.invoke(app, ["--help"])
    assert result.exit_code == 0
    for cmd in ("benchmark", "preprocess", "synthesize", "train", "check-data"):
        assert cmd in result.output


def test_synthesize_arg_validation(corpus_dir):
    runner = CliRunner()
    # missing both text and filelist
    result = runner.invoke(app, ["synthesize", str(corpus_dir / "config.yaml")])
    assert result.exit_code != 0
    assert "either --text or --filelist" in result.output


@pytest.mark.slow
def test_end_to_end(corpus_dir):
    runner = CliRunner()
    # 1. preprocess
    result = runner.invoke(
        app, ["preprocess", str(corpus_dir / "config.yaml"), "--cpus", "1"]
    )
    assert result.exit_code == 0, result.output
    save_dir = corpus_dir / "preprocessed"
    assert (save_dir / "stats.json").exists()
    assert (save_dir / "training_filelist.psv").exists()

    # 2. train 4 steps with config overrides
    result = runner.invoke(
        app,
        [
            "train", str(corpus_dir / "config.yaml"),
            "--max-steps", "4",
            "-c", "training.seed=1",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    ckpts = list((corpus_dir / "logs" / "BaseExperiment" / "base" / "checkpoints").glob("step=*"))
    assert ckpts, "no checkpoint written"
    ckpt = sorted(ckpts, key=lambda p: int(p.name.split("=")[1]))[-1]
    meta = json.loads((ckpt / "meta.json").read_text())
    assert meta["model_info"] == {"name": "FastSpeech2", "version": "1.2"}
    assert meta["global_step"] >= 4

    # 3. synthesize spec + textgrid from text
    out_dir = corpus_dir / "synthesis_output"
    result = runner.invoke(
        app,
        [
            "synthesize", str(ckpt),
            "-t", "hello world",
            "-O", "spec", "-O", "textgrid", "-O", "readalong-xml",
            "-o", str(out_dir),
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    specs = list((out_dir / "synthesized_spec").glob("*.npy"))
    assert len(specs) == 1
    assert np.load(specs[0]).shape[0] == 20  # [K, T]
    assert list((out_dir / "textgrids").glob("*.TextGrid"))
    assert list((out_dir / "readalongs").glob("*.readalong"))

    # 3b. teacher-forced synthesis: target specs/variances come from the
    # preprocessed --teacher-forcing-directory; chunking is forced off and
    # the output length is pinned to the target mel length
    # (fs2/cli/synthesize.py:434-442 semantics)
    import csv

    train_rows = list(
        csv.DictReader(
            (save_dir / "training_filelist.psv").open(), delimiter="|"
        )
    )
    tf_base = train_rows[0]["basename"]
    tf_filelist = corpus_dir / "tf_filelist.psv"
    with tf_filelist.open("w") as f:
        w = csv.DictWriter(f, fieldnames=train_rows[0].keys(), delimiter="|")
        w.writeheader()
        w.writerow(train_rows[0])
    gt_spec_path = (
        save_dir / "spec"
        / f"{tf_base}--default--default--spec-{SR}-mel-librosa.npy"
    )
    assert gt_spec_path.exists(), list((save_dir / "spec").glob("*"))
    gt_frames = np.load(gt_spec_path).shape[1]  # artifact is [n_mels, T]
    tf_out = corpus_dir / "tf_output"
    result = runner.invoke(
        app,
        [
            "synthesize", str(ckpt),
            "--filelist", str(tf_filelist),
            "--teacher-forcing-directory", str(save_dir),
            "-O", "spec",
            "-o", str(tf_out),
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    tf_specs = list((tf_out / "synthesized_spec").glob("*.npy"))
    assert len(tf_specs) == 1
    assert np.load(tf_specs[0]).shape == (20, gt_frames)

    # 4. check-data with model scoring
    result = runner.invoke(
        app,
        [
            "check-data", str(corpus_dir / "config.yaml"),
            "--model-path", str(ckpt),
            "-o", str(corpus_dir / "checked_data"),
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    checked = json.loads((corpus_dir / "checked_data" / "checked-data.json").read_text())
    assert len(checked) == 6
    assert all("pitch_mean" in c and "speaking_rate_words_per_second" in c for c in checked)
    scores = list((corpus_dir / "checked_data").glob("scores-*.psv"))
    assert scores
    content = scores[0].read_text()
    assert "total_loss" in content

    # 4b. benchmark command (fs2/cli/benchmark.py semantics)
    result = runner.invoke(
        app,
        [
            "benchmark", str(corpus_dir / "config.yaml"),
            "--benchmark-type", "training",
            "--warmup-reps", "1", "--repetitions", "2",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert "Average forward pass" in result.output

    # 5. resume training from checkpoint
    result = runner.invoke(
        app,
        ["train", str(corpus_dir / "config.yaml"), "--max-steps", "6"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    steps = [
        int(p.name.split("=")[1])
        for p in (corpus_dir / "logs" / "BaseExperiment" / "base" / "checkpoints").glob("step=*")
    ]
    assert max(steps) >= 6
