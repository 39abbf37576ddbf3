"""Test fixture kit (re-provides the everyvoice.tests stub surface the
reference's tests rely on — SURVEY.md §2.2: get_stubbed_model,
get_stubbed_vocoder): tiny real checkpoints on disk with random weights so
load paths and the wav-writing callback run a real forward."""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import jax
import numpy as np

from .config import FastSpeech2Config
from .models import FastSpeech2
from .type_definitions import Stats, StatsInfo


def stub_stats() -> Stats:
    si = dict(min=-2.0, max=2.0, std=1.0, mean=0.0, norm_min=-2.0, norm_max=2.0)
    return Stats(
        pitch=StatsInfo(**si),
        energy=StatsInfo(**si),
        character_length=StatsInfo(
            min=5, max=40, std=8.0, mean=20.0, norm_min=5, norm_max=40
        ),
    )


def stub_config(**model_overrides) -> FastSpeech2Config:
    return FastSpeech2Config.model_validate(
        {
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
                "max_mel_length": 128,
                **model_overrides,
            },
            "preprocessing": {"audio": {"n_mels": 20}},
            "text": {"symbols": {"letters": list("abcdefghijklmnopqrstuvwxyz")}},
            "training": {"batch_size": 2},
        }
    )


def _stub_train_batch(config: FastSpeech2Config, B=2, L=8, T=24):
    rng = np.random.default_rng(0)
    prior = np.full((B, T, L), 1.0 / L, dtype=np.float32)
    extra = {}
    if (
        config.model.target_text_representation_level.value
        == "phonological_features"
    ):
        from .text.features import N_PHONOLOGICAL_FEATURES

        extra["pfs"] = rng.standard_normal(
            (B, L, N_PHONOLOGICAL_FEATURES)
        ).astype(np.float32)
    return {
        **extra,
        "text": rng.integers(8, 20, size=(B, L)).astype(np.int32),
        "src_lens": np.full(B, L, dtype=np.int32),
        "mel": rng.standard_normal(
            (B, T, config.preprocessing.audio.n_mels)
        ).astype(np.float32),
        "mel_lens": np.full(B, T, dtype=np.int32),
        "pitch": rng.standard_normal((B, T)).astype(np.float32),
        "energy": np.abs(rng.standard_normal((B, T))).astype(np.float32),
        "attn_prior": prior,
        "speaker_id": np.zeros(B, dtype=np.int32),
        "language_id": np.zeros(B, dtype=np.int32),
    }


def get_stubbed_model(
    ckpt_dir: Path, config: Optional[FastSpeech2Config] = None
) -> Tuple[FastSpeech2, Path]:
    """(model, checkpoint_path): a tiny random-weight model checkpointed to
    disk, loadable through the full load path."""
    from .text import TextProcessor
    from .training.checkpoint import save_checkpoint
    from .training.state import create_train_state

    config = config or stub_config()
    stats = stub_stats()
    tp = TextProcessor(config.text)
    model = FastSpeech2(
        config=config, stats=stats, n_symbols=len(tp.symbols),
        n_speakers=1, n_languages=1,
    )
    batch = _stub_train_batch(config)
    state = create_train_state(config, model, jax.random.PRNGKey(0), batch)
    path = save_checkpoint(
        Path(ckpt_dir), state, config, stats,
        {"default": 0}, {"default": 0}, tp.symbols,
    )
    return model, path


def get_stubbed_vocoder(ckpt_dir: Path, n_mels: int = 20) -> Tuple[object, Path]:
    """(vocoder_fn, checkpoint_path): a tiny random-weight HiFiGAN saved as
    .npz, loadable through load_vocoder_checkpoint."""
    from .models.hifigan import (
        HiFiGANConfig,
        init_random_hifigan,
        make_vocoder_fn,
    )

    config = HiFiGANConfig(
        upsample_rates=(8, 8, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
        n_mels=n_mels,
    )
    params = init_random_hifigan(config)
    path = Path(ckpt_dir) / "stub_vocoder.npz"
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(
        path,
        params=np.array(
            jax.tree_util.tree_map(np.asarray, params), dtype=object
        ),
        config=np.array(dataclass_to_dict(config), dtype=object),
        global_step=0,
    )
    return make_vocoder_fn(params, config), path


def dataclass_to_dict(dc) -> dict:
    import dataclasses

    return dataclasses.asdict(dc)
