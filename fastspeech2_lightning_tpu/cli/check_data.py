"""Dataset QA (check-data): per-utterance statistics + optional model-loss
scoring (parity with fs2/cli/check_data.py:19-217 and check_data_heavy.py).

Per utterance: speaking rates (words/chars per second), clipping count,
pitch/energy min/max/mean/std, duration, missing symbols. Results ->
checked-data.json. With --model-path: teacher-forced per-utterance loss
scores via the synthesize stack with return_scores=True, written as
scores-{step}.psv (ScorerWriter). SQUIM objective metrics are gated on
torchaudio availability (not in this image)."""

from __future__ import annotations

import json
import sys
from pathlib import Path
from typing import List, Optional

import numpy as np

from ..config import FastSpeech2Config
from ..preprocessing.pipeline import Preprocessor
from ..utils import load_filelist


def squim_objective_metrics(audio: np.ndarray, sr: int) -> Optional[dict]:
    """STOI/PESQ/SI-SDR via torchaudio SQUIM (check_data_heavy.py:46-55).
    Returns None when torchaudio is unavailable (not in this image)."""
    try:
        import torch
        import torchaudio
    except ImportError:
        return None
    model = torchaudio.pipelines.SQUIM_OBJECTIVE.get_model()
    wav = torch.tensor(audio)[None]
    if sr != 16000:
        wav = torchaudio.functional.resample(wav, sr, 16000)
    stoi, pesq, si_sdr = model(wav)
    return {
        "stoi": float(stoi[0]),
        "pesq": float(pesq[0]),
        "si_sdr": float(si_sdr[0]),
    }


def check_datapoint(
    item: dict,
    preprocessor: Preprocessor,
    word_seg_token: str = " ",
    objective_evaluation: bool = False,
    heavy_clip_detection: bool = False,
) -> dict:
    data_point = dict(item)
    characters = item.get("characters") or item.get("text")
    phones = item.get("phones")
    assert characters or phones, (
        "Sorry, your data does not have characters or phones available in "
        "the filelist, so we can't check the data."
    )
    character_tokens = item.get("character_tokens")
    phone_tokens = item.get("phone_tokens")
    if character_tokens is None and phone_tokens is None:
        ct, pt, _ = preprocessor.process_text(item)
        character_tokens = "/".join(ct) if ct else None
        phone_tokens = "/".join(pt) if pt else None
    default_text = phones if phones is not None else characters
    n_words = len(default_text.split(word_seg_token))
    n_chars = len(character_tokens.split("/")) if character_tokens else None
    n_phones = len(phone_tokens.split("/")) if phone_tokens else None

    a = preprocessor.audio_cfg
    speaker = item.get("speaker") or "default"
    language = item.get("language") or "default"
    from .. import preprocessing

    audio_path = preprocessor.artifact_path(
        "audio", item["basename"], speaker, language,
        f"audio-{a.input_sampling_rate}.wav",
    )
    audio = preprocessing.pipeline.load_wav(audio_path, a.input_sampling_rate)

    if objective_evaluation:
        metrics = squim_objective_metrics(audio, a.input_sampling_rate)
        if metrics is None:
            # torchaudio absent: fall back to the native NumPy estimators
            # (intrusive STOI/SI-SDR against a denoised arm; PESQ has no
            # non-neural reference-free analogue and is reported as null).
            from ..preprocessing.objective import estimate_quality

            if not getattr(check_datapoint, "_warned_squim", False):
                check_datapoint._warned_squim = True
                print(
                    "torchaudio not installed: using native STOI/SI-SDR "
                    "estimates (PESQ unavailable without SQUIM).",
                    file=sys.stderr,
                )
            metrics = estimate_quality(audio, a.input_sampling_rate)
        data_point.update(metrics)

    if heavy_clip_detection:
        # consecutive-run detector (clipdetect parity, check_data_heavy.py:62-63)
        from ..preprocessing.objective import detect_clipping

        _, total_clipping = detect_clipping(audio)
    else:
        # cheap clipping detection (check_data_heavy.py:64-72)
        audio_max, audio_min = audio.max(), audio.min()
        total_clipping = int(
            (audio >= audio_max).sum() + (audio <= audio_min).sum() - 2
        )

    pitch = np.load(
        preprocessor.artifact_path("pitch", item["basename"], speaker, language, "pitch.npy")
    )
    energy = np.load(
        preprocessor.artifact_path("energy", item["basename"], speaker, language, "energy.npy")
    )
    audio_length_s = len(audio) / a.input_sampling_rate
    data_point["total_clipped_samples"] = total_clipping
    data_point["pitch_min"] = float(pitch.min())
    data_point["pitch_max"] = float(pitch.max())
    data_point["pitch_mean"] = float(pitch.mean())
    data_point["pitch_std"] = float(pitch.std())
    data_point["energy_min"] = float(energy.min())
    data_point["energy_max"] = float(energy.max())
    data_point["energy_mean"] = float(energy.mean())
    data_point["energy_std"] = float(energy.std())
    data_point["duration"] = audio_length_s
    data_point["speaking_rate_words_per_second"] = n_words / audio_length_s
    if n_chars is not None:
        data_point["speaking_rate_characters_per_second"] = n_chars / audio_length_s
        data_point["n_chars"] = n_chars
    if n_phones is not None:
        data_point["speaking_rate_phones_per_second"] = n_phones / audio_length_s
        data_point["n_phones"] = n_phones
    data_point["n_missing_symbols"] = len(
        preprocessor.text_processor.get_missing_symbols(default_text)
    )
    data_point["n_words"] = n_words
    return data_point


def check_data_from_filelist(
    preprocessor: Preprocessor,
    filelist: List[dict],
    word_seg_token: str = " ",
    objective_evaluation: bool = False,
    heavy_clip_detection: bool = False,
) -> List[dict]:
    return [
        check_datapoint(
            item, preprocessor, word_seg_token, objective_evaluation,
            heavy_clip_detection,
        )
        for item in filelist
    ]


def add_coverage_scores(data: List[dict], preprocessor: Preprocessor) -> None:
    """phone/trigram coverage scores over the filelist (parity with
    fs2/cli/synthesize.py:389-409): rarity-weighted token and trigram sums,
    used to rank which utterances add the most coverage."""
    from collections import Counter

    def tokens_of(line: dict) -> List[str]:
        if line.get("character_tokens"):
            return line["character_tokens"].split("/")
        ct, pt, _ = preprocessor.process_text(line)
        return pt or ct

    def trigrams(tokens: List[str]):
        padded = ["<BOS>"] + list(tokens) + ["<EOS>"]
        return [tuple(padded[i : i + 3]) for i in range(len(padded) - 2)]

    token_counter: Counter = Counter()
    trigram_counter: Counter = Counter()
    token_cache = []
    for line in data:
        tokens = tokens_of(line)
        token_cache.append(tokens)
        token_counter.update(tokens)
        trigram_counter.update(trigrams(tokens))
    for line, tokens in zip(data, token_cache):
        line["phone_coverage_score"] = sum(1 / token_counter[t] for t in tokens)
        line["trigram_coverage_score"] = sum(
            1 / trigram_counter[n] for n in trigrams(tokens)
        )


def check_data_command(
    config: FastSpeech2Config,
    filelist: Optional[Path],
    calculate_stats: bool,
    model_path: Optional[Path],
    output_dir: Path,
    objective_evaluation: bool = False,
    clip_detection: bool = False,
) -> None:
    preprocessor = Preprocessor(config)
    output_dir.mkdir(exist_ok=True, parents=True)

    if filelist is None:
        combined = load_filelist(config.training.training_filelist) + load_filelist(
            config.training.validation_filelist
        )
    else:
        combined = load_filelist(filelist)

    if calculate_stats:
        stats = check_data_from_filelist(
            preprocessor, combined, objective_evaluation=objective_evaluation,
            heavy_clip_detection=clip_detection,
        )
        if not stats:
            print("Sorry, the data is empty so there is nothing to check.")
            sys.exit(1)
        with open(output_dir / "checked-data.json", "w", encoding="utf8") as f:
            json.dump(stats, f)
        print(f"Wrote {output_dir / 'checked-data.json'}")

    if model_path:
        from ..synthesis.synthesize import (
            load_model_from_checkpoint,
            synthesize_items,
        )
        from ..synthesis.writers import get_synthesis_output_writers

        (
            model, variables, mconfig, mstats, lang2id, speaker2id, global_step,
        ) = load_model_from_checkpoint(model_path)
        for item in combined:
            item.setdefault("is_last_input_chunk", True)
        add_coverage_scores(combined, preprocessor)
        writers = get_synthesis_output_writers(
            [], output_dir, mconfig,
            "postnet_output" if mconfig.model.use_postnet else "output",
            global_step, return_scores=True,
        )
        synthesize_items(
            combined, model, variables, mconfig, lang2id, speaker2id, writers,
            batch_size=1, teacher_forcing=True, return_scores=True,
        )
        print(f"Wrote {output_dir / f'scores-{global_step}.psv'}")
