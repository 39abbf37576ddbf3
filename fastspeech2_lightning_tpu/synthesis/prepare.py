"""Synthesis data preparation: text chunking, language/speaker validation,
style-reference spectrograms (parity with fs2/cli/synthesize.py:28-319)."""

from __future__ import annotations

import sys
from pathlib import Path
from typing import List, Optional

from ..config import DatasetTextRepresentation
from ..text.textsplit import chunk_text
from ..utils import load_filelist, slugify, truncate_basename


def validate_data_keys_with_model_keys(
    data_keys: set, model_keys: set, key: str, multi: bool
) -> None:
    """fs2/cli/synthesize.py:28-72 semantics (raises instead of sys.exit)."""
    if multi:
        if None in data_keys:
            raise ValueError(
                f"You have not specified a {key} for all your sentences."
                f" Available values are {model_keys}"
            )
        extras = data_keys.difference(model_keys)
        if extras:
            raise ValueError(
                f"You provided {data_keys} which are not {key}s supported by "
                f"the model {model_keys or {}}."
            )
    else:
        extras = data_keys.difference(model_keys | {None})
        if extras:
            raise ValueError(
                f"The current model doesn't support multiple {key}s but your "
                f"data has {key}s {extras}. Please retrain your model with "
                f"multi{'lingual' if key == 'language' else key} set to True."
            )


def get_text_split_params(
    stats,
    text_representation: DatasetTextRepresentation,
    config=None,
    language: Optional[str] = None,
) -> tuple[int, int, str, str]:
    """(desired_length, max_length, strong, weak) from corpus stats and the
    text config's per-language boundaries (fs2/cli/synthesize.py:75-128)."""
    desired, maxi = 100, 200
    try:
        if text_representation == DatasetTextRepresentation.characters:
            desired = int(stats.character_length.mean)
            maxi = int(stats.character_length.max)
        elif text_representation == DatasetTextRepresentation.ipa_phones:
            desired = int(stats.phone_length.mean)
            maxi = int(stats.phone_length.max)
    except AttributeError:
        pass
    strong, weak = ".!?:;", ",-— "
    if config is not None:
        b = config.text.boundaries.get(language or "", None) or config.text.boundaries.get(
            "default", None
        )
        if isinstance(b, dict):
            strong = b.get("strong", strong)
            weak = b.get("weak", weak)
    return desired, maxi, strong, weak


def representation_for_model(config) -> "DatasetTextRepresentation":
    """The DatasetTextRepresentation whose corpus length stats match the
    model's trained representation (phone stats for phones/pfs models)."""
    from ..config import (
        DatasetTextRepresentation,
        TargetTrainingTextRepresentationLevel,
    )

    level = config.model.target_text_representation_level
    return (
        DatasetTextRepresentation.characters
        if level == TargetTrainingTextRepresentationLevel.characters
        else DatasetTextRepresentation.ipa_phones
    )


def chunk_text_for_model(
    text: str,
    language: Optional[str],
    config,
    stats,
) -> List[str]:
    """Chunk long input at corpus-informed boundaries, deriving split stats
    from the MODEL's text representation (phone-length stats for
    phones-trained models, character-length otherwise) — the single
    implementation behind Synthesizer, ExportedSynthesizer, and the HTTP
    server. Returns [text] when chunking is disabled or nothing splits."""
    if not config.text.split_text:
        return [text]
    desired, maxi, strong, weak = get_text_split_params(
        stats, representation_for_model(config), config, language
    )
    return chunk_text(text, desired, maxi, strong, weak) or [text]


def encode_texts_for_model(
    texts: List[str],
    language: Optional[str],
    config,
    text_processor,
    cache: dict,
):
    """Per-text encodings honoring model.target_text_representation_level —
    the serving-path analogue of FastSpeechDataset._encode_text (which runs
    g2p for phones-trained models, fs2/dataset.py:88-98 parity). Character
    models tokenize directly; phones models g2p each text for `language`
    first (a bare encode_text would feed characters to a phone-trained
    embedding); pfs models additionally featurize the g2p tokens through the
    same articulatory table the dataset path uses (fs2/dataset.py:155-174 —
    the reference serves every representation level through one predict
    path). Returns `(ids, pfs)`: `ids` is a list of int32 arrays; `pfs` is a
    matching list of [T, N_PHONOLOGICAL_FEATURES] float32 matrices for pfs
    models and None otherwise. `cache` holds the lazily-built Preprocessor
    across calls."""
    import numpy as np

    from ..config import TargetTrainingTextRepresentationLevel as Level

    level = config.model.target_text_representation_level
    if level == Level.characters:
        return [
            np.asarray(text_processor.encode_text(t), dtype=np.int32)
            for t in texts
        ], None
    use_pfs = level == Level.phonological_features
    pre = cache.get("preprocessor")
    if pre is None:
        from ..preprocessing.pipeline import Preprocessor

        pre = cache["preprocessor"] = Preprocessor(config)
    ids, pfs_mats = [], []
    for t in texts:
        char_tokens, phone_tokens, _pfs = pre.process_text(
            {"text": t, "language": language or "default"}
        )
        # token stream for ids mirrors the featurized stream in pfs mode
        # (pipeline.process_text featurizes `phone_tokens or character_tokens`)
        tokens = (phone_tokens or char_tokens) if use_pfs else phone_tokens
        if use_pfs:
            # encode_tokens drops out-of-inventory tokens; featurize the SAME
            # filtered stream so pfs row i always matches token id i
            from ..text.features import get_features_for_tokens

            kept = [
                t for t in (tokens or [])
                if t in text_processor.symbol_to_id
            ]
            pfs_mats.append(get_features_for_tokens(kept))
            tokens = kept
        ids.append(
            np.asarray(
                text_processor.encode_tokens(tokens or []), dtype=np.int32
            )
        )
    return ids, (pfs_mats if use_pfs else None)


def prepare_data(
    texts: Optional[List[str]],
    language: Optional[str],
    speaker: Optional[str],
    filelist: Optional[Path],
    config,
    stats,
    lang2id: dict,
    speaker2id: dict,
    text_representation: DatasetTextRepresentation = DatasetTextRepresentation.characters,
    duration_control: float = 1.0,
    style_reference: Optional[Path] = None,
    split_text: Optional[bool] = None,
) -> List[dict]:
    """Chunked, validated synthesis items (fs2/cli/synthesize.py:218-319)."""
    default_language = next(iter(lang2id.keys()), None)
    default_speaker = next(iter(speaker2id.keys()), None)
    if split_text is None:
        split_text = config.text.split_text
    desired, maxi, strong, weak = get_text_split_params(
        stats, text_representation, config, language or default_language
    )

    def make_items(text: str, lang, spk, basename: Optional[str] = None):
        chunks = (
            chunk_text(text, desired, maxi, strong, weak) if split_text else [text]
        )
        out = []
        for i, chunk in enumerate(chunks):
            out.append(
                {
                    "basename": basename or truncate_basename(slugify(chunk)),
                    text_representation.value: chunk,
                    "text": chunk,
                    "language": lang or default_language,
                    "speaker": spk or default_speaker,
                    "is_last_input_chunk": i == len(chunks) - 1,
                }
            )
        print(f"Processing text: {chunks}", file=sys.stderr)
        return out

    data: List[dict] = []
    if texts:
        for text in texts:
            data.extend(make_items(text, language, speaker))
    else:
        if filelist is None:
            raise ValueError("Filelist must be provided when texts is empty or None")
        rows = load_filelist(filelist)
        for d in rows:
            line = d.get(text_representation.value) or d.get("text") or ""
            data.extend(
                make_items(
                    line,
                    language or d.get("language", default_language),
                    speaker or d.get("speaker", default_speaker),
                    basename=d.get("basename"),
                )
            )

    validate_data_keys_with_model_keys(
        {d["language"] for d in data}, set(lang2id.keys()), "language",
        config.model.multilingual,
    )
    validate_data_keys_with_model_keys(
        {d["speaker"] for d in data}, set(speaker2id.keys()), "speaker",
        config.model.multispeaker,
    )

    if style_reference is not None:
        from ..preprocessing.features import mel_spectrogram_numpy
        from ..preprocessing.pipeline import load_wav

        a = config.preprocessing.audio
        audio = load_wav(Path(style_reference), a.input_sampling_rate)
        ref = mel_spectrogram_numpy(
            audio, a.input_sampling_rate, a.n_fft, a.fft_hop_size,
            a.fft_window_size, a.n_mels, a.f_min, a.f_max, a.spec_type,
        ).T  # [T, n_mels]
    else:
        ref = None

    for item in data:
        item["duration_control"] = duration_control
        if ref is not None:
            item["mel_style_reference"] = ref
    return data
