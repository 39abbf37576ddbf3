"""Preprocessing orchestrator.

Re-provides the upstream everyvoice Preprocessor capability the reference
delegates to (SURVEY.md §3.4): per utterance — audio load/resample, log-mel
spec, F0, energy, beta-binomial attention prior, tokenized text — plus corpus
stats (stats.json) and train/val filelist splitting.

Artifacts are .npy files under save_dir/{audio,spec,pitch,energy,attn,text}
using the reference's naming scheme `{basename}--{speaker}--{language}--
{artifact}` (fs2/dataset.py:53-57), so datasets are mechanically comparable.
Work is farmed over a process pool (the host-side analogue of the reference's
multiprocessing preprocessing)."""

from __future__ import annotations

import functools
import multiprocessing as mp
from pathlib import Path
from typing import Iterable, List, Optional

import numpy as np

from ..config import FastSpeech2Config
from ..text import TextProcessor
from ..text.features import get_features_for_tokens
from ..utils import load_filelist, write_filelist
from .f0 import estimate_f0
from .features import frame_energy_numpy, mel_spectrogram_numpy
from .priors import beta_binomial_prior
from .stats import StatsAccumulator, save_stats
from ..type_definitions import Stats

SEP = "--"

ALL_STEPS = ("audio", "spec", "attn", "text", "pitch", "energy")


def load_wav(path: Path, target_sr: int) -> np.ndarray:
    """Load a wav file as float32 mono in [-1, 1], resampled to target_sr."""
    from scipy.io import wavfile
    from scipy.signal import resample_poly

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        audio = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        audio = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        audio = (data.astype(np.float32) - 128.0) / 128.0
    else:
        audio = data.astype(np.float32)
    if audio.ndim > 1:
        audio = audio.mean(axis=1)
    if sr != target_sr:
        g = np.gcd(sr, target_sr)
        audio = resample_poly(audio, target_sr // g, sr // g).astype(np.float32)
    return audio


def apply_sox_effects(audio: np.ndarray, sr: int, effects: list) -> tuple[np.ndarray, int]:
    """Apply the subset of sox effects the reference configs use
    (everyvoice source_data.sox_effects — e.g. [['channels','1']]):
    channels (mono downmix), rate (resample), norm/gain (level), trim."""
    from scipy.signal import resample_poly

    for effect in effects or []:
        name, *args = effect if isinstance(effect, (list, tuple)) else [effect]
        if name == "channels":
            if audio.ndim > 1 and int(args[0]) == 1:
                audio = audio.mean(axis=1)
        elif name == "rate":
            target = int(float(args[0]))
            if target != sr:
                g = np.gcd(sr, target)
                audio = resample_poly(audio, target // g, sr // g).astype(np.float32)
                sr = target
        elif name == "norm":
            level_db = float(args[0]) if args else -3.0
            peak = np.abs(audio).max() or 1.0
            audio = audio * (10 ** (level_db / 20.0) / peak)
        elif name == "gain":
            audio = audio * (10 ** (float(args[0]) / 20.0))
        elif name == "trim":
            start = float(args[0]) if args else 0.0
            audio = audio[int(start * sr):]
            if len(args) > 1:
                audio = audio[: int(float(args[1]) * sr)]
        # unknown effects are ignored with a note (sox's long tail)
    return audio.astype(np.float32), sr


def save_wav(path: Path, audio: np.ndarray, sr: int) -> None:
    from scipy.io import wavfile

    path.parent.mkdir(parents=True, exist_ok=True)
    pcm = np.clip(audio, -1.0, 1.0)
    wavfile.write(path, sr, (pcm * 32767.0).astype(np.int16))


class Preprocessor:
    def __init__(self, config: FastSpeech2Config):
        self.config = config
        self.audio_cfg = config.preprocessing.audio
        self.save_dir = Path(config.preprocessing.save_dir)
        self.text_processor = TextProcessor(config.text)

    # -- naming -----------------------------------------------------------

    def artifact_path(self, kind: str, basename: str, speaker: str, language: str, fn: str) -> Path:
        return self.save_dir / kind / SEP.join([basename, speaker, language, fn])

    def spec_filename(self) -> str:
        a = self.audio_cfg
        return f"spec-{a.input_sampling_rate}-{a.spec_type}.npy"

    # -- per-utterance ----------------------------------------------------

    def process_text(self, item: dict, use_pfs: bool = False):
        """(character_tokens, phone_tokens, pfs) for a filelist item —
        everyvoice Preprocessor.process_text parity (fs2/dataset.py:89-98).
        Phones come from a 'phones' column when present, an 'arpabet' column
        (converted through the standard ARPABET→IPA table), a configured g2p
        engine (text.g2p_engines: language -> dotted path of a callable
        str -> str|list[str], or a bundled engine name), or — when the model
        trains on phones — the bundled engine for the item's language."""
        text = item.get("characters") or item.get("text") or ""
        character_tokens = self.text_processor.process_text(text)
        phone_tokens = None
        phones = None
        if item.get("phones"):
            phone_tokens = self.text_processor.process_text(item["phones"])
        elif item.get("arpabet"):
            from ..text.g2p import arpabet_to_ipa

            phones = arpabet_to_ipa(item["arpabet"])
        else:
            language = item.get("language") or "default"
            engine = self._g2p_engine(language)
            if engine is not None:
                phones = engine(text)
        if phones is not None:
            if isinstance(phones, (list, tuple)):
                phone_tokens = [
                    p for p in phones if p in self.text_processor.symbol_to_id
                ]
            else:
                phone_tokens = self.text_processor.process_text(str(phones))
        pfs = None
        if use_pfs:
            pfs = get_features_for_tokens(phone_tokens or character_tokens)
        return character_tokens, phone_tokens, pfs

    def _g2p_engine(self, language: str):
        """Resolve (and cache) a g2p callable: a configured dotted path or
        bundled-engine name wins; otherwise, if the model trains on phones or
        phonological features, fall back to the bundled engine for the
        language (english rules / character passthrough)."""
        cache = getattr(self, "_g2p_cache", None)
        if cache is None:
            cache = self._g2p_cache = {}
        if language in cache:
            return cache[language]
        from ..config import TargetTrainingTextRepresentationLevel
        from ..text.g2p import BUNDLED_ENGINES, get_g2p_engine

        dotted = self.config.text.g2p_engines.get(
            language
        ) or self.config.text.g2p_engines.get("default")
        engine = None
        if dotted and str(dotted) in BUNDLED_ENGINES:
            engine = BUNDLED_ENGINES[str(dotted)]
        elif dotted:
            import importlib

            module_name, _, attr = str(dotted).rpartition(".")
            try:
                engine = getattr(importlib.import_module(module_name), attr)
            except Exception as e:
                raise ValueError(
                    f"Could not load g2p engine '{dotted}' for language "
                    f"'{language}': {e}"
                ) from e
        elif (
            self.config.model.target_text_representation_level
            != TargetTrainingTextRepresentationLevel.characters
        ):
            engine = get_g2p_engine(language)
        cache[language] = engine
        return engine

    def process_utterance(
        self,
        item: dict,
        data_dir: Path,
        steps: Iterable[str] = ALL_STEPS,
        sox_effects: Optional[list] = None,
        defer_spectral: bool = False,
    ) -> Optional[dict]:
        """Extract and save artifacts for one utterance; returns the enriched
        filelist row (with token strings) or None if filtered out."""
        a = self.audio_cfg
        basename = item["basename"]
        speaker = item.get("speaker") or "default"
        language = item.get("language") or "default"
        steps = set(steps)

        wav_path = data_dir / f"{basename}.wav"
        audio = load_wav(wav_path, a.input_sampling_rate)
        if sox_effects:
            audio, new_sr = apply_sox_effects(
                audio, a.input_sampling_rate, sox_effects
            )
            if new_sr != a.input_sampling_rate:
                from scipy.signal import resample_poly

                g = np.gcd(new_sr, a.input_sampling_rate)
                audio = resample_poly(
                    audio, a.input_sampling_rate // g, new_sr // g
                ).astype(np.float32)
        dur_s = len(audio) / a.input_sampling_rate
        if dur_s < a.min_audio_length or dur_s > a.max_audio_length:
            return None

        if "audio" in steps:
            out = self.artifact_path(
                "audio", basename, speaker, language,
                f"audio-{a.input_sampling_rate}.wav",
            )
            save_wav(out, audio, a.input_sampling_rate)

        n_frames = 1 + len(audio) // a.fft_hop_size
        if "spec" in steps and not defer_spectral:
            mel = mel_spectrogram_numpy(
                audio, a.input_sampling_rate, a.n_fft, a.fft_hop_size,
                a.fft_window_size, a.n_mels, a.f_min, a.f_max, a.spec_type,
            )  # [n_mels, T]
            out = self.artifact_path("spec", basename, speaker, language, self.spec_filename())
            out.parent.mkdir(parents=True, exist_ok=True)
            np.save(out, mel)

        character_tokens, phone_tokens, pfs = self.process_text(
            item, use_pfs=True
        )
        if "text" in steps:
            out = self.artifact_path("text", basename, speaker, language, "text.npy")
            out.parent.mkdir(parents=True, exist_ok=True)
            np.save(out, np.asarray(self.text_processor.encode_tokens(character_tokens), dtype=np.int32))
            if pfs is not None:
                pfs_out = self.artifact_path("pfs", basename, speaker, language, "pfs.npy")
                pfs_out.parent.mkdir(parents=True, exist_ok=True)
                np.save(pfs_out, pfs)

        if "attn" in steps:
            T = n_frames
            for rep, tokens in (
                ("characters", character_tokens),
                ("phones", phone_tokens),
            ):
                if not tokens:
                    continue
                prior = beta_binomial_prior(T, len(tokens))
                out = self.artifact_path(
                    "attn", basename, speaker, language, f"{rep}-attn-prior.npy"
                )
                out.parent.mkdir(parents=True, exist_ok=True)
                np.save(out, prior)

        pitch = energy = None
        if "pitch" in steps:
            # native C++ YIN when the toolchain is available; NumPy golden otherwise
            from .. import native

            if native.available():
                pitch = native.yin_f0_native(
                    audio, a.input_sampling_rate, a.fft_hop_size, n_frames
                )
            else:
                pitch = estimate_f0(
                    audio, a.input_sampling_rate, a.fft_hop_size, n_frames
                )
            out = self.artifact_path("pitch", basename, speaker, language, "pitch.npy")
            out.parent.mkdir(parents=True, exist_ok=True)
            np.save(out, pitch)
        if "energy" in steps and not defer_spectral:
            energy = frame_energy_numpy(
                audio, a.n_fft, a.fft_hop_size, a.fft_window_size
            )
            out = self.artifact_path("energy", basename, speaker, language, "energy.npy")
            out.parent.mkdir(parents=True, exist_ok=True)
            np.save(out, energy)

        row = dict(item)
        row["basename"] = basename
        row["speaker"] = speaker
        row["language"] = language
        row["character_tokens"] = self.text_processor.encode_string_tokens(character_tokens)
        if phone_tokens:
            row["phone_tokens"] = self.text_processor.encode_string_tokens(phone_tokens)
        return row

    # -- corpus level -----------------------------------------------------

    def run(
        self,
        steps: Iterable[str] = ALL_STEPS,
        cpus: Optional[int] = None,
        compute_stats: bool = True,
        on_device_spec: bool = False,
    ) -> dict:
        """Process every source filelist; write split filelists + stats.json.

        on_device_spec=True computes mel + energy for the whole corpus as
        batched fused ops on the accelerator (features.batched_mel_energy_jax)
        instead of per-utterance on the host."""
        if on_device_spec and self.audio_cfg.spec_type not in (
            "mel", "mel-librosa",
        ):
            # the fused device extractor is log-mel only; 'linear'/'raw'
            # spec types silently got mels before (wrong feature dim)
            print(
                f"on-device spec supports mel spec types only "
                f"(spec_type={self.audio_cfg.spec_type!r}) — using the "
                "host path"
            )
            on_device_spec = False
        all_rows: List[dict] = []
        device_queue: List[tuple] = []  # (row, data_dir, sox_effects)
        for source in self.config.preprocessing.source_data:
            items = load_filelist(source.filelist)
            worker = functools.partial(
                _process_one,
                config=self.config,
                data_dir=Path(source.data_dir),
                steps=tuple(steps),
                sox_effects=list(source.sox_effects or []),
                defer_spectral=on_device_spec,
            )
            n_workers = cpus or self.config.preprocessing.cpus or 1
            if n_workers > 1:
                with mp.Pool(n_workers) as pool:
                    rows = pool.map(worker, items)
            else:
                rows = [worker(it) for it in items]
            for r in rows:
                if r is not None:
                    all_rows.append(r)
                    device_queue.append(
                        (r, Path(source.data_dir), list(source.sox_effects or []))
                    )

        if on_device_spec and ({"spec", "energy"} & set(steps)):
            self._device_spectral_pass(device_queue, set(steps))

        # deterministic split (fs2 preprocessing: train_split + seed)
        rng = np.random.default_rng(self.config.preprocessing.dataset_split_seed)
        order = rng.permutation(len(all_rows))
        n_train = int(len(all_rows) * self.config.preprocessing.train_split)
        train_rows = [all_rows[i] for i in order[:n_train]]
        val_rows = [all_rows[i] for i in order[n_train:]]
        write_filelist(train_rows, self.save_dir / "training_filelist.psv")
        write_filelist(val_rows, self.save_dir / "validation_filelist.psv")

        result = {"n_train": len(train_rows), "n_val": len(val_rows)}
        if compute_stats:
            stats = self.compute_stats(all_rows, normalize=True)
            save_stats(stats, self.save_dir / "stats.json")
            result["stats"] = stats
        return result

    def _device_spectral_pass(self, queue: List[tuple], steps: set) -> None:
        """Batched mel+energy on the accelerator: bucket utterances by sample
        length (multiples of 64 hops), pad, run the fused jitted extractor per
        bucket shape, crop, save."""
        import jax
        import jax.numpy as jnp

        from .features import batched_mel_energy_jax

        a = self.audio_cfg
        bucket_samples = a.fft_hop_size * 64
        jitted = jax.jit(
            functools.partial(
                batched_mel_energy_jax,
                sr=a.input_sampling_rate,
                n_fft=a.n_fft,
                hop=a.fft_hop_size,
                win_length=a.fft_window_size,
                n_mels=a.n_mels,
                f_min=a.f_min,
                f_max=a.f_max,
                htk=a.spec_type == "mel",
            ),
            static_argnames=(),
        )

        pad = a.n_fft // 2
        buckets: dict = {}
        for row, data_dir, effects in queue:
            audio = load_wav(
                data_dir / f"{row['basename']}.wav", a.input_sampling_rate
            )
            if effects:
                audio, new_sr = apply_sox_effects(
                    audio, a.input_sampling_rate, effects
                )
                if new_sr != a.input_sampling_rate:
                    # mirror the host path (process_utterance): rate-changing
                    # effects resample back so spec/energy frame counts stay
                    # aligned with pitch and the attention prior
                    from scipy.signal import resample_poly

                    g = np.gcd(new_sr, a.input_sampling_rate)
                    audio = resample_poly(
                        audio, a.input_sampling_rate // g, new_sr // g
                    ).astype(np.float32)
            # room for the tail reflection so batching reproduces the host
            # path's per-utterance reflect padding exactly
            padded_len = -(-(len(audio) + pad) // bucket_samples) * bucket_samples
            buckets.setdefault(padded_len, []).append((row, audio))

        BATCH = 16
        for padded_len, entries in buckets.items():
            for start in range(0, len(entries), BATCH):
                chunk = entries[start : start + BATCH]
                batch = np.zeros((len(chunk), padded_len), dtype=np.float32)
                for i, (_, audio) in enumerate(chunk):
                    n = len(audio)
                    batch[i, :n] = audio
                    ext = min(padded_len - n, n - 1)
                    if ext > 0:
                        batch[i, n : n + ext] = audio[-2 : -ext - 2 : -1]
                mel, energy = jitted(jnp.asarray(batch))
                mel = np.asarray(mel)
                energy = np.asarray(energy)
                for i, (row, audio) in enumerate(chunk):
                    n_frames = 1 + len(audio) // a.fft_hop_size
                    b, s, l = row["basename"], row["speaker"], row["language"]
                    if "spec" in steps:
                        out = self.artifact_path(
                            "spec", b, s, l, self.spec_filename()
                        )
                        out.parent.mkdir(parents=True, exist_ok=True)
                        np.save(out, mel[i, :, :n_frames])
                    if "energy" in steps:
                        out = self.artifact_path("energy", b, s, l, "energy.npy")
                        out.parent.mkdir(parents=True, exist_ok=True)
                        np.save(out, energy[i, :n_frames])

    def compute_stats(self, rows: List[dict], normalize: bool = True) -> Stats:
        """Pitch/energy scalers (+ in-place z-normalization of the saved
        artifacts, like upstream normalize_stats) and text-length stats."""
        p_acc, e_acc = StatsAccumulator(), StatsAccumulator()
        c_acc, ph_acc = StatsAccumulator(), StatsAccumulator()
        paths = []
        for row in rows:
            b, s, l = row["basename"], row["speaker"], row["language"]
            pp = self.artifact_path("pitch", b, s, l, "pitch.npy")
            ep = self.artifact_path("energy", b, s, l, "energy.npy")
            if pp.exists():
                p_acc.update(np.load(pp))
            if ep.exists():
                e_acc.update(np.load(ep))
            paths.append((pp, ep))
            if row.get("character_tokens"):
                c_acc.update(np.array([len(row["character_tokens"].split("/"))]))
            if row.get("phone_tokens"):
                ph_acc.update(np.array([len(row["phone_tokens"].split("/"))]))

        if normalize:
            for pp, ep in paths:
                if pp.exists():
                    np.save(pp, p_acc.normalize(np.load(pp)))
                if ep.exists():
                    np.save(ep, e_acc.normalize(np.load(ep)))

        return Stats(
            pitch=p_acc.finalize(),
            energy=e_acc.finalize(),
            character_length=c_acc.finalize() if c_acc.n else None,
            phone_length=ph_acc.finalize() if ph_acc.n else None,
        )


_WORKER_PRE: dict = {}  # per-process memo: config dump -> Preprocessor


def _worker_preprocessor(config: FastSpeech2Config) -> "Preprocessor":
    """One Preprocessor per worker process, not per utterance — the
    TextProcessor/g2p construction otherwise rivals the feature extraction
    for short clips (pool.map pickles the config per task, so identity
    can't key the cache; the config dump can)."""
    key = config.model_dump_json()
    pre = _WORKER_PRE.get(key)
    if pre is None:
        _WORKER_PRE.clear()
        pre = _WORKER_PRE[key] = Preprocessor(config)
    return pre


def _process_one(
    item: dict,
    config: FastSpeech2Config,
    data_dir: Path,
    steps,
    sox_effects=None,
    defer_spectral: bool = False,
):
    """Top-level worker for multiprocessing pickling."""
    return _worker_preprocessor(config).process_utterance(
        item, data_dir, steps, sox_effects, defer_spectral
    )
