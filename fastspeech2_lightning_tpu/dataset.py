"""Dataset + static-shape batching.

Re-provides the reference's data layer (fs2/dataset.py): per-utterance
artifact loading by the `{basename}--{speaker}--{language}--{artifact}` naming
scheme, collation, and train/val/predict loaders — redesigned for XLA:

 - **Length buckets, not dynamic padding.** The reference pads every batch to
   its own max (fs2/dataset.py:257-293), so every batch is a new shape — fine
   for eager CUDA, hostile to jit. Here utterances are grouped into a small
   set of (text_len, mel_len) buckets chosen from corpus quantiles; each
   bucket is one compiled program.
 - Batches are plain numpy dicts; the jitted step receives identical shapes
   every step of a bucket.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from .config import (
    FastSpeech2Config,
    TargetTrainingTextRepresentationLevel,
)
from .preprocessing.pipeline import SEP
from .text import TextProcessor, LookupTable
from .utils import load_filelist

PAD_MULT_TEXT = 16
PAD_MULT_MEL = 32

# batch fields that never ship to the device (strings, chunk bookkeeping,
# cross-host scalars)
HOST_ONLY_KEYS = {
    "basename", "speaker", "language", "raw_text", "is_last_input_chunk",
    "max_src_len", "max_mel_len", "n_real_global",
}


class FastSpeechDataset:
    """Loads per-utterance artifacts (parity with FastSpeechDataset,
    fs2/dataset.py:26-231)."""

    def __init__(
        self,
        items: List[dict],
        config: FastSpeech2Config,
        lang2id: LookupTable,
        speaker2id: LookupTable,
        teacher_forcing: bool = False,
        inference: bool = False,
        style_reference: bool = False,
    ):
        self.items = items
        self.config = config
        self.preprocessed_dir = Path(config.preprocessing.save_dir)
        self.text_processor = TextProcessor(config.text)
        self.lang2id = lang2id
        self.speaker2id = speaker2id
        self.teacher_forcing = teacher_forcing
        self.inference = inference
        self.style_reference = style_reference
        self.sampling_rate = config.preprocessing.audio.input_sampling_rate

    def __len__(self):
        return len(self.items)

    def _load(self, bn, spk, lang, kind, fn) -> np.ndarray:
        return np.load(
            self.preprocessed_dir / kind / SEP.join([bn, spk, lang, fn]),
            allow_pickle=False,
        )

    def _encode_text(self, item: dict) -> np.ndarray:
        level = self.config.model.target_text_representation_level
        if level == TargetTrainingTextRepresentationLevel.characters:
            key = "character_tokens"
        else:
            key = "phone_tokens"
        if item.get(key):
            ids = self.text_processor.encode_escaped_string_sequence(item[key])
        elif level != TargetTrainingTextRepresentationLevel.characters:
            # phones-level ad-hoc input (inference parity with the
            # reference's on-the-fly Preprocessor.process_text,
            # fs2/dataset.py:88-98): run g2p now
            if not hasattr(self, "_preprocessor"):
                from .preprocessing.pipeline import Preprocessor

                self._preprocessor = Preprocessor(self.config)
            _, phone_tokens, _ = self._preprocessor.process_text(item)
            ids = self.text_processor.encode_tokens(phone_tokens or [])
        else:
            text = item.get("characters") or item.get("text") or ""
            ids = self.text_processor.encode_text(text)
        return np.asarray(ids, dtype=np.int32)

    def __getitem__(self, index: int) -> dict:
        item = self.items[index]
        speaker = item.get("speaker") or "default"
        language = item.get("language") or "default"
        basename = item["basename"]
        speaker_id = self.speaker2id.get(speaker, 0)
        language_id = self.lang2id.get(language, 0)

        loaded: Dict[str, object] = {
            "basename": basename,
            "speaker": speaker,
            "speaker_id": speaker_id,
            "language": language,
            "language_id": language_id,
            "raw_text": item.get("characters") or item.get("text") or "",
            "duration_control": float(item.get("duration_control") or 1.0),
            "is_last_input_chunk": bool(item.get("is_last_input_chunk", True)),
        }

        loaded["text"] = self._encode_text(item)
        # cap text length (model.max_length, fs2/config/__init__.py:147-150)
        max_len = self.config.model.max_length
        if loaded["text"].shape[0] > max_len:
            loaded["text"] = loaded["text"][:max_len]

        load_targets = self.teacher_forcing or not self.inference
        if load_targets:
            a = self.config.preprocessing.audio
            mel = self._load(
                basename, speaker, language, "spec",
                f"spec-{self.sampling_rate}-{a.spec_type}.npy",
            ).T  # [n_mels, T] -> [T, n_mels]
            loaded["mel"] = mel.astype(np.float32)
            if self.config.model.learn_alignment:
                level = self.config.model.target_text_representation_level
                rep = (
                    "characters"
                    if level == TargetTrainingTextRepresentationLevel.characters
                    else "phones"
                )
                loaded["attn_prior"] = self._load(
                    basename, speaker, language, "attn", f"{rep}-attn-prior.npy"
                ).astype(np.float32)
            else:
                try:
                    loaded["duration"] = self._load(
                        basename, speaker, language, "duration", "duration.npy"
                    ).astype(np.int32)
                except FileNotFoundError as e:
                    from .exceptions import InvalidConfiguration

                    raise InvalidConfiguration(
                        "You set model.learn_alignment = false, an advanced "
                        "configuration which requires providing text/audio "
                        "alignments before training, but those alignments "
                        "were not found (fs2/dataset.py:144-152)."
                    ) from e
                # data validation: durations must sum to the mel length
                # (BadDataError parity, fs2/variance_adaptor.py:289-305)
                dur_sum = int(loaded["duration"].sum())
                n_frames = int(loaded["mel"].shape[0])
                if dur_sum != n_frames:
                    from .exceptions import BadDataError

                    raise BadDataError(
                        f"Something failed with the following items, please "
                        f"check them for errors: ['{basename}'] (durations "
                        f"sum to {dur_sum} but the mel has {n_frames} frames)"
                    )
        if not self.inference:
            loaded["energy"] = self._load(
                basename, speaker, language, "energy", "energy.npy"
            ).astype(np.float32)
            loaded["pitch"] = self._load(
                basename, speaker, language, "pitch", "pitch.npy"
            ).astype(np.float32)
            if (
                self.config.model.target_text_representation_level
                == TargetTrainingTextRepresentationLevel.phonological_features
            ):
                loaded["pfs"] = self._load(
                    basename, speaker, language, "pfs", "pfs.npy"
                ).astype(np.float32)
        if self.style_reference and "mel_style_reference" in item:
            loaded["mel_style_reference"] = item["mel_style_reference"]
        # scoring mode passthrough (fs2/dataset.py:218-222)
        for key in ("phone_coverage_score", "trigram_coverage_score"):
            if key in item:
                loaded[key] = float(item[key])
        return loaded


# ---------------------------------------------------------------------------
# Collation to static shapes
# ---------------------------------------------------------------------------


def _round_up(n: int, mult: int) -> int:
    return max(mult, int(math.ceil(n / mult)) * mult)


def collate(
    samples: List[dict],
    pad_text_to: Optional[int] = None,
    pad_mel_to: Optional[int] = None,
    learn_alignment: bool = True,
    variance_levels: Optional[Dict[str, str]] = None,
) -> dict:
    """Pad a list of per-utterance dicts into one fixed-shape numpy batch
    (collate_method parity, fs2/dataset.py:257-293, plus static bucket pads)."""
    B = len(samples)
    src_lens = np.array([s["text"].shape[0] for s in samples], dtype=np.int32)
    L = pad_text_to or int(src_lens.max())
    # same consistency rule as mel_lens below: if the pad target truncates
    # a text, src_lens must not exceed the padded axis
    src_lens = np.minimum(src_lens, L)
    has_mel = samples[0].get("mel") is not None
    if has_mel:
        mel_lens = np.array([s["mel"].shape[0] for s in samples], dtype=np.int32)
        T = pad_mel_to or int(mel_lens.max())
        # When a bucket's pad target is capped below an utterance's true mel
        # length (model.max_mel_length), the mel is truncated to T — keep
        # mel_lens consistent with the padded axis so masks / MAS out_lens /
        # CTC never see lengths beyond it.
        mel_lens = np.minimum(mel_lens, T)
        n_mels = samples[0]["mel"].shape[1]
    else:
        mel_lens = None
        T = pad_mel_to  # may be None at pure inference

    batch: Dict[str, object] = {
        "src_lens": src_lens,
        "mel_lens": mel_lens,
        "max_src_len": L,
        "max_mel_len": T,
        "basename": [s["basename"] for s in samples],
        "speaker": [s["speaker"] for s in samples],
        "language": [s["language"] for s in samples],
        "raw_text": [s["raw_text"] for s in samples],
        "speaker_id": np.array([s["speaker_id"] for s in samples], dtype=np.int32),
        "language_id": np.array([s["language_id"] for s in samples], dtype=np.int32),
        "duration_control": np.array(
            [s.get("duration_control", 1.0) for s in samples], dtype=np.float32
        ),
        "is_last_input_chunk": [s.get("is_last_input_chunk", True) for s in samples],
    }
    for key in ("phone_coverage_score", "trigram_coverage_score"):
        if key in samples[0]:
            batch[key] = np.array([s[key] for s in samples], dtype=np.float32)

    text = np.zeros((B, L), dtype=np.int32)
    for i, s in enumerate(samples):
        text[i, : src_lens[i]] = s["text"][:L]
    batch["text"] = text

    if has_mel:
        mel = np.zeros((B, T, n_mels), dtype=np.float32)
        for i, s in enumerate(samples):
            mel[i, : mel_lens[i]] = s["mel"][:T]
        batch["mel"] = mel

    for key in ("pitch", "energy"):
        if samples[0].get(key) is not None:
            # frame-level targets (always the case when alignment is learned,
            # fs2/variance_adaptor.py:269-278) pad to T; phone-level to L.
            # The level comes from the config's variance_predictors when
            # provided — shape inference is only a fallback for callers that
            # collate without a config (a one-frame-off artifact would
            # silently flip the inferred branch).
            if learn_alignment:
                is_frame = True
            elif variance_levels is not None and key in variance_levels:
                level = variance_levels[key]
                is_frame = getattr(level, "value", level) == "frame"
            else:
                is_frame = has_mel and any(
                    abs(s[key].shape[0] - ml) <= 1
                    for s, ml in zip(samples, mel_lens)
                )
            W = (T if T else L) if is_frame else L
            arr = np.zeros((B, W), dtype=np.float32)
            for i, s in enumerate(samples):
                n = min(s[key].shape[0], W)
                arr[i, :n] = s[key][:n]
            batch[key] = arr

    if samples[0].get("attn_prior") is not None:
        prior = np.zeros((B, T, L), dtype=np.float32)
        for i, s in enumerate(samples):
            p = s["attn_prior"]
            prior[i, : min(p.shape[0], T), : min(p.shape[1], L)] = p[:T, :L]
        batch["attn_prior"] = prior

    if samples[0].get("duration") is not None:
        dur = np.zeros((B, L), dtype=np.int32)
        for i, s in enumerate(samples):
            d = s["duration"]
            dur[i, : min(d.shape[0], L)] = d[:L]
        batch["duration"] = dur

    if samples[0].get("pfs") is not None:
        nf = samples[0]["pfs"].shape[1]
        pfs = np.zeros((B, L, nf), dtype=np.float32)
        for i, s in enumerate(samples):
            p = s["pfs"]
            pfs[i, : min(p.shape[0], L)] = p[:L]
        batch["pfs"] = pfs

    if samples[0].get("mel_style_reference") is not None:
        refs = [np.asarray(s["mel_style_reference"]) for s in samples]
        TR = max(r.shape[0] for r in refs)
        ref = np.zeros((B, TR, refs[0].shape[1]), dtype=np.float32)
        for i, r in enumerate(refs):
            ref[i, : r.shape[0]] = r
        batch["mel_style_reference"] = ref

    return batch


# ---------------------------------------------------------------------------
# Bucketed loader
# ---------------------------------------------------------------------------


@dataclass
class Bucket:
    max_text: int
    max_mel: int
    indices: List[int] = field(default_factory=list)


class BucketedLoader:
    """Groups a dataset into a small set of static (text, mel) shapes and
    yields shuffled fixed-shape batches.

    Per-epoch iteration: shuffle within buckets, emit full batches; the last
    partial batch of each bucket is padded by repeating items (masked items
    contribute loss like any other — the repeat just keeps shapes static; set
    drop_last to skip instead)."""

    def __init__(
        self,
        dataset: FastSpeechDataset,
        batch_size: int,
        n_buckets: int = 4,
        seed: int = 0,
        drop_last: bool = False,
        use_weighted_sampler: bool = False,
        max_mel_length: Optional[int] = None,
        shard: tuple[int, int] = (0, 1),
    ):
        """`batch_size` is always the GLOBAL batch size. `shard=(i, n)`
        makes this loader yield only process i's contiguous rows of each
        global batch (multi-host data sharding: every process draws the
        identical batch plan from the shared seed, then loads/collates just
        its own slice — `parallel.shard_batch` reassembles the global
        array)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.use_weighted_sampler = use_weighted_sampler
        self.shard = shard
        if shard[1] > 1 and batch_size % shard[1] != 0:
            raise ValueError(
                f"global batch_size={batch_size} must divide evenly over "
                f"{shard[1]} processes"
            )

        # measure lengths from artifacts (text from tokens; mel from spec
        # shape), with a sidecar cache so Trainer construction doesn't rescan
        # every spec header each run (the reference persists its prepared
        # datasets to disk, fs2/dataset.py:303-351 — same intent)
        a = dataset.config.preprocessing.audio
        level = dataset.config.model.target_text_representation_level
        tok_key = (
            "character_tokens"
            if level == TargetTrainingTextRepresentationLevel.characters
            else "phone_tokens"
        )
        spec_name = f"spec-{a.input_sampling_rate}-{a.spec_type}.npy"
        spec_paths = [
            dataset.preprocessed_dir
            / "spec"
            / SEP.join(
                [
                    item["basename"],
                    item.get("speaker") or "default",
                    item.get("language") or "default",
                    spec_name,
                ]
            )
            for item in dataset.items
        ]
        cached = self._load_length_cache(dataset, tok_key, spec_paths)
        if cached is not None:
            self.text_lens, self.mel_lens = cached
        else:
            text_lens, mel_lens = [], []
            for i in range(len(dataset)):
                item = dataset.items[i]
                tl = len((item.get(tok_key) or "").split("/")) or 1
                if not item.get(tok_key):
                    tl = len(dataset._encode_text(item))
                text_lens.append(tl)
                if spec_paths[i].exists():
                    # header-only read: np.load with mmap to avoid full IO
                    shape = np.load(spec_paths[i], mmap_mode="r").shape
                    mel_lens.append(shape[1])
                else:
                    mel_lens.append(0)
            self.text_lens = np.array(text_lens)
            self.mel_lens = np.array(mel_lens)
            self._save_length_cache(dataset, tok_key, spec_paths)

        # quantile bucket edges on mel length
        qs = np.linspace(0, 1, n_buckets + 1)[1:]
        edges = np.unique(np.quantile(self.mel_lens, qs).astype(int))
        self.buckets: List[Bucket] = []
        lo = -1
        for edge in edges:
            sel = np.where((self.mel_lens > lo) & (self.mel_lens <= edge))[0]
            if len(sel) == 0:
                continue
            mt = _round_up(int(self.text_lens[sel].max()), PAD_MULT_TEXT)
            mm = _round_up(int(self.mel_lens[sel].max()), PAD_MULT_MEL)
            if max_mel_length:
                mm = min(mm, max_mel_length)
            self.buckets.append(Bucket(mt, mm, list(sel)))
            lo = edge

    @staticmethod
    def _length_cache_key(dataset, tok_key: str, spec_paths) -> str:
        """Hash of the filelist content + each spec file's (mtime, size): a
        re-preprocessed artifact or edited filelist invalidates the cache."""
        import hashlib
        import json

        rows = []
        for item, p in zip(dataset.items, spec_paths):
            try:
                st = p.stat()
                stamp = (st.st_mtime_ns, st.st_size)
            except OSError:
                stamp = None
            rows.append(
                [
                    item["basename"],
                    item.get("speaker") or "default",
                    item.get("language") or "default",
                    item.get(tok_key) or "",
                    stamp,
                ]
            )
        # the representation level changes encoded text lengths even when
        # the hashed rows are identical (filelists without token columns
        # encode live) — two levels must never share a cache entry
        level = str(dataset.config.model.target_text_representation_level)
        blob = json.dumps([level, tok_key, rows], sort_keys=True,
                          ensure_ascii=False)
        return hashlib.sha1(blob.encode("utf8")).hexdigest()

    def _cache_path(self, dataset, tok_key, spec_paths) -> Path:
        key = self._length_cache_key(dataset, tok_key, spec_paths)
        return dataset.preprocessed_dir / ".lengths_cache" / f"{key}.npz"

    def _load_length_cache(self, dataset, tok_key, spec_paths):
        try:
            path = self._cache_path(dataset, tok_key, spec_paths)
            if not path.exists():
                return None
            d = np.load(path)
            text_lens, mel_lens = d["text_lens"], d["mel_lens"]
            if len(text_lens) != len(dataset):
                return None
            return text_lens, mel_lens
        except Exception:
            return None

    def _save_length_cache(self, dataset, tok_key, spec_paths) -> None:
        try:
            path = self._cache_path(dataset, tok_key, spec_paths)
            path.parent.mkdir(parents=True, exist_ok=True)
            tmp = path.with_suffix(".tmp.npz")
            np.savez(tmp, text_lens=self.text_lens, mel_lens=self.mel_lens)
            tmp.replace(path)
        except Exception:
            pass  # cache is an optimization; never fail construction over it

    def __len__(self):
        n = 0
        for b in self.buckets:
            if self.drop_last:
                n += len(b.indices) // self.batch_size
            else:
                n += math.ceil(len(b.indices) / self.batch_size)
        return n

    def _weights(self, indices: Sequence[int]) -> np.ndarray:
        """Inverse-frequency weights over (language, speaker) classes.

        Class frequencies are CORPUS-GLOBAL (reference semantics: everyvoice
        BaseDataModule builds one WeightedRandomSampler over the whole
        dataset), then normalized within the bucket being drawn from — so a
        speaker concentrated in one length bucket is still re-weighted
        against the full corpus, not just its bucket-mates."""
        from collections import Counter

        if not hasattr(self, "_global_counts"):
            self._global_counts = Counter(
                (
                    item.get("language") or "default",
                    item.get("speaker") or "default",
                )
                for item in self.dataset.items
            )
        keys = [
            (
                self.dataset.items[i].get("language") or "default",
                self.dataset.items[i].get("speaker") or "default",
            )
            for i in indices
        ]
        w = np.array([1.0 / self._global_counts[k] for k in keys])
        return w / w.sum()

    def __iter__(self) -> Iterator[dict]:
        order_per_bucket = []
        for b in self.buckets:
            idx = np.array(b.indices)
            if self.use_weighted_sampler and len(idx) > 0:
                idx = self.rng.choice(
                    idx, size=len(idx), replace=True, p=self._weights(b.indices)
                )
            else:
                idx = self.rng.permutation(idx)
            order_per_bucket.append(idx)

        batches = []
        for b, idx in zip(self.buckets, order_per_bucket):
            for start in range(0, len(idx), self.batch_size):
                chunk = idx[start : start + self.batch_size]
                n_real = len(chunk)
                if n_real < self.batch_size:
                    if self.drop_last or n_real == 0:
                        continue
                    # fill with arbitrary bucket-mates to keep the shape
                    # static; filled rows get sample_weight 0 so they carry
                    # NO gradient (the reference's DataLoader just emits a
                    # smaller final batch — zero-weight fill matches its
                    # per-epoch gradient semantics at a static shape)
                    reps = self.rng.choice(idx, self.batch_size - n_real)
                    chunk = np.concatenate([chunk, reps])
                batches.append((b, chunk, n_real))
        self.rng.shuffle(batches)

        vp = self.dataset.config.model.variance_predictors
        levels = {"pitch": vp.pitch.level, "energy": vp.energy.level}
        pi, pc = self.shard
        for b, chunk, n_real in batches:
            weights = np.ones(len(chunk), dtype=np.float32)
            weights[n_real:] = 0.0
            if pc > 1:
                # every process computed the identical global (chunk,
                # weights) above; load/collate only this process's rows
                per = self.batch_size // pc
                chunk = chunk[pi * per : (pi + 1) * per]
                weights = weights[pi * per : (pi + 1) * per]
            samples = [self.dataset[int(i)] for i in chunk]
            batch = collate(
                samples,
                pad_text_to=b.max_text,
                pad_mel_to=b.max_mel,
                learn_alignment=self.dataset.config.model.learn_alignment,
                variance_levels=levels,
            )
            batch["sample_weight"] = weights
            # host-only: the GLOBAL real-sample count, for cross-host-
            # consistent validation weighting (per-shard weight sums differ)
            batch["n_real_global"] = n_real
            yield batch


def load_datasets(
    config: FastSpeech2Config,
    lang2id: LookupTable,
    speaker2id: LookupTable,
):
    """(train_dataset, val_dataset) from the config's filelists."""
    train_items = load_filelist(config.training.training_filelist)
    val_items = load_filelist(config.training.validation_filelist)
    train = FastSpeechDataset(train_items, config, lang2id, speaker2id)
    val = FastSpeechDataset(val_items, config, lang2id, speaker2id)
    return train, val
