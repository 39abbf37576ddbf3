"""High-level synthesis API for serving.

The CLI path re-prepares data and re-jits per invocation; production serving
wants a resident object with compiled programs. `Synthesizer` loads a
checkpoint (and optional vocoder) once, keeps jitted synthesis functions
per (batch, text-length) shape, and exposes text -> (mel, durations, wav).

    synth = Synthesizer.from_checkpoint("logs/.../step=5000",
                                        vocoder_path="vocoder.ckpt")
    result = synth.synthesize(["hello world", "how are you"])
    result.mels[0]      # [T0, n_mels]
    result.wavs[0]      # [T0 * hop] float32 (when a vocoder is loaded)

Shapes are bucketed (text padded to multiples of 16, capped batch) so a warm
server sees no recompiles."""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..config import FastSpeech2Config
from ..dataset import _round_up, PAD_MULT_TEXT
from ..text import TextProcessor
from ..type_definitions import Stats


@dataclasses.dataclass
class SynthesisResult:
    mels: List[np.ndarray]  # per-utterance [T_i, n_mels]
    durations: List[np.ndarray]  # per-utterance [L_i] frames
    wavs: Optional[List[np.ndarray]]  # per-utterance samples (if vocoder)
    sample_rate: Optional[int]


class Synthesizer:
    def __init__(
        self,
        model,
        variables: dict,
        config: FastSpeech2Config,
        stats: Optional[Stats],
        lang2id: dict,
        speaker2id: dict,
        vocoder=None,
        max_frames: Optional[int] = None,
        mesh=None,
    ):
        self.model = model
        self.variables = variables
        self.config = config
        self.stats = stats
        self.lang2id = lang2id
        self.speaker2id = speaker2id
        self.vocoder = vocoder
        self.text_processor = TextProcessor(config.text)
        self.max_frames = max_frames or config.model.max_mel_length
        self._predict_cache: Dict = {}
        # data-parallel serving: batch rows shard over the mesh's data axis,
        # variables replicate; XLA GSPMD handles the rest (no collectives in
        # the forward — rows are independent)
        self.mesh = mesh
        if mesh is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            self.variables = jax.device_put(
                variables, NamedSharding(mesh, P())
            )

    @classmethod
    def from_checkpoint(
        cls,
        ckpt_path: Path | str,
        vocoder_path: Optional[Path | str] = None,
        max_frames: Optional[int] = None,
        use_ema: bool = False,
        vocoder_precision: str = "float32",
        data_parallel: Optional[int] = None,
    ) -> "Synthesizer":
        """data_parallel: shard request batches over the first N devices
        (None = single device). Rows are independent, so throughput scales
        ~linearly with chips at fixed per-chip batch."""
        from ..models.hifigan import load_vocoder_checkpoint
        from .synthesize import load_model_from_checkpoint

        (
            model, variables, config, stats, lang2id, speaker2id, _step,
        ) = load_model_from_checkpoint(Path(ckpt_path), use_ema=use_ema)
        mesh = None
        if data_parallel is not None and data_parallel > 1:
            from ..parallel.mesh import make_mesh

            mesh = make_mesh(n_devices=data_parallel, model_parallel=1)
        vocoder = None
        from .griffin_lim import GriffinLimVocoder, is_griffin_lim_path

        if vocoder_path is not None and is_griffin_lim_path(vocoder_path):
            # trainless fallback: classical phase recovery on the predicted
            # log-mels (no checkpoint; host-side NumPy)
            vocoder = GriffinLimVocoder(config.preprocessing.audio)
        elif vocoder_path is not None:
            if mesh is not None:
                # mesh-aware vocoder: plain data parallelism when the batch
                # fills the mesh, receptive-field-window sequence parallelism
                # for long low-batch mels (identical output either way)
                from ..models.hifigan import (
                    load_vocoder_params,
                    make_parallel_vocoder_fn,
                )

                vp, vcfg, _ = load_vocoder_params(Path(vocoder_path))
                vocoder = make_parallel_vocoder_fn(
                    vp, vcfg, mesh, precision=vocoder_precision
                )
            else:
                vocoder, _, _ = load_vocoder_checkpoint(
                    Path(vocoder_path), precision=vocoder_precision
                )
        return cls(
            model, variables, config, stats, lang2id, speaker2id,
            vocoder=vocoder, max_frames=max_frames, mesh=mesh,
        )

    def _predict_fn(self, max_len: Optional[int] = None):
        max_len = int(max_len or self.max_frames)
        key = ("fn", max_len)
        if key not in self._predict_cache:
            import jax

            model = self.model

            @functools.partial(jax.jit, static_argnames=())
            def predict(variables, batch, ctrl):
                return model.apply(
                    variables, batch, control=ctrl, inference=True,
                    deterministic=True, max_target_len=max_len,
                )

            self._predict_cache[key] = predict
        return self._predict_cache[key]

    def _style_reference_mel(self, style_reference) -> np.ndarray:
        """[T_ref, n_mels] log-mel for a style-reference wav path (cached
        per path) or a precomputed array. No length padding: the GST
        reference encoder (convs + GRU) is length-sensitive, so padding
        would drift the style embedding vs the CLI path — one compile per
        distinct reference length instead (references are few)."""
        if isinstance(style_reference, np.ndarray):
            ref = style_reference.astype(np.float32)
        else:
            key = str(style_reference)
            if not hasattr(self, "_style_cache"):
                self._style_cache: Dict[str, np.ndarray] = {}
            if key not in self._style_cache:
                from ..preprocessing.features import mel_spectrogram_numpy
                from ..preprocessing.pipeline import load_wav

                a = self.config.preprocessing.audio
                audio = load_wav(Path(style_reference), a.input_sampling_rate)
                self._style_cache[key] = mel_spectrogram_numpy(
                    audio, a.input_sampling_rate, a.n_fft, a.fft_hop_size,
                    a.fft_window_size, a.n_mels, a.f_min, a.f_max,
                    a.spec_type,
                ).T.astype(np.float32)
            ref = self._style_cache[key]
        return ref

    def synthesize(
        self,
        texts: List[str],
        language: Optional[str] = None,
        speaker: Optional[str] = None,
        pitch_control: float = 1.0,
        energy_control: float = 1.0,
        duration_control: float = 1.0,
        adaptive_max_frames: bool = True,
        vocode: bool = True,
        style_reference=None,
    ) -> SynthesisResult:
        """adaptive_max_frames: run the forward at a text-length-derived
        128-multiple frame bucket instead of always max_frames (the decoder,
        postnet, and frame-level variances all scale with T). The predicted
        durations report the TRUE total before clamping, so an underestimate
        is detected and re-run at the exact bucket — output is identical to
        the fixed-max_frames path, short inputs just stop paying for it.
        Costs one jit compile per occupied bucket (first hit only)."""
        from .prepare import encode_texts_for_model

        # reference CLI semantics (fs2/cli/synthesize.py:28-72): unknown
        # names error instead of silently conditioning on id 0. Validate
        # BEFORE encoding: a phones model would otherwise g2p with the
        # fallback engine for the unknown language and raise the wrong error
        if language is not None and language not in self.lang2id:
            raise ValueError(
                f"unknown language {language!r}; available: "
                f"{sorted(self.lang2id) or ['<none>']}"
            )
        if speaker is not None and speaker not in self.speaker2id:
            raise ValueError(
                f"unknown speaker {speaker!r}; available: "
                f"{sorted(self.speaker2id) or ['<none>']}"
            )
        if not hasattr(self, "_encode_cache"):
            self._encode_cache = {}
        encoded, pfs_mats = encode_texts_for_model(
            texts, language, self.config, self.text_processor,
            self._encode_cache,
        )
        if any(len(e) == 0 for e in encoded):
            raise ValueError("one or more inputs contain no known symbols")
        B = len(encoded)
        L = _round_up(max(len(e) for e in encoded), PAD_MULT_TEXT)
        text = np.zeros((B, L), dtype=np.int32)
        for i, e in enumerate(encoded):
            text[i, : len(e)] = e[:L]
        lang_id = self.lang2id.get(language or "", 0) if language else 0
        spk_id = self.speaker2id.get(speaker or "", 0) if speaker else 0
        batch = {
            "text": text,
            "src_lens": np.array([len(e) for e in encoded], dtype=np.int32),
            "mel": None,
            "mel_lens": None,
            "speaker_id": np.full(B, spk_id, dtype=np.int32),
            "language_id": np.full(B, lang_id, dtype=np.int32),
        }
        if pfs_mats is not None:
            # pfs-level model: the forward consumes batch["pfs"] through the
            # bias-free Linear input layer (fs2/model.py:72-89 parity)
            nf = pfs_mats[0].shape[1]
            pfs = np.zeros((B, L, nf), dtype=np.float32)
            for i, m in enumerate(pfs_mats):
                pfs[i, : min(len(m), L)] = m[:L]
            batch["pfs"] = pfs
        if style_reference is not None:
            # GST conditioning on a reference wav (CLI --style-reference
            # parity; fs2/cli/synthesize.py:289-311)
            if not self.config.model.use_global_style_token_module:
                raise ValueError(
                    "style_reference requires a model trained with "
                    "model.use_global_style_token_module"
                )
            ref = self._style_reference_mel(style_reference)
            batch["mel_style_reference"] = np.broadcast_to(
                ref[None], (B, *ref.shape)
            ).copy()
        ctrl = {
            "pitch": np.float32(pitch_control),
            "energy": np.float32(energy_control),
            "duration": np.float32(duration_control),
        }
        if self.mesh is not None:
            # pad the batch to a multiple of the data axis (row-0 copies,
            # sliced off below) and shard rows across the mesh
            from ..parallel.mesh import shard_batch

            n_data = self.mesh.shape["data"]
            pad_rows = _round_up(B, n_data) - B
            if pad_rows:
                for k, v in batch.items():
                    if v is not None:  # every per-row array pads together
                        batch[k] = np.concatenate(
                            [v, np.repeat(v[:1], pad_rows, axis=0)]
                        )
            batch = shard_batch(batch, self.mesh)
        cap = int(self.max_frames)
        # ~12 frames/symbol upper estimate (English @ 22.05 kHz / 256 hop is
        # typically 6-10); the duration-total check below corrects misses
        est = min(cap, _round_up(12 * L, 128)) if adaptive_max_frames else cap
        import jax

        # one round trip for the small arrays (durations drive both the
        # adaptive-bucket check and the returned per-phone durations; lens
        # drives vocoder trimming) — serial np.asarray fetches each pay the
        # relay RTT, a tupled device_get issues them together
        out = self._predict_fn(est)(self.variables, batch, ctrl)
        dur, lens = jax.device_get((out["duration_rounded"], out["tgt_lens"]))
        true_total = int(dur.sum(axis=1).max())
        if est < cap and true_total > est:
            need = min(cap, _round_up(max(true_total, 1), 128))
            out = self._predict_fn(need)(self.variables, batch, ctrl)
            dur, lens = jax.device_get(
                (out["duration_rounded"], out["tgt_lens"])
            )
        key = "postnet_output" if self.config.model.use_postnet else "output"

        wav_dev = None
        if self.vocoder is not None and vocode:
            # trim the padded mels to a 128-multiple of the longest
            # utterance before vocoding: the vocoder dominates pipeline cost
            # (~34x the acoustic model's FLOPs per frame) and scales with T,
            # so short texts shouldn't pay for max_frames. One vocoder jit
            # per distinct bucket (<= max_frames/128 shapes). The mel stays
            # on-device between model and vocoder (device_fn) — no
            # host round-trip on the request path.
            t_need = min(
                _round_up(max(int(lens.max()), 1), 128), out[key].shape[1]
            )
            device_fn = getattr(self.vocoder, "device_fn", None)
            if device_fn is not None:
                if self.mesh is not None:
                    # tell the mesh-aware vocoder how many rows are REAL:
                    # the batch was padded with duplicates to fill the data
                    # axis, and a padded long single request should window-
                    # split the frame axis, not vocode n_dev duplicates
                    wav_dev = device_fn(out[key][:, :t_need], n_real=B)
                else:
                    wav_dev = device_fn(out[key][:, :t_need])
            else:
                wav_dev, _ = self.vocoder(np.asarray(out[key])[:, :t_need])

        # second (and last) round trip: mels and — when vocoding — the wav,
        # fetched together
        if wav_dev is not None:
            mels_padded, wav_host = jax.device_get((out[key], wav_dev))
        else:
            mels_padded = jax.device_get(out[key])
            wav_host = None
        mels = [mels_padded[i, : lens[i]] for i in range(B)]
        durations = [dur[i, : len(encoded[i])] for i in range(B)]

        wavs = None
        sr = None
        if wav_dev is not None:
            sr = getattr(
                self.vocoder, "sample_rate",
                self.config.preprocessing.audio.output_sampling_rate,
            )
            # samples per mel frame = the GENERATOR's total upsampling (an
            # output-rate-upsampling vocoder emits more than fft_hop_size
            # samples per frame; trimming by the analysis hop would truncate)
            hop = int(getattr(
                self.vocoder, "hop",
                self.config.preprocessing.audio.fft_hop_size,
            ))
            wav_host = np.asarray(wav_host, dtype=np.float32)
            wavs = [wav_host[i, : lens[i] * hop] for i in range(B)]
        return SynthesisResult(
            mels=mels, durations=durations, wavs=wavs, sample_rate=sr
        )

    def warmup(
        self,
        batch_size: int,
        text_buckets: Optional[List[int]] = None,
        include_vocoder: bool = True,
    ) -> int:
        """Pre-compile the serving shape set so the first real request never
        stalls on a jit compile (with the persistent compilation cache
        enabled, a restarted server warms from disk in seconds).

        The compiled-program space is (batch_size, text bucket L, frame
        bucket est(L)) for the acoustic forward plus (batch_size, 128k)
        frame buckets for the vocoder. Text buckets default to every
        PAD_MULT_TEXT multiple up to the corpus chunker's max chunk length —
        exactly the lengths the serving splitter can emit.

        Returns the number of distinct programs visited.
        """
        cap = int(self.max_frames)
        if text_buckets is None:
            from .prepare import (
                get_text_split_params,
                representation_for_model,
            )

            try:
                # derive buckets from the MODEL's representation stats —
                # phone-trained models chunk by phone-length stats, and
                # warming character-derived buckets would miss the shapes
                # the serving splitter actually emits
                _, maxi, _, _ = get_text_split_params(
                    self.stats, representation_for_model(self.config),
                    self.config, None,
                )
            except Exception:
                maxi = 128
            top = _round_up(max(int(maxi), PAD_MULT_TEXT), PAD_MULT_TEXT)
            text_buckets = list(range(PAD_MULT_TEXT, top + 1, PAD_MULT_TEXT))
        ctrl = {
            "pitch": np.float32(1.0),
            "energy": np.float32(1.0),
            "duration": np.float32(1.0),
        }
        # synthesize() pads request rows to a multiple of the mesh's data
        # axis — warm the shapes REQUESTS use, not the raw batch_size
        eff_batch = batch_size
        if self.mesh is not None:
            eff_batch = _round_up(batch_size, self.mesh.shape["data"])
        n = 0
        frame_buckets = set()
        for L in sorted(set(int(b) for b in text_buckets)):
            est = min(cap, _round_up(12 * L, 128))
            frame_buckets.add(est)
            batch = {
                "text": np.ones((eff_batch, L), dtype=np.int32),
                "src_lens": np.full(eff_batch, L, dtype=np.int32),
                "mel": None,
                "mel_lens": None,
                "speaker_id": np.zeros(eff_batch, dtype=np.int32),
                "language_id": np.zeros(eff_batch, dtype=np.int32),
            }
            if self.mesh is not None:
                from ..parallel.mesh import shard_batch

                batch = shard_batch(batch, self.mesh)
            self._predict_fn(est)(self.variables, batch, ctrl)
            n += 1
        if include_vocoder and self.vocoder is not None:
            device_fn = getattr(self.vocoder, "device_fn", None)
            # every 128-multiple the trimmed-vocode path can hit, up to the
            # largest acoustic bucket just compiled
            for t in range(128, max(frame_buckets) + 1, 128):
                mel = np.zeros(
                    (eff_batch, t, self.config.preprocessing.audio.n_mels),
                    dtype=np.float32,
                )
                if device_fn is not None:
                    if self.mesh is not None:
                        device_fn(mel, n_real=batch_size)
                    else:
                        device_fn(mel)
                else:
                    self.vocoder(mel)
                n += 1
        return n

    def _chunk_text(self, text: str, language: Optional[str]) -> List[str]:
        from .prepare import chunk_text_for_model

        return chunk_text_for_model(text, language, self.config, self.stats)

    def synthesize_stream(
        self,
        text: str,
        window: int = 128,
        margin: Optional[int] = None,
        **kwargs,
    ):
        """Low-latency long-form synthesis: yield float32 wav segments as
        they are produced instead of waiting for the whole utterance.

        One acoustic forward covers all text chunks (it is ~34x cheaper per
        frame than the vocoder); the vocoder then runs in fixed
        (window + 2*margin)-frame slices whose concatenation is identical
        to full-utterance vocoding (synthesis/streaming.py). TTFA is one
        acoustic forward + one vocoder window, independent of text length.
        """
        if self.vocoder is None:
            raise ValueError("synthesize_stream requires a loaded vocoder")
        from .streaming import windowed_vocode

        chunks = self._chunk_text(text, kwargs.get("language"))
        result = self.synthesize(chunks, vocode=False, **kwargs)
        for mel in result.mels:
            yield from windowed_vocode(
                self.vocoder, mel, window=window, margin=margin
            )

    def synthesize_long(self, text: str, **kwargs) -> SynthesisResult:
        """Long-form synthesis: chunk at the corpus-informed boundaries
        (fs2 chunking semantics), synthesize the chunks as one batch, and
        reassemble a single utterance."""
        chunks = self._chunk_text(text, kwargs.get("language"))
        result = self.synthesize(chunks, **kwargs)
        mel = np.concatenate(result.mels, axis=0)
        durations = np.concatenate(result.durations)
        wavs = [np.concatenate(result.wavs)] if result.wavs is not None else None
        return SynthesisResult(
            mels=[mel], durations=[durations], wavs=wavs,
            sample_rate=result.sample_rate,
        )
