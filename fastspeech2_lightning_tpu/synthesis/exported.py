"""Compile-free serving artifacts via jax.export (StableHLO).

The reference's deployment story is "ship the Lightning checkpoint and the
model code" (fs2/cli/synthesize.py:643 loads the class from the training
package). The TPU-idiomatic story is ahead-of-time lowering: `jax.export`
serializes the traced synthesis programs as StableHLO, so a serving host
needs neither the model code nor a jit compile at request time — only this
loader, the artifact, and a JAX runtime.

    fs2t export-serving <ckpt> -o model.fs2x -v vocoder.npz
    ...
    synth = ExportedSynthesizer("model.fs2x")
    result = synth.synthesize(["hello world"])    # same SynthesisResult

Artifact layout (one zip file, extension .fs2x):

    meta.json             format version, config dump, stats, lookups,
                          program manifests, audio params
    params.npz            acoustic model variables, "/"-joined key paths
    vocoder_params.npz    HiFiGAN generator params (when exported with one)
    acoustic/B{B}_L{L}_T{T}.jaxexp    serialized Exported blobs; weights are
    vocoder/B{B}_T{T}.jaxexp          passed as ARGUMENTS, not baked in, so
                                      blobs stay small (StableHLO only)

Programs follow the framework's static-shape discipline: one blob per
(batch, text-bucket, frame-bucket) exactly like `Synthesizer.warmup`'s
compiled-program space. The loader picks the smallest covering bucket, pads,
and slices — identical outputs to the live `Synthesizer`.

Platform notes: blobs execute only on the platforms recorded at export.
Exporting from a CPU process traces the portable (non-Pallas) op set, which
`platforms=("cpu", "tpu")` makes loadable on both; exporting on TPU bakes
the Pallas flash-attention path and is TPU-only (and fastest). The CLI
defaults to the portable set.
"""

from __future__ import annotations

import io
import json
import zipfile
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from ..config import FastSpeech2Config
from ..dataset import PAD_MULT_TEXT, _round_up
from ..text import TextProcessor
from ..type_definitions import Stats
from .api import SynthesisResult

FORMAT_VERSION = "1.0"
_SEP = "/"


# ---------------------------------------------------------------------------
# param pytree <-> flat npz
# ---------------------------------------------------------------------------


def _flatten_tree(tree) -> Dict[str, np.ndarray]:
    import jax

    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        keys = []
        for entry in path:
            key = getattr(entry, "key", getattr(entry, "idx", None))
            keys.append(str(key))
        name = _SEP.join(keys)
        # any separator inside a key segment (leaf included) would mis-nest
        # on _unflatten_tree — fail at export, not at first call in serving
        if any(_SEP in k for k in keys) or name in flat:
            raise ValueError(f"cannot flatten param path {path!r} uniquely")
        flat[name] = np.asarray(leaf)
    return flat


def _unflatten_tree(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for name, arr in flat.items():
        node = tree
        *parents, leaf = name.split(_SEP)
        for p in parents:
            node = node.setdefault(p, {})
        node[leaf] = arr
    return tree


def _npz_bytes(flat: Dict[str, np.ndarray]) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **flat)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# export
# ---------------------------------------------------------------------------


def _frame_bucket(L: int, cap: int) -> int:
    """Same text-length-derived frame estimate as Synthesizer.synthesize."""
    return min(cap, _round_up(12 * L, 128))


def default_text_buckets(config, stats) -> List[int]:
    """Every PAD_MULT_TEXT multiple up to the chunker's max emit length —
    the same serving shape set Synthesizer.warmup precompiles."""
    from ..config import DatasetTextRepresentation
    from .prepare import get_text_split_params

    try:
        _, maxi, _, _ = get_text_split_params(
            stats, DatasetTextRepresentation.characters, config, None
        )
    except Exception:
        maxi = 128
    top = _round_up(max(int(maxi), PAD_MULT_TEXT), PAD_MULT_TEXT)
    return list(range(PAD_MULT_TEXT, top + 1, PAD_MULT_TEXT))


def export_serving_artifact(
    ckpt_path: Path | str,
    out_path: Path | str,
    vocoder_path: Optional[Path | str] = None,
    batch_sizes: Sequence[int] = (1, 8),
    text_buckets: Optional[Sequence[int]] = None,
    max_frames: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
    use_ema: bool = False,
    streaming_windows: Sequence[int] = (128,),
) -> Path:
    """Lower the serving program set to StableHLO and write one .fs2x zip.

    Weights travel as npz entries and are passed to the blobs as call
    arguments, so the artifact holds each program once and the parameters
    once (not params x programs).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from .synthesize import load_model_from_checkpoint

    (
        model, variables, config, stats, lang2id, speaker2id, step,
    ) = load_model_from_checkpoint(Path(ckpt_path), use_ema=use_ema)
    cap = int(max_frames or config.model.max_mel_length)
    if text_buckets is None:
        text_buckets = default_text_buckets(config, stats)
    text_buckets = sorted({int(b) for b in text_buckets})
    batch_sizes = sorted({int(b) for b in batch_sizes})
    mel_key = "postnet_output" if config.model.use_postnet else "output"

    from ..config import TargetTrainingTextRepresentationLevel as _Level

    is_pfs = (
        config.model.target_text_representation_level
        == _Level.phonological_features
    )

    def acoustic_fn(max_target_len: int):
        # pfs-level models take the [B, L, N_PHONOLOGICAL_FEATURES] feature
        # matrix as the text argument (the forward reads batch["pfs"], never
        # batch["text"], at that level — fs2/model.py:72-89 parity)
        def fn(vars_, text, src_lens, speaker_id, language_id,
               pitch, energy, duration):
            batch = {
                "text": None if is_pfs else text,
                "pfs": text if is_pfs else None,
                "src_lens": src_lens,
                "mel": None,
                "mel_lens": None,
                "speaker_id": speaker_id,
                "language_id": language_id,
            }
            ctrl = {"pitch": pitch, "energy": energy, "duration": duration}
            out = model.apply(
                vars_, batch, control=ctrl, inference=True,
                deterministic=True, max_target_len=max_target_len,
            )
            return out[mel_key], out["tgt_lens"], out["duration_rounded"]

        return fn

    def _spec(shape, dtype=np.float32):
        return jax.ShapeDtypeStruct(shape, dtype)

    var_specs = jax.tree_util.tree_map(
        lambda x: _spec(np.shape(x), np.asarray(x).dtype), variables
    )
    scalar = _spec((), np.float32)

    acoustic_manifest = []
    blobs: Dict[str, bytes] = {}
    # (B, L) -> est-frame bucket; the largest L additionally gets the full
    # cap bucket so the loader's duration-overflow re-run has a target
    shapes = []
    for B in batch_sizes:
        for L in text_buckets:
            shapes.append((B, L, _frame_bucket(L, cap)))
        if _frame_bucket(text_buckets[-1], cap) < cap:
            shapes.append((B, text_buckets[-1], cap))
    if is_pfs:
        from ..text.features import N_PHONOLOGICAL_FEATURES

        def _text_spec(B, L):
            return _spec((B, L, N_PHONOLOGICAL_FEATURES), np.float32)
    else:
        def _text_spec(B, L):
            return _spec((B, L), np.int32)

    for B, L, T in shapes:
        fn = jax.jit(acoustic_fn(T))
        exp = jexport.export(fn, platforms=list(platforms) if platforms else None)(
            var_specs,
            _text_spec(B, L),
            _spec((B,), np.int32),
            _spec((B,), np.int32),
            _spec((B,), np.int32),
            scalar, scalar, scalar,
        )
        name = f"acoustic/B{B}_L{L}_T{T}.jaxexp"
        blobs[name] = exp.serialize()
        acoustic_manifest.append({"B": B, "L": L, "T": T, "file": name})

    vocoder_manifest = []
    streaming_manifest = []
    voc_flat = None
    voc_meta = None
    if vocoder_path is not None:
        from ..models.hifigan import hifigan_generator, load_vocoder_params

        vp, vcfg, _extra = load_vocoder_params(Path(vocoder_path))
        voc_flat = _flatten_tree(vp)
        voc_meta = {
            "sampling_rate": vcfg.sampling_rate,
            "hop": vcfg.total_upsampling,
            "margin": vcfg.receptive_margin_frames,
        }
        vp_specs = jax.tree_util.tree_map(
            lambda x: _spec(np.shape(x), np.asarray(x).dtype), vp
        )

        def _export_voc(B: int, T: int):
            fn = jax.jit(
                lambda p, mel, _cfg=vcfg: hifigan_generator(p, mel, _cfg)
            )
            return jexport.export(
                fn, platforms=list(platforms) if platforms else None
            )(vp_specs, _spec((B, T, vcfg.n_mels)))

        frame_buckets = sorted({T for (_B, _L, T) in shapes})
        for B in batch_sizes:
            for T in frame_buckets:
                name = f"vocoder/B{B}_T{T}.jaxexp"
                blobs[name] = _export_voc(B, T).serialize()
                vocoder_manifest.append({"B": B, "T": T, "file": name})
        # low-latency streaming: one B=1 program per (window + 2*margin)
        # slice shape — the windowed_vocode contract (synthesis/streaming.py)
        margin = vcfg.receptive_margin_frames
        for window in sorted({int(w) for w in streaming_windows}):
            W = window + 2 * margin
            name = f"vocoder_streaming/W{window}.jaxexp"
            blobs[name] = _export_voc(1, W).serialize()
            streaming_manifest.append(
                {"window": window, "W": W, "file": name}
            )

    meta = {
        "format_version": FORMAT_VERSION,
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "config": json.loads(config.model_dump_json()),
        "stats": json.loads(stats.model_dump_json()) if stats else None,
        "lang2id": lang2id,
        "speaker2id": speaker2id,
        "mel_key": mel_key,
        "max_frames": cap,
        "hop": config.preprocessing.audio.fft_hop_size,
        "acoustic": acoustic_manifest,
        "vocoder": vocoder_manifest,
        "vocoder_streaming": streaming_manifest,
        "vocoder_meta": voc_meta,
        "global_step": int(step),
        "jax_version": jax.__version__,
    }

    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("meta.json", json.dumps(meta, indent=1))
        zf.writestr("params.npz", _npz_bytes(_flatten_tree(variables)))
        if voc_flat is not None:
            zf.writestr("vocoder_params.npz", _npz_bytes(voc_flat))
        for name, blob in blobs.items():
            zf.writestr(name, blob)
    del jnp  # imported for parity with other modules; silence linters
    return out_path


# ---------------------------------------------------------------------------
# load + serve
# ---------------------------------------------------------------------------


class ExportedSynthesizer:
    """Serve synthesis from a .fs2x artifact — no model code, no checkpoint,
    no jit compile of the model graph (deserialized StableHLO compiles
    directly from the serialized module; with the persistent XLA cache even
    that is a disk hit on restart).

    Mirrors `Synthesizer.synthesize` semantics: bucket selection, row
    padding, duration-overflow re-run at the cap bucket, vocoder trim."""

    def __init__(self, path: Path | str):
        self._zip = zipfile.ZipFile(Path(path), "r")
        self.meta = json.loads(self._zip.read("meta.json"))
        if self.meta.get("format_version") != FORMAT_VERSION:
            raise ValueError(
                f"unsupported artifact format {self.meta.get('format_version')!r}"
            )
        self.config = FastSpeech2Config.model_validate(self.meta["config"])
        self.stats = Stats(**self.meta["stats"]) if self.meta["stats"] else None
        self.lang2id = self.meta["lang2id"]
        self.speaker2id = self.meta["speaker2id"]
        self.text_processor = TextProcessor(self.config.text)
        self.variables = _unflatten_tree(
            dict(np.load(io.BytesIO(self._zip.read("params.npz"))))
        )
        self.vocoder_params = None
        if self.meta["vocoder"]:
            self.vocoder_params = _unflatten_tree(
                dict(np.load(io.BytesIO(self._zip.read("vocoder_params.npz"))))
            )
        self._calls: Dict[str, Any] = {}
        # the server touches this object from several threads (micro-batcher
        # + low-latency request handlers); zipfile reads share one file
        # handle and are NOT thread-safe, so blob loading/deserialization is
        # serialized. Executing the jitted calls afterwards is thread-safe.
        import threading

        self._lock = threading.Lock()

    # -- server-facing surface (serving/server.py duck-types these) ---------

    @property
    def global_step(self) -> int:
        return int(self.meta.get("global_step", 0))

    @property
    def vocoder(self):
        """Truthy sentinel with .sample_rate when wav programs exist —
        the attribute surface serving/server.py reads."""
        if self.vocoder_params is None:
            return None
        if not hasattr(self, "_voc_handle"):
            meta = self.meta["vocoder_meta"]

            class _Handle:
                sample_rate = meta["sampling_rate"]
                hop = meta["hop"]

            self._voc_handle = _Handle()
        return self._voc_handle

    def synthesize_stream(self, text: str, window: int = 128,
                          margin: Optional[int] = None, **kwargs):
        """Low-latency long-form synthesis from the artifact: yield float32
        wav segments as the exported windowed-vocoder programs produce them
        (Synthesizer.synthesize_stream semantics). For mels longer than the
        window slice, every emitted sample's receptive field lies inside
        its slice, so the concatenation equals full-mel vocoding; shorter
        mels route through the bucketed wav path."""
        if self.vocoder_params is None:
            raise ValueError("synthesize_stream requires exported vocoder "
                             "programs (export-serving -v ...)")
        entries = {
            e["window"]: e for e in self.meta.get("vocoder_streaming", [])
        }
        if window not in entries:
            raise ValueError(
                f"window {window} was not exported; available: "
                f"{sorted(entries) or ['<none>']} (re-export with "
                "--streaming-window)"
            )
        if margin is not None and margin != self.meta["vocoder_meta"]["margin"]:
            raise ValueError(
                "margin is fixed at export time to the generator's exact "
                f"receptive field ({self.meta['vocoder_meta']['margin']})"
            )
        entry = entries[window]
        m = self.meta["vocoder_meta"]["margin"]
        hop = self.meta["vocoder_meta"]["hop"]
        W = entry["W"]
        call = self._call(entry["file"])
        kwargs.pop("vocode", None)
        chunks = self._chunk_long_text(text, kwargs.get("language"))
        result = self.synthesize(chunks, vocode=False, **kwargs)
        for i, mel in enumerate(result.mels):
            T = mel.shape[0]
            if T <= W:
                # too short to window: vocode the ALREADY-COMPUTED mel
                # through the bucketed program (no second acoustic forward),
                # padded to the program's exact (B, T) shape
                ventry = self._pick_vocoder(1, max(T, 1))
                mel_in = np.zeros(
                    (ventry["B"], ventry["T"], mel.shape[1]), dtype=np.float32
                )
                mel_in[0, :T] = mel
                wav = np.asarray(
                    self._call(ventry["file"])(self.vocoder_params, mel_in),
                    dtype=np.float32,
                )[0]
                yield wav[: T * hop]
                continue
            for start in range(0, T, window):
                end = min(start + window, T)
                lo = min(max(start - m, 0), T - W)
                wav = np.asarray(
                    call(self.vocoder_params, mel[None, lo : lo + W]),
                    dtype=np.float32,
                )[0]
                yield wav[(start - lo) * hop : (end - lo) * hop]

    def warmup(self, batch_size: int, **_k) -> int:
        """Execute every exported program once (deserialize + first XLA
        compile off the request path). batch_size is ignored — the program
        set is fixed at export time."""
        from ..config import TargetTrainingTextRepresentationLevel as _Level

        is_pfs = (
            self.config.model.target_text_representation_level
            == _Level.phonological_features
        )
        n = 0
        for e in self.meta["acoustic"]:
            if is_pfs:
                from ..text.features import N_PHONOLOGICAL_FEATURES

                text = np.zeros(
                    (e["B"], e["L"], N_PHONOLOGICAL_FEATURES), dtype=np.float32
                )
            else:
                text = np.ones((e["B"], e["L"]), dtype=np.int32)
            self._call(e["file"])(
                self.variables, text,
                np.full(e["B"], e["L"], dtype=np.int32),
                np.zeros(e["B"], dtype=np.int32),
                np.zeros(e["B"], dtype=np.int32),
                np.float32(1.0), np.float32(1.0), np.float32(1.0),
            )
            n += 1
        n_mels = self.config.preprocessing.audio.n_mels
        for e in self.meta["vocoder"]:
            mel = np.zeros((e["B"], e["T"], n_mels), dtype=np.float32)
            self._call(e["file"])(self.vocoder_params, mel)
            n += 1
        for e in self.meta.get("vocoder_streaming", []):
            mel = np.zeros((1, e["W"], n_mels), dtype=np.float32)
            self._call(e["file"])(self.vocoder_params, mel)
            n += 1
        return n

    # -- program lookup -----------------------------------------------------

    def _call(self, file: str):
        fn = self._calls.get(file)
        if fn is None:
            with self._lock:
                fn = self._calls.get(file)
                if fn is None:
                    import jax
                    from jax import export as jexport

                    exp = jexport.deserialize(self._zip.read(file))
                    # jit gives standard call-site caching for repeats
                    fn = self._calls[file] = jax.jit(exp.call)
        return fn

    def _pick_acoustic(self, B: int, L: int, min_T: int = 0) -> dict:
        """Smallest covering (B', L', T') program."""
        fits = [
            e for e in self.meta["acoustic"]
            if e["B"] >= B and e["L"] >= L and e["T"] >= min_T
        ]
        if not fits:
            raise ValueError(
                f"no exported acoustic program covers batch={B}, text_len={L}"
                f", frames>={min_T} (exported: {self.meta['acoustic']})"
            )
        return min(fits, key=lambda e: (e["B"], e["L"], e["T"]))

    def _pick_vocoder(self, B: int, T: int) -> dict:
        fits = [
            e for e in self.meta["vocoder"] if e["B"] >= B and e["T"] >= T
        ]
        if not fits:
            raise ValueError(
                f"no exported vocoder program covers batch={B}, frames={T}"
            )
        return min(fits, key=lambda e: (e["B"], e["T"]))

    # -- serving ------------------------------------------------------------

    def synthesize(
        self,
        texts: List[str],
        language: Optional[str] = None,
        speaker: Optional[str] = None,
        pitch_control: float = 1.0,
        energy_control: float = 1.0,
        duration_control: float = 1.0,
        vocode: bool = True,
    ) -> SynthesisResult:
        import jax

        from .prepare import encode_texts_for_model

        # validate names BEFORE encoding (wrong-error ordering otherwise —
        # see Synthesizer.synthesize)
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
        max_B = max(e["B"] for e in self.meta["acoustic"])
        if B > max_B:
            # micro-batch oversized requests through the largest exported
            # batch program and stitch the per-utterance results
            parts = [
                self.synthesize(
                    texts[i : i + max_B], language=language, speaker=speaker,
                    pitch_control=pitch_control,
                    energy_control=energy_control,
                    duration_control=duration_control, vocode=vocode,
                )
                for i in range(0, B, max_B)
            ]
            return SynthesisResult(
                mels=[m for p in parts for m in p.mels],
                durations=[d for p in parts for d in p.durations],
                wavs=(
                    [w for p in parts for w in p.wavs]
                    if parts[0].wavs is not None else None
                ),
                sample_rate=parts[0].sample_rate,
            )
        L = _round_up(max(len(e) for e in encoded), PAD_MULT_TEXT)

        def run(entry):
            eB, eL = entry["B"], entry["L"]
            lens = np.ones(eB, dtype=np.int32)  # pad rows: 1 token
            if pfs_mats is not None:
                # pfs program: the text argument is the feature matrix
                nf = pfs_mats[0].shape[1]
                text = np.zeros((eB, eL, nf), dtype=np.float32)
                for i, m in enumerate(pfs_mats):
                    text[i, : min(len(m), eL)] = m[:eL]
                    lens[i] = len(encoded[i])
            else:
                text = np.zeros((eB, eL), dtype=np.int32)
                for i, e in enumerate(encoded):
                    text[i, : len(e)] = e[:eL]
                    lens[i] = len(e)
            lang_id = self.lang2id.get(language or "", 0) if language else 0
            spk_id = self.speaker2id.get(speaker or "", 0) if speaker else 0
            return self._call(entry["file"])(
                self.variables,
                text,
                lens,
                np.full(eB, spk_id, dtype=np.int32),
                np.full(eB, lang_id, dtype=np.int32),
                np.float32(pitch_control),
                np.float32(energy_control),
                np.float32(duration_control),
            )

        entry = self._pick_acoustic(B, L)
        mel_dev, tgt_lens, dur = run(entry)
        dur, lens = jax.device_get((dur, tgt_lens))
        true_total = int(dur[:B].sum(axis=1).max())
        if true_total > entry["T"]:
            # duration overflow: re-run at the smallest exported program
            # whose frame budget covers it (the cap bucket at minimum)
            bigger = self._pick_acoustic(B, L, min_T=min(
                true_total, self.meta["max_frames"]
            ))
            if bigger["T"] > entry["T"]:
                entry = bigger
                mel_dev, tgt_lens, dur = run(entry)
                dur, lens = jax.device_get((dur, tgt_lens))

        wav_host = None
        if vocode and self.vocoder_params is not None:
            t_need = min(
                _round_up(max(int(lens[:B].max()), 1), 128), entry["T"]
            )
            ventry = self._pick_vocoder(entry["B"], t_need)
            mel_in = mel_dev[:, : ventry["T"]]
            if ventry["T"] > mel_dev.shape[1]:
                import jax.numpy as jnp

                mel_in = jnp.pad(
                    mel_dev,
                    ((0, 0), (0, ventry["T"] - mel_dev.shape[1]), (0, 0)),
                )
            wav_dev = self._call(ventry["file"])(self.vocoder_params, mel_in)
            mels_padded, wav_host = jax.device_get((mel_dev, wav_dev))
        else:
            mels_padded = jax.device_get(mel_dev)

        mels = [mels_padded[i, : lens[i]] for i in range(B)]
        durations = [dur[i, : len(encoded[i])] for i in range(B)]
        wavs = None
        sr = None
        if wav_host is not None:
            sr = self.meta["vocoder_meta"]["sampling_rate"]
            # samples per mel frame = the GENERATOR's total upsampling, not
            # the analysis fft_hop_size (they differ for output-rate-
            # upsampling vocoders; trimming by the analysis hop truncates)
            hop = self.meta["vocoder_meta"]["hop"]
            wav_host = np.asarray(wav_host, dtype=np.float32)
            wavs = [wav_host[i, : lens[i] * hop] for i in range(B)]
        return SynthesisResult(
            mels=mels, durations=durations, wavs=wavs, sample_rate=sr
        )

    def _chunk_long_text(self, text: str, language=None) -> List[str]:
        from .prepare import chunk_text_for_model

        return chunk_text_for_model(text, language, self.config, self.stats)

    def synthesize_long(self, text: str, **kwargs) -> SynthesisResult:
        """Chunk at the corpus-informed boundaries (fs2 chunking semantics,
        mirrors Synthesizer.synthesize_long), synthesize the chunks as one
        batch, and reassemble a single utterance — so arbitrary-length text
        serves from the fixed exported bucket set."""
        chunks = self._chunk_long_text(text, kwargs.get("language"))
        result = self.synthesize(chunks, **kwargs)
        mel = np.concatenate(result.mels, axis=0)
        durations = np.concatenate(result.durations)
        wavs = (
            [np.concatenate(result.wavs)] if result.wavs is not None else None
        )
        return SynthesisResult(
            mels=[mel], durations=[durations], wavs=wavs,
            sample_rate=result.sample_rate,
        )

    def close(self):
        self._zip.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
