"""Deterministic formant-synthesis corpus generator for quality training runs.

The sandbox has no real speech data, so this builds the most speech-like
corpus a closed environment allows: a Klatt-style cascade formant
synthesizer (voiced impulse-train source + three time-varying second-order
resonators + shaped-noise frication/aspiration paths) driven by per-character
acoustic targets. Every character has a distinct, consistent spectral
signature, utterances carry real F0 declination/accent contours and
per-utterance speaking-rate variation, so the full FastSpeech2 task is
learnable end to end: the aligner must discover the monotonic text-mel map
(MAS), the variance adaptor must predict genuinely varying duration / pitch /
energy targets, and the vocoder sees harmonic + noise spectra.

Everything is deterministic given (--seed, text): re-running the script
reproduces the corpus bit-exactly.

Usage:
    python tools/make_corpus.py OUTDIR [--n-train 320] [--n-val 32] [--seed 0]

Writes OUTDIR/{wavs/*.wav, filelist.psv, config.yaml} ready for
`fs2t preprocess OUTDIR/config.yaml`.

Reference role: stands in for a real corpus in the reference's
readme-documented workflow (reference readme.md:30-38 — preprocess/train/
synthesize on user-supplied speech data).
"""

from __future__ import annotations

import argparse
import sys
from dataclasses import dataclass, replace
from pathlib import Path

import numpy as np
from scipy.signal import butter, lfilter

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from fastspeech2_lightning_tpu.preprocessing.pipeline import save_wav  # noqa: E402
from fastspeech2_lightning_tpu.utils import write_filelist  # noqa: E402

SR = 22050
BLOCK = 128  # ~5.8 ms control blocks


@dataclass(frozen=True)
class Seg:
    """One acoustic segment: formant targets + source mix + duration."""

    f1: float = 500.0
    f2: float = 1500.0
    f3: float = 2500.0
    voiced: float = 0.0       # impulse-train gain through the cascade
    aspir: float = 0.0        # noise gain through the cascade
    fric: float = 0.0         # noise gain through the sibilant band filter
    band: str = "none"        # sibilant filter bank: s / sh / f / none
    amp: float = 1.0
    dur: float = 0.08         # seconds (before rate scaling / jitter)


@dataclass(frozen=True)
class Speaker:
    """Synthetic voice: F0 register + vocal-tract (formant) scale.

    Distinct speakers give the multispeaker embedding (reference
    fs2/model.py:131-140) something real to learn: the same text rendered
    by `high` sits ~1.6x above `low` in F0 and ~17% higher in every
    formant (a shorter vocal tract), so speaker identity is audible and
    measurable in the output."""

    name: str
    f0_lo: float
    f0_hi: float
    formant_scale: float


SPEAKERS: dict[str, Speaker] = {
    "default": Speaker("default", 115.0, 165.0, 1.0),
    "low": Speaker("low", 108.0, 146.0, 1.0),
    "high": Speaker("high", 186.0, 236.0, 1.17),
}


@dataclass(frozen=True)
class Language:
    """Synthetic language: its own lexicon (symbol inventory subset) and
    its own prosody. `beto` is mora-timed-like — near-uniform segment
    durations, flatter declination, smaller accents — so the language
    embedding (reference fs2/model.py:142-151) carries prosodic signal
    beyond what the symbol identities already encode."""

    name: str
    words: tuple[str, ...]
    rate_lo: float
    rate_hi: float
    jitter_lo: float
    jitter_hi: float
    declination: float  # F0 fall over the utterance (fraction of base)
    accent_lo: float
    accent_hi: float


def _cv_words(n: int = 110) -> tuple[str, ...]:
    """Deterministic CV-syllable lexicon for the `beto` language: 7
    consonants x 5 vowels, 2-4 syllables — a 12-letter inventory, disjoint
    phonotactics from the English-like `alpha` word list."""
    rng = np.random.default_rng(987654321)
    cons, vows = "ktpmnsh", "aiueo"
    out: list[str] = []
    seen: set[str] = set()
    while len(out) < n:
        k = int(rng.integers(2, 5))
        w = "".join(
            cons[int(rng.integers(len(cons)))] + vows[int(rng.integers(len(vows)))]
            for _ in range(k)
        )
        if w not in seen:
            seen.add(w)
            out.append(w)
    return tuple(out)


# LANGUAGES defined after WORDS below.

# GST style axes — deliberately NOT a filelist column: the style encoder
# (reference fs2/gst/model.py:103-257) must discover them unsupervised
# from the reference mel. Recorded in a styles.psv sidecar only so the
# post-training evaluation can pick style-reference audio per style.
STYLES: dict[str, dict[str, float]] = {
    "neutral": dict(f0_mul=1.0, rate_mul=1.0, accent_mul=1.0),
    "bright": dict(f0_mul=1.22, rate_mul=0.85, accent_mul=1.9),
    "calm": dict(f0_mul=0.88, rate_mul=1.18, accent_mul=0.45),
}


_V = dict(voiced=1.0, amp=1.0, dur=0.125)
# fmt: off
CHARS: dict[str, tuple[Seg, ...]] = {
    "a": (Seg(800, 1200, 2500, **_V),),
    "e": (Seg(500, 1900, 2500, **_V),),
    "i": (Seg(310, 2300, 3000, **_V),),
    "o": (Seg(500, 900, 2400, **_V),),
    "u": (Seg(330, 800, 2250, **_V),),
    "y": (Seg(300, 2150, 2900, voiced=1.0, amp=0.8, dur=0.09),),
    "w": (Seg(350, 750, 2300, voiced=1.0, amp=0.8, dur=0.09),),
    "l": (Seg(380, 1050, 2600, voiced=1.0, amp=0.7, dur=0.08),),
    "r": (Seg(420, 1250, 1650, voiced=1.0, amp=0.7, dur=0.08),),
    "m": (Seg(260, 1100, 2200, voiced=1.0, amp=0.55, dur=0.085)),
    "n": (Seg(260, 1600, 2500, voiced=1.0, amp=0.55, dur=0.085)),
    "v": (Seg(300, 1300, 2400, voiced=0.7, fric=0.25, band="f", amp=0.6, dur=0.075),),
    "z": (Seg(280, 1700, 2600, voiced=0.6, fric=0.5, band="s", amp=0.6, dur=0.085),),
    "j": (Seg(280, 1900, 2700, voiced=0.6, fric=0.45, band="sh", amp=0.6, dur=0.085),),
    "f": (Seg(400, 1500, 2500, fric=0.8, band="f", amp=0.5, dur=0.095),),
    "s": (Seg(400, 1700, 2600, fric=1.0, band="s", amp=0.55, dur=0.105),),
    "x": (Seg(400, 1700, 2600, fric=0.9, band="sh", amp=0.55, dur=0.11),),
    "c": (Seg(400, 1800, 2600, fric=0.9, band="sh", amp=0.5, dur=0.1),),
    "h": (Seg(500, 1500, 2500, aspir=0.8, amp=0.45, dur=0.07),),
    # plosives: closure (near-silence) + burst + short aspiration/voice bar
    "p": (Seg(amp=0.0, dur=0.055), Seg(700, 1100, 2400, fric=0.9, band="f", amp=0.8, dur=0.028)),
    "t": (Seg(amp=0.0, dur=0.055), Seg(500, 1800, 2600, fric=1.0, band="s", amp=0.8, dur=0.028)),
    "k": (Seg(amp=0.0, dur=0.055), Seg(450, 1500, 2400, fric=0.95, band="sh", amp=0.8, dur=0.03)),
    "b": (Seg(250, 1100, 2300, voiced=0.35, amp=0.25, dur=0.045), Seg(600, 1100, 2400, fric=0.5, band="f", amp=0.7, dur=0.022)),
    "d": (Seg(250, 1700, 2500, voiced=0.35, amp=0.25, dur=0.045), Seg(450, 1800, 2600, fric=0.6, band="s", amp=0.7, dur=0.022)),
    "g": (Seg(250, 1500, 2400, voiced=0.35, amp=0.25, dur=0.045), Seg(400, 1500, 2400, fric=0.55, band="sh", amp=0.7, dur=0.024)),
    "q": (Seg(amp=0.0, dur=0.055), Seg(450, 1400, 2400, fric=0.9, band="sh", amp=0.8, dur=0.03)),
    " ": (Seg(amp=0.0, dur=0.07),),
}
# fmt: on
# two entries above are single Segs not tuples (m, n) — normalize
for _k, _v in list(CHARS.items()):
    if isinstance(_v, Seg):
        CHARS[_k] = (_v,)

WORDS = [
    "amber", "anchor", "autumn", "basil", "beacon", "bellow", "birch",
    "bloom", "border", "breeze", "candle", "canyon", "cedar", "cinder",
    "clover", "coral", "crystal", "dawn", "delta", "drift", "ember",
    "evening", "falcon", "fable", "feather", "fern", "flint", "garden",
    "glacier", "golden", "granite", "grove", "harbor", "hazel", "hollow",
    "horizon", "island", "ivory", "jasper", "juniper", "kestrel", "lagoon",
    "lantern", "lark", "linden", "lumen", "maple", "meadow", "mellow",
    "mirror", "morning", "moss", "myrtle", "nectar", "north", "oasis",
    "ocean", "opal", "orchard", "osprey", "pebble", "pine", "plume",
    "prairie", "quartz", "quiet", "raven", "ridge", "river", "rowan",
    "saffron", "sage", "shadow", "shore", "silver", "sorrel", "spruce",
    "stone", "summer", "sundial", "tallow", "tamarind", "tether", "thistle",
    "timber", "tundra", "umber", "valley", "velvet", "violet", "walnut",
    "water", "willow", "winter", "wren", "yarrow", "zephyr", "under",
    "over", "beside", "beyond", "early", "gentle", "quiet", "slow",
    "bright", "deep", "cold", "warm", "wide", "small", "old", "new",
]

LANGUAGES: dict[str, Language] = {
    "default": Language(
        "default", tuple(WORDS), 0.88, 1.15, 0.88, 1.12, 0.24, -0.10, 0.14
    ),
    "alpha": Language(
        "alpha", tuple(WORDS), 0.88, 1.15, 0.88, 1.12, 0.24, -0.10, 0.14
    ),
    "beto": Language(
        "beto", _cv_words(), 0.94, 1.08, 0.97, 1.03, 0.10, -0.04, 0.06
    ),
}


def _resonator(f: np.ndarray, bw: float):
    """Batched Klatt second-order resonator coefficients per block."""
    r = np.exp(-np.pi * bw / SR)
    theta = 2 * np.pi * np.clip(f, 50.0, SR / 2 - 200.0) / SR
    a1 = -2 * r * np.cos(theta)
    a2 = np.full_like(f, r * r)
    b0 = 1 + a1 + a2  # unity gain at DC
    return b0, a1, a2


_BANDS = {
    "s": butter(2, 4500 / (SR / 2), "highpass"),
    "sh": butter(2, [1800 / (SR / 2), 6500 / (SR / 2)], "bandpass"),
    "f": butter(1, [900 / (SR / 2), 8200 / (SR / 2)], "bandpass"),
}


def _segments(
    text: str,
    rng: np.random.Generator,
    rate: float,
    jitter_lo: float = 0.88,
    jitter_hi: float = 1.12,
) -> list[Seg]:
    segs: list[Seg] = [Seg(amp=0.0, dur=0.1)]  # leading silence
    for ch in text:
        for seg in CHARS.get(ch, CHARS[" "]):
            jitter = float(rng.uniform(jitter_lo, jitter_hi))
            segs.append(replace(seg, dur=seg.dur * rate * jitter))
    segs.append(Seg(amp=0.0, dur=0.12))  # trailing silence
    return segs


def _smooth(x: np.ndarray, w: int) -> np.ndarray:
    k = np.ones(w) / w
    return np.convolve(np.pad(x, (w // 2, w - 1 - w // 2), mode="edge"), k, "valid")


def synthesize(
    text: str,
    seed: int,
    return_tracks: bool = False,
    speaker: str = "default",
    language: str = "default",
    style: str = "neutral",
):
    """Render one utterance deterministically from (text, seed, speaker,
    language, style).

    With return_tracks=True also returns the analytic ground truth the
    synthesizer was driven with — per-sample F0 (Hz) and voicing gain —
    which makes corpus audio a golden source for validating the YIN F0
    tracker's semantics (absolute Hz accuracy, voicing decisions, octave
    stability) on speech-like signals. The reference gets this validation
    for free by depending on pyworld (SURVEY.md §2.3); pyworld is not in
    this image, so the analytically-known contour is the strongest
    available substitute.

    Conditioning (defaults reproduce the pre-conditioned corpus exactly):
    speaker sets the F0 register and a global formant scale; language sets
    the rhythm (rate/jitter ranges) and intonation (declination/accent
    spans); style multiplies F0 / rate / accent on top — the unsupervised
    axis the GST module must discover from the mel."""
    spk = SPEAKERS[speaker]
    lang = LANGUAGES[language]
    sty = STYLES[style]
    rng = np.random.default_rng(seed)
    rate = float(rng.uniform(lang.rate_lo, lang.rate_hi)) * sty["rate_mul"]
    f0_base = float(rng.uniform(spk.f0_lo, spk.f0_hi)) * sty["f0_mul"]
    segs = _segments(text, rng, rate, lang.jitter_lo, lang.jitter_hi)

    # per-block target tracks
    nblocks_per = [max(1, int(round(s.dur * SR / BLOCK))) for s in segs]
    nb = sum(nblocks_per)
    tr = {k: np.zeros(nb) for k in ("f1", "f2", "f3", "v", "asp", "fric", "amp")}
    band_of_block = np.zeros(nb, dtype=np.int8)  # 0 none, 1 s, 2 sh, 3 f
    band_idx = {"none": 0, "s": 1, "sh": 2, "f": 3}
    accent = np.zeros(nb)
    pos = 0
    fs = spk.formant_scale
    for s, n in zip(segs, nblocks_per):
        sl = slice(pos, pos + n)
        tr["f1"][sl], tr["f2"][sl], tr["f3"][sl] = s.f1 * fs, s.f2 * fs, s.f3 * fs
        tr["v"][sl], tr["asp"][sl], tr["fric"][sl] = s.voiced, s.aspir, s.fric
        tr["amp"][sl] = s.amp
        band_of_block[sl] = band_idx[s.band]
        if s.voiced >= 1.0:  # full vowels carry pitch accents
            accent[sl] = rng.uniform(
                lang.accent_lo * sty["accent_mul"],
                lang.accent_hi * sty["accent_mul"],
            )
        pos += n

    # coarticulation: smooth formants/gains over ~30 ms
    for k in ("f1", "f2", "f3"):
        tr[k] = _smooth(tr[k], 5)
    for k in ("v", "asp", "amp"):
        tr[k] = _smooth(tr[k], 3)

    # F0: declination + accents + slow wander + sentence-final fall
    t01 = np.linspace(0, 1, nb)
    wander = _smooth(rng.standard_normal(nb), 25) * 0.02
    decl = lang.declination
    f0 = (
        f0_base
        * (1.0 + decl / 2.0 - decl * t01)
        * (1 + _smooth(accent, 9))
        * (1 + wander)
    )
    f0[-max(nb // 10, 1):] *= np.linspace(1.0, 0.82, max(nb // 10, 1))

    n = nb * BLOCK
    # voiced source: impulse train from a phase accumulator, then a leaky
    # integrator for a -6 dB/oct glottal-ish rolloff
    phase = np.cumsum(np.repeat(f0, BLOCK) / SR)
    pulses = np.diff(np.floor(phase), prepend=0.0)
    voiced_src = lfilter([1.0], [1.0, -0.94], pulses)
    noise = rng.standard_normal(n) * 0.18

    # cascade excitation per block (voicing + aspiration), time-varying filter
    v_g = np.repeat(tr["v"], BLOCK)
    a_g = np.repeat(tr["asp"], BLOCK)
    excite = voiced_src * v_g + noise * a_g
    out = np.zeros(n)
    zi = [np.zeros(2) for _ in range(3)]
    b0s, a1s, a2s = [], [], []
    for f, bw in ((tr["f1"], 90.0), (tr["f2"], 120.0), (tr["f3"], 170.0)):
        c = _resonator(f, bw)
        b0s.append(c[0]); a1s.append(c[1]); a2s.append(c[2])
    for blk in range(nb):
        sl = slice(blk * BLOCK, (blk + 1) * BLOCK)
        y = excite[sl]
        for j in range(3):
            y, zi[j] = lfilter(
                [b0s[j][blk]], [1.0, a1s[j][blk], a2s[j][blk]], y, zi=zi[j]
            )
        out[sl] = y

    # sibilant path: band-shaped noise added after the cascade
    fric_g = np.repeat(tr["fric"], BLOCK)
    if fric_g.any():
        fric_noise = rng.standard_normal(n) * 0.35
        for name, idx in (("s", 1), ("sh", 2), ("f", 3)):
            mask = np.repeat(band_of_block == idx, BLOCK)
            if mask.any():
                b, a = _BANDS[name]
                shaped = lfilter(b, a, fric_noise)
                out += shaped * fric_g * mask

    out *= np.repeat(tr["amp"], BLOCK)
    out += rng.standard_normal(n) * 1e-4  # tiny floor so "silence" is real audio
    peak = np.max(np.abs(out)) + 1e-9
    wav = (out / peak * 0.55).astype(np.float32)
    if return_tracks:
        truth = {
            "f0": np.repeat(f0, BLOCK).astype(np.float32),
            # voicing as delivered to the source: voiced gain x amplitude
            "voicing": (v_g * np.repeat(tr["amp"], BLOCK)).astype(np.float32),
        }
        return wav, truth
    return wav


def make_texts(
    n: int, rng: np.random.Generator, words: list[str] | tuple[str, ...] = WORDS
) -> list[str]:
    texts = []
    seen = set()
    while len(texts) < n:
        k = int(rng.integers(3, 9))
        picked = [words[int(rng.integers(len(words)))] for _ in range(k)]
        t = " ".join(picked)
        if t in seen:
            continue
        seen.add(t)
        texts.append(t)
    return texts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir", type=Path)
    ap.add_argument("--n-train", type=int, default=320)
    ap.add_argument("--n-val", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--conditioned",
        action="store_true",
        help="2 speakers (low/high register) x 2 languages (alpha/beto "
        "lexicons+prosody) x 3 unsupervised styles; config enables "
        "multispeaker + multilingual + GST",
    )
    args = ap.parse_args()

    ws = args.outdir
    (ws / "wavs").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    n_total = args.n_train + args.n_val
    rows = []
    style_rows = []
    total_s = 0.0
    if args.conditioned:
        speakers = ["low", "high"]
        languages = ["alpha", "beto"]
        style_names = list(STYLES)
        # per-language text pools (disjoint lexicons/phonotactics)
        texts_by_lang = {
            ln: make_texts(
                (n_total + len(languages) - 1) // len(languages),
                rng,
                LANGUAGES[ln].words,
            )
            for ln in languages
        }
        cells = []
        for i in range(n_total):
            spk = speakers[i % 2]
            ln = languages[(i // 2) % 2]
            sty = style_names[int(rng.integers(len(style_names)))]
            cells.append((spk, ln, sty))
        counters = {ln: 0 for ln in languages}
        for i, (spk, ln, sty) in enumerate(cells):
            text = texts_by_lang[ln][counters[ln]]
            counters[ln] += 1
            wav = synthesize(
                text, seed=args.seed * 1_000_003 + i,
                speaker=spk, language=ln, style=sty,
            )
            total_s += len(wav) / SR
            save_wav(ws / "wavs" / f"utt{i:04d}.wav", wav, SR)
            rows.append({"basename": f"utt{i:04d}", "text": text,
                         "speaker": spk, "language": ln})
            style_rows.append({"basename": f"utt{i:04d}", "style": sty})
        # styles are NOT in the model filelist — GST must discover them;
        # the sidecar lets eval pick style-reference audio per style
        write_filelist(style_rows, ws / "styles.psv")
    else:
        texts = make_texts(n_total, rng)
        for i, text in enumerate(texts):
            wav = synthesize(text, seed=args.seed * 1_000_003 + i)
            total_s += len(wav) / SR
            save_wav(ws / "wavs" / f"utt{i:04d}.wav", wav, SR)
            rows.append({"basename": f"utt{i:04d}", "text": text,
                         "speaker": "default", "language": "default"})
    write_filelist(rows, ws / "filelist.psv")

    import yaml

    model_cfg: dict = {"learn_alignment": True}
    if args.conditioned:
        model_cfg.update(
            multispeaker=True,
            multilingual=True,
            use_global_style_token_module=True,
        )
    config = {
        "model": model_cfg,
        "preprocessing": {
            "save_dir": str(ws / "preprocessed"),
            "source_data": [{"data_dir": str(ws / "wavs"),
                             "filelist": str(ws / "filelist.psv")}],
        },
        "training": {
            "batch_size": 16,
            "val_check_interval": 250,
            "training_filelist": str(ws / "preprocessed" / "training_filelist.psv"),
            "validation_filelist": str(ws / "preprocessed" / "validation_filelist.psv"),
            "logger": {"save_dir": str(ws / "logs")},
        },
        "text": {"symbols": {"letters": list("abcdefghijklmnopqrstuvwxyz")}},
    }
    (ws / "config.yaml").write_text(yaml.safe_dump(config))
    print(f"wrote {len(rows)} utterances ({total_s / 60:.1f} min audio), "
          f"config -> {ws / 'config.yaml'}")


if __name__ == "__main__":
    main()
