"""Phonological feature vectors for the 'phonological_features' text
representation (re-provides everyvoice.text.features.N_PHONOLOGICAL_FEATURES,
used by the bias-free Linear text input layer, fs2/model.py:72-81).

A compact panphon-style articulatory feature table: each IPA symbol maps to a
ternary vector (+1 / -1 / 0) over N_PHONOLOGICAL_FEATURES dimensions. Unknown
symbols map to the zero vector. The table is intentionally small but
deterministic — it defines this framework's pfs space."""

from __future__ import annotations

from typing import List

import numpy as np

FEATURE_NAMES = [
    "syl", "son", "cons", "cont", "delrel", "lat", "nas", "strid", "voi",
    "sg", "cg", "ant", "cor", "distr", "lab", "hi", "lo", "back", "round",
    "velaric", "tense", "long", "hitone", "hireg",
]

N_PHONOLOGICAL_FEATURES = len(FEATURE_NAMES)

# symbol -> {feature: value} (+1 plus, -1 minus, unspecified -> 0)
_TABLE = {
    # vowels
    "a": dict(syl=1, son=1, cons=-1, cont=1, voi=1, lo=1, back=-1, tense=1),
    "e": dict(syl=1, son=1, cons=-1, cont=1, voi=1, hi=-1, lo=-1, back=-1, tense=1),
    "i": dict(syl=1, son=1, cons=-1, cont=1, voi=1, hi=1, back=-1, tense=1),
    "o": dict(syl=1, son=1, cons=-1, cont=1, voi=1, hi=-1, lo=-1, back=1, round=1, tense=1),
    "u": dict(syl=1, son=1, cons=-1, cont=1, voi=1, hi=1, back=1, round=1, tense=1),
    "ə": dict(syl=1, son=1, cons=-1, cont=1, voi=1, hi=-1, lo=-1, back=-1),
    "ɛ": dict(syl=1, son=1, cons=-1, cont=1, voi=1, hi=-1, lo=-1, back=-1, tense=-1),
    "ɪ": dict(syl=1, son=1, cons=-1, cont=1, voi=1, hi=1, back=-1, tense=-1),
    "ɔ": dict(syl=1, son=1, cons=-1, cont=1, voi=1, hi=-1, lo=-1, back=1, round=1, tense=-1),
    "ʊ": dict(syl=1, son=1, cons=-1, cont=1, voi=1, hi=1, back=1, round=1, tense=-1),
    "æ": dict(syl=1, son=1, cons=-1, cont=1, voi=1, lo=1, back=-1, tense=-1),
    "ʌ": dict(syl=1, son=1, cons=-1, cont=1, voi=1, hi=-1, lo=-1, back=1, tense=-1),
    # stops
    "p": dict(cons=1, son=-1, cont=-1, voi=-1, lab=1, ant=1),
    "b": dict(cons=1, son=-1, cont=-1, voi=1, lab=1, ant=1),
    "t": dict(cons=1, son=-1, cont=-1, voi=-1, cor=1, ant=1),
    "d": dict(cons=1, son=-1, cont=-1, voi=1, cor=1, ant=1),
    "k": dict(cons=1, son=-1, cont=-1, voi=-1, hi=1, back=1),
    "g": dict(cons=1, son=-1, cont=-1, voi=1, hi=1, back=1),
    "ɡ": dict(cons=1, son=-1, cont=-1, voi=1, hi=1, back=1),
    "ʔ": dict(cons=1, son=-1, cont=-1, voi=-1, cg=1),
    # fricatives
    "f": dict(cons=1, son=-1, cont=1, voi=-1, lab=1, strid=1),
    "v": dict(cons=1, son=-1, cont=1, voi=1, lab=1, strid=1),
    "s": dict(cons=1, son=-1, cont=1, voi=-1, cor=1, ant=1, strid=1),
    "z": dict(cons=1, son=-1, cont=1, voi=1, cor=1, ant=1, strid=1),
    "ʃ": dict(cons=1, son=-1, cont=1, voi=-1, cor=1, ant=-1, strid=1, distr=1),
    "ʒ": dict(cons=1, son=-1, cont=1, voi=1, cor=1, ant=-1, strid=1, distr=1),
    "θ": dict(cons=1, son=-1, cont=1, voi=-1, cor=1, ant=1, distr=1),
    "ð": dict(cons=1, son=-1, cont=1, voi=1, cor=1, ant=1, distr=1),
    "h": dict(cons=-1, son=-1, cont=1, voi=-1, sg=1),
    "x": dict(cons=1, son=-1, cont=1, voi=-1, hi=1, back=1),
    # affricates
    "tʃ": dict(cons=1, son=-1, cont=-1, delrel=1, voi=-1, cor=1, ant=-1, strid=1),
    "dʒ": dict(cons=1, son=-1, cont=-1, delrel=1, voi=1, cor=1, ant=-1, strid=1),
    # nasals
    "m": dict(cons=1, son=1, cont=-1, nas=1, voi=1, lab=1),
    "n": dict(cons=1, son=1, cont=-1, nas=1, voi=1, cor=1, ant=1),
    "ŋ": dict(cons=1, son=1, cont=-1, nas=1, voi=1, hi=1, back=1),
    # liquids / glides
    "l": dict(cons=1, son=1, cont=1, lat=1, voi=1, cor=1, ant=1),
    "ɹ": dict(cons=1, son=1, cont=1, voi=1, cor=1, ant=1),
    "r": dict(cons=1, son=1, cont=1, voi=1, cor=1, ant=1),
    "j": dict(cons=-1, son=1, cont=1, voi=1, hi=1, back=-1),
    "w": dict(cons=-1, son=1, cont=1, voi=1, hi=1, back=1, round=1, lab=1),
    # length mark
    "ː": dict(long=1),
}


def get_features(symbol: str) -> np.ndarray:
    """Feature vector for one symbol; zeros for unknown/pad/punctuation."""
    vec = np.zeros(N_PHONOLOGICAL_FEATURES, dtype=np.float32)
    feats = _TABLE.get(symbol)
    if feats:
        for name, val in feats.items():
            vec[FEATURE_NAMES.index(name)] = float(val)
    return vec


def get_features_for_tokens(tokens: List[str]) -> np.ndarray:
    """[T, N_PHONOLOGICAL_FEATURES] matrix for a token sequence."""
    if not tokens:
        return np.zeros((0, N_PHONOLOGICAL_FEATURES), dtype=np.float32)
    return np.stack([get_features(t) for t in tokens])
