"""Light-weight shared types (parity with fs2/type_definitions.py and
fs2/type_definitions_heavy.py — the light/heavy split existed only to keep
CLI startup fast; here the whole module is cheap so it is one file)."""

from __future__ import annotations

from enum import Enum
from typing import Optional

from pydantic import BaseModel, ConfigDict


class SynthesizeOutputFormats(str, Enum):
    """Supported synthesis output formats (fs2/type_definitions.py:10-17)."""

    wav = "wav"
    spec = "spec"
    textgrid = "textgrid"
    readalong_xml = "readalong-xml"
    readalong_html = "readalong-html"


class BenchmarkType(str, Enum):
    training = "training"
    inference = "inference"


class InferenceControl(BaseModel):
    """Pitch/energy/duration multipliers applied at synthesis time."""

    model_config = ConfigDict(arbitrary_types_allowed=True)

    pitch: float = 1.0
    energy: float = 1.0
    duration: float = 1.0


class StatsInfo(BaseModel):
    min: float
    max: float
    std: float
    mean: float
    norm_min: float
    norm_max: float


class Stats(BaseModel):
    pitch: StatsInfo
    energy: StatsInfo
    character_length: Optional[StatsInfo] = None
    phone_length: Optional[StatsInfo] = None
    arpabet_length: Optional[StatsInfo] = None
