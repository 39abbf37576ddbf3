"""Speaker/language lookup tables derived from filelists
(re-provides everyvoice.text.lookups — SURVEY.md §2.2)."""

from __future__ import annotations

from typing import Dict, List

LookupTable = Dict[str, int]


def build_lookup(items: List[dict], key: str) -> LookupTable:
    """Build a value -> id mapping for a filelist column, sorted for
    determinism. Missing/None/empty values map to 'default' — matching how
    the dataset resolves rows at train time (a short .psv row gives
    DictReader None, which used to crash sorted(); an empty string used to
    mint a phantom id class the dataset never looks up)."""
    values = sorted({(item.get(key) or "default") for item in items})
    return {v: i for i, v in enumerate(values)}


def lookuptables_from_data(data: List[dict]) -> tuple[LookupTable, LookupTable]:
    return build_lookup(data, "language"), build_lookup(data, "speaker")


def lookuptables_from_config(config) -> tuple[LookupTable, LookupTable]:
    """lang2id, speaker2id from the union of training+validation filelists."""
    from ..utils import load_filelist

    items = load_filelist(config.training.training_filelist) + load_filelist(
        config.training.validation_filelist
    )
    return lookuptables_from_data(items)
