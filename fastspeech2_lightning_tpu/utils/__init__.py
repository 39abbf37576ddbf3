"""Misc infra: filelist IO, slugify, basename truncation
(re-provides the everyvoice.utils surface used by the reference —
SURVEY.md §2.2)."""

from __future__ import annotations

import csv
import hashlib
import re
from pathlib import Path
from typing import List


def slugify(text: str, repl: str = "-", limit_to_n_characters: int | None = None) -> str:
    """Filesystem-safe slug of arbitrary text."""
    slug = re.sub(r"[^\w\s\-.]", "", text, flags=re.UNICODE)
    slug = re.sub(r"[\s]+", repl, slug.strip())
    if limit_to_n_characters is not None:
        slug = slug[:limit_to_n_characters]
    return slug


def truncate_basename(basename: str, max_len: int = 20) -> str:
    """Truncate long basenames to max_len chars + sha1 suffix so output
    filenames stay unique but bounded (fs2/utils/__init__.py:8-20)."""
    basename = slugify(basename)
    if len(basename) <= max_len:
        return basename
    digest = hashlib.sha1(basename.encode("utf8")).hexdigest()[:8]
    return f"{basename[:max_len]}-{digest}"


def generic_psv_filelist_reader(path: Path | str, delimiter: str = "|") -> List[dict]:
    """Read a pipe-separated filelist with a header row into dicts."""
    path = Path(path)
    with open(path, "r", encoding="utf8", newline="") as f:
        reader = csv.DictReader(f, delimiter=delimiter)
        return [dict(row) for row in reader]


def plain_text_filelist_reader(path: Path | str) -> List[dict]:
    """Read a plain-text filelist: one utterance text per line."""
    out = []
    with open(path, "r", encoding="utf8") as f:
        for i, line in enumerate(f):
            line = line.rstrip("\n")
            if line:
                out.append({"basename": f"line-{i}", "text": line})
    return out


def load_filelist(path: Path | str) -> List[dict]:
    path = Path(path)
    if path.suffix in (".psv", ".csv", ".tsv"):
        delim = {".psv": "|", ".csv": ",", ".tsv": "\t"}[path.suffix]
        return generic_psv_filelist_reader(path, delimiter=delim)
    return plain_text_filelist_reader(path)


def write_filelist(items: List[dict], path: Path | str, delimiter: str = "|") -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if not items:
        path.write_text("")
        return
    fieldnames: List[str] = []
    for item in items:
        for k in item:
            if k not in fieldnames:
                fieldnames.append(k)
    with open(path, "w", encoding="utf8", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=fieldnames, delimiter=delimiter)
        writer.writeheader()
        writer.writerows(items)


def check_dataset_size(batch_size: int, number_of_samples: int, name: str) -> None:
    """Loud error when the dataset is smaller than the batch size
    (everyvoice.utils.check_dataset_size semantics)."""
    if number_of_samples < batch_size:
        raise ValueError(
            f"Your {name} dataset only has {number_of_samples} samples but "
            f"batch_size is {batch_size}; reduce training.batch_size or add data."
        )


def _flatten(d: dict, parent_key: str = "", sep: str = "_") -> dict:
    """Flatten one level of nested dicts (everyvoice.utils._flatten)."""
    items: list = []
    for k, v in d.items():
        new_key = f"{parent_key}{sep}{k}" if parent_key else k
        if isinstance(v, dict):
            items.extend(_flatten(v, new_key, sep=sep).items())
        else:
            items.append((new_key, v))
    return dict(items)
