"""Convert a reference preprocessed tree (.pt artifacts) to .npy.

The reference's Preprocessor writes every per-utterance artifact as a torch
tensor in a ``.pt`` file under ``save_dir/{audio,spec,attn,text,pitch,energy,
duration,pfs}`` with the naming scheme ``{basename}--{speaker}--{lang}--
{artifact}.pt`` (reference fs2/dataset.py:53-57, 100-108). This framework
reads the same tree with the same naming but ``.npy`` payloads (host-side
``np.load`` with mmap header reads for length scans). This module converts a
reference tree in place — each ``.pt`` gets an ``.npy`` sibling — so an
existing corpus preprocessed with the reference can be trained on directly
without re-running preprocessing.

``stats.json`` and filelists are already plain JSON/PSV and need no
conversion.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Iterable, Optional

import numpy as np

# Artifact subdirectories the reference Preprocessor writes (fs2/dataset.py
# loads from spec/attn/duration/energy/pitch/pfs; audio + text are written by
# the preprocess steps of the same names).
ARTIFACT_DIRS = ("audio", "spec", "attn", "text", "pitch", "energy", "duration", "pfs")


def _to_numpy(obj) -> Optional[np.ndarray]:
    """Best-effort tensor/ndarray extraction from a torch.load payload."""
    if isinstance(obj, np.ndarray):
        return obj
    # torch tensor (duck-typed so this module imports without torch)
    if hasattr(obj, "detach") and hasattr(obj, "cpu") and hasattr(obj, "numpy"):
        return obj.detach().cpu().numpy()
    if isinstance(obj, (int, float)):
        return np.asarray(obj)
    if isinstance(obj, (list, tuple)) and obj:
        try:
            return np.asarray(obj)
        except Exception:
            return None
    return None


def convert_artifact_tree(
    root: Path,
    overwrite: bool = False,
    log: Callable[[str], None] = lambda s: None,
    dirs: Iterable[str] = ARTIFACT_DIRS,
) -> tuple[int, int]:
    """Convert every ``.pt`` under ``root/{artifact_dir}`` to an ``.npy`` sibling.

    Returns ``(converted, skipped)``. Skipped = already-converted files (the
    ``.npy`` exists and ``overwrite`` is False) plus payloads that are not
    tensors. Raises ImportError if torch is unavailable — conversion is the
    one operation here that genuinely needs it.
    """
    import torch

    converted = skipped = 0
    for sub in dirs:
        d = Path(root) / sub
        if not d.is_dir():
            continue
        for pt in sorted(d.rglob("*.pt")):
            out = pt.with_suffix(".npy")
            if out.exists() and not overwrite:
                skipped += 1
                continue
            try:
                payload = torch.load(pt, map_location="cpu", weights_only=True)
            except Exception:
                # older torch pickles (e.g. saved dataclasses) — fall back,
                # still never executing arbitrary code paths beyond pickle
                payload = torch.load(pt, map_location="cpu", weights_only=False)
            arr = _to_numpy(payload)
            if arr is None or arr.dtype == object:
                # object-dtype arrays (lists of dicts etc.) would make
                # np.save(allow_pickle=False) raise and abort the whole
                # tree — skip and keep converting
                log(f"skipping non-tensor payload: {pt}")
                skipped += 1
                continue
            # float64 never occurs in reference artifacts; keep dtype as-is
            tmp = out.with_name(out.name + ".tmp")
            np.save(tmp, np.ascontiguousarray(arr), allow_pickle=False)
            # np.save appends .npy to names lacking it
            tmp_real = tmp if tmp.exists() else tmp.with_name(tmp.name + ".npy")
            tmp_real.replace(out)
            converted += 1
            log(f"{pt.name} -> {out.name}  {arr.shape} {arr.dtype}")
    return converted, skipped
