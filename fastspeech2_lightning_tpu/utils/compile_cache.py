"""Persistent XLA compilation cache for every heavy entry point.

The reference has nothing to persist (eager torch), but on TPU the first
trace+compile of the jitted train/synthesis programs costs tens of seconds
(and minutes over a remote relay). JAX ships a content-addressed persistent
cache; enabling it makes the second `train`/`synthesize`/`serve` invocation
skip every compile whose (HLO, flags, platform) key is unchanged.

Called from the CLI commands and the serving server. Opt out with
FS2T_NO_COMPILE_CACHE=1; override the location with FS2T_COMPILE_CACHE=<dir>
(default ~/.cache/fs2t/xla).
"""

from __future__ import annotations

import os
from pathlib import Path

_ENABLED_DIR: str | None = None


def enable_persistent_cache(cache_dir: os.PathLike | str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a stable directory.

    Returns the directory in use, or None if disabled/unavailable.
    Idempotent: the first successful call wins.
    """
    global _ENABLED_DIR
    if os.environ.get("FS2T_NO_COMPILE_CACHE"):
        return None
    if _ENABLED_DIR is not None:
        return _ENABLED_DIR
    path = Path(
        cache_dir
        or os.environ.get("FS2T_COMPILE_CACHE")
        or Path.home() / ".cache" / "fs2t" / "xla"
    )
    try:
        path.mkdir(parents=True, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", str(path))
        # Cache everything that took >=1s to compile, however small the
        # executable — the relay round-trip, not artifact size, is the cost.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    _ENABLED_DIR = str(path)
    return _ENABLED_DIR
