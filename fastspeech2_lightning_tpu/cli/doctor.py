"""`fs2t doctor` — environment and installation diagnostics.

Production triage for the questions that actually page people: is the TPU
reachable (probed in a SUBPROCESS with a timeout, so a dead device tunnel
is reported instead of hanging the diagnostic), are the native kernels
built, is the persistent compile cache writable, does the config parse and
point at real artifacts. No reference equivalent — the reference leans on
Lightning's stack traces."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path
from typing import List, Optional, Tuple

OK = "ok"
WARN = "warn"
FAIL = "fail"

_DEVICE_PROBE = r"""
import json
import os
import jax
# FS2T_DOCTOR_PLATFORM pins the probe's backend (test hook; also the way to
# doctor the CPU path when a sitecustomize forces an accelerator platform)
plat = os.environ.get("FS2T_DOCTOR_PLATFORM")
if plat:
    jax.config.update("jax_platforms", plat)
devs = jax.devices()
print(json.dumps({
    "backend": jax.default_backend(),
    "n_devices": len(devs),
    "kinds": sorted({d.device_kind for d in devs}),
    "jax": jax.__version__,
}))
"""


def probe_devices(timeout_s: float = 60.0) -> Tuple[str, str]:
    """(status, message). Runs jax device init in a subprocess so a hung
    device transport (e.g. an unreachable TPU tunnel) times out cleanly."""
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _DEVICE_PROBE],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return FAIL, (
            f"device init hung >{timeout_s:.0f}s — accelerator transport "
            "unreachable (TPU tunnel down?). CPU runs still work: set "
            "JAX_PLATFORMS=cpu / jax.config.update('jax_platforms','cpu')."
        )
    if proc.returncode != 0:
        tail = (proc.stderr or proc.stdout).strip().splitlines()[-1:]
        return FAIL, f"device init failed: {' '.join(tail)}"
    try:
        info = json.loads(proc.stdout.strip().splitlines()[-1])
    except Exception:
        return WARN, f"unparseable probe output: {proc.stdout[:200]!r}"
    msg = (
        f"backend={info['backend']} devices={info['n_devices']} "
        f"({', '.join(info['kinds'])}) jax={info['jax']}"
    )
    return OK, msg


def check_versions() -> Tuple[str, str]:
    import flax
    import jax
    import numpy
    import optax

    from .. import __version__ as pkg

    mods = {
        "fastspeech2_lightning_tpu": pkg,
        "jax": jax.__version__,
        "flax": flax.__version__,
        "optax": optax.__version__,
        "numpy": numpy.__version__,
    }
    return OK, " ".join(f"{k}={v}" for k, v in mods.items())


def check_native() -> Tuple[str, str]:
    from ..native import available

    if available():
        from ..native import _load

        lib = _load()
        return OK, f"C++ kernels loaded ({getattr(lib, '_name', 'cdll')})"
    return WARN, (
        "C++ kernels unavailable (g++ missing or build failed) — NumPy "
        "fallbacks are used for host-side MAS/YIN; device paths unaffected"
    )


def check_compile_cache() -> Tuple[str, str]:
    from ..utils.compile_cache import enable_persistent_cache

    if os.environ.get("FS2T_NO_COMPILE_CACHE"):
        return WARN, "disabled via FS2T_NO_COMPILE_CACHE=1"
    d = enable_persistent_cache()
    if d is None:
        return WARN, "could not enable (jax too old or dir not writable)"
    path = Path(d)
    try:
        probe = path / ".doctor_probe"
        probe.write_text("ok")
        probe.unlink()
    except OSError as exc:
        return FAIL, f"{d} not writable: {exc}"
    n = sum(1 for _ in path.glob("**/*") if _.is_file())
    return OK, f"{d} (writable, {n} cached entries)"


def check_config(config_file: Path) -> List[Tuple[str, str, str]]:
    """Config-specific checks: parse, artifact dirs, stats, filelists."""
    rows: List[Tuple[str, str, str]] = []
    try:
        from ..config import FastSpeech2Config

        config = FastSpeech2Config.load_config_from_path(config_file)
        rows.append(("config", OK, f"parsed {config_file}"))
    except Exception as exc:
        rows.append(("config", FAIL, f"{type(exc).__name__}: {exc}"))
        return rows
    try:
        from ..text import TextProcessor

        tp = TextProcessor(config.text)
        rows.append(("text", OK, f"{len(tp.symbols)} symbols in inventory"))
    except Exception as exc:
        rows.append(("text", FAIL, f"text config: {exc}"))
    save_dir = Path(config.preprocessing.save_dir)
    if not save_dir.exists():
        rows.append(
            ("artifacts", WARN,
             f"{save_dir} missing — run `fs2t preprocess` first")
        )
    else:
        missing = [
            d for d in ("audio", "spec", "text")
            if not (save_dir / d).is_dir()
        ]
        stats = save_dir / "stats.json"
        if missing:
            rows.append(
                ("artifacts", WARN,
                 f"{save_dir} lacks {missing} — preprocessing incomplete")
            )
        else:
            rows.append(("artifacts", OK, f"{save_dir} populated"))
        rows.append(
            ("stats", OK, f"{stats} present") if stats.exists()
            else ("stats", WARN,
                  f"{stats} missing — run preprocess with stats enabled")
        )
    for name in ("training_filelist", "validation_filelist"):
        p = Path(getattr(config.training, name))
        rows.append(
            (name, OK, str(p)) if p.exists()
            else (name, WARN, f"{p} does not exist")
        )
    return rows


def run_doctor(
    config_file: Optional[Path] = None,
    device_timeout_s: float = 60.0,
    echo=print,
) -> int:
    """Run all checks; returns a shell exit code (1 if any FAIL)."""
    rows: List[Tuple[str, str, str]] = []
    for name, fn in (
        ("versions", check_versions),
        ("native", check_native),
        ("compile-cache", check_compile_cache),
    ):
        try:
            status, msg = fn()
        except Exception as exc:  # a diagnostic must never crash
            status, msg = FAIL, f"{type(exc).__name__}: {exc}"
        rows.append((name, status, msg))
    status, msg = probe_devices(device_timeout_s)
    rows.append(("devices", status, msg))
    if config_file is not None:
        rows.extend(check_config(Path(config_file)))
    icon = {OK: "✓", WARN: "!", FAIL: "✗"}
    for name, status, msg in rows:
        echo(f"{icon[status]} {name:14s} {msg}")
    n_fail = sum(1 for _, s, _ in rows if s == FAIL)
    n_warn = sum(1 for _, s, _ in rows if s == WARN)
    echo(f"{len(rows)} checks: {n_fail} failed, {n_warn} warnings")
    return 1 if n_fail else 0
