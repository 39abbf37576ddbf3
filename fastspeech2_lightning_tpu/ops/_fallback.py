"""One-shot logging when a Pallas kernel path silently degrades.

The MAS/CTC ops probe for their Pallas kernels and fall back to the
lax.scan implementations when the probe fails. On CPU that is the normal
path; on TPU a probe *exception* means a kernel regression — log it once so
perf bisects aren't the only way to notice (round-2 verdict, weak #8).
"""

from __future__ import annotations

import logging

logger = logging.getLogger("fastspeech2_lightning_tpu.ops")

_warned: set[str] = set()


def warn_fallback_once(kernel: str, reason: BaseException | str) -> None:
    if kernel in _warned:
        return
    _warned.add(kernel)
    logger.warning(
        "Pallas kernel %r unavailable (%s); falling back to the scan "
        "implementation — correct but slower on TPU.",
        kernel,
        reason,
    )
