"""Validation media plots (parity with fs2/utils/heavy.py:41-110):
attention-map figures and GT-vs-predicted mel figures with denormalized
pitch/energy overlays. Host-side matplotlib on fetched numpy arrays."""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..type_definitions import Stats


def expand(values: np.ndarray, durations: np.ndarray) -> np.ndarray:
    """Repeat each phone-level value by its duration (everyvoice
    utils.heavy.expand — used for plotting phone-level variance curves)."""
    out = []
    for value, d in zip(values, durations):
        out += [value] * max(0, int(d))
    return np.array(out)


def plot_attn_maps(
    attn_soft: np.ndarray,
    attn_hard: np.ndarray,
    mel_lens: np.ndarray,
    text_lens: np.ndarray,
    n: int = 1,
) -> List:
    """Soft/hard attention side-by-side figures for the first n items."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    figs = []
    for i in range(min(n, attn_soft.shape[0])):
        t, l = int(mel_lens[i]), int(text_lens[i])
        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
        axes[0].imshow(
            attn_soft[i, :t, :l].T, origin="lower", aspect="auto", interpolation="none"
        )
        axes[0].set_title("soft attention")
        axes[1].imshow(
            attn_hard[i, :t, :l].T, origin="lower", aspect="auto", interpolation="none"
        )
        axes[1].set_title("hard attention (MAS)")
        for ax in axes:
            ax.set_xlabel("mel frames")
            ax.set_ylabel("text")
        fig.tight_layout()
        figs.append(fig)
    return figs


def plot_mel(
    entries: List[dict],
    stats: Optional[Stats],
    titles: List[str],
):
    """Stacked mel figures with pitch (blue, left axis) and energy (red,
    right axis) overlays denormalized through the corpus stats."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(len(entries), 1, figsize=(8, 3 * len(entries)))
    if len(entries) == 1:
        axes = [axes]
    for ax, entry, title in zip(axes, entries, titles):
        mel = entry["mel"]  # [K, T]
        ax.imshow(mel, origin="lower", aspect="auto", interpolation="none")
        ax.set_title(title)
        ax.set_ylim(0, mel.shape[0])
        if entry.get("pitch") is not None and stats is not None:
            pitch = entry["pitch"] * stats.pitch.std + stats.pitch.mean
            pitch_norm = (
                (pitch - stats.pitch.min)
                / max(stats.pitch.max - stats.pitch.min, 1e-9)
                * mel.shape[0]
            )
            ax2 = ax.twinx()
            ax2.plot(pitch_norm[: mel.shape[1]], color="tab:blue", linewidth=1)
            ax2.set_ylim(0, mel.shape[0])
            ax2.set_yticks([])
        if entry.get("energy") is not None and stats is not None:
            energy = entry["energy"] * stats.energy.std + stats.energy.mean
            energy_norm = (
                (energy - stats.energy.min)
                / max(stats.energy.max - stats.energy.min, 1e-9)
                * mel.shape[0]
            )
            ax3 = ax.twinx()
            ax3.plot(energy_norm[: mel.shape[1]], color="tab:red", linewidth=1)
            ax3.set_ylim(0, mel.shape[0])
            ax3.set_yticks([])
    fig.tight_layout()
    return fig
