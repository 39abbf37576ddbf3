"""Numerical-parity evaluation against a reference PyTorch checkpoint.

Usage:
  python tools/parity_eval.py --reference-ckpt /path/to/fs2.ckpt \
      --preprocessed-dir /path/to/preprocessed --out parity_report.json

Loads the reference Lightning checkpoint, converts the weights with
models/torch_import.py, rebuilds the config, runs a teacher-forced forward on
real preprocessed utterances, and writes the predicted mels. If the reference
implementation is importable (torch + everyvoice installed), it also runs the
reference forward on the same batch and reports mel L1 — the BASELINE.md
target is mel L1 < 1e-3."""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference-ckpt", type=Path, required=True)
    ap.add_argument("--preprocessed-dir", type=Path, required=True)
    ap.add_argument("--filelist", type=Path, default=None)
    ap.add_argument("--n-utterances", type=int, default=8)
    ap.add_argument("--out", type=Path, default=Path("parity_report.json"))
    args = ap.parse_args()

    import torch

    from fastspeech2_lightning_tpu.config import FastSpeech2Config
    from fastspeech2_lightning_tpu.dataset import FastSpeechDataset, collate
    from fastspeech2_lightning_tpu.models import FastSpeech2
    from fastspeech2_lightning_tpu.models.torch_import import (
        import_torch_fastspeech2,
    )
    from fastspeech2_lightning_tpu.text import TextProcessor
    from fastspeech2_lightning_tpu.type_definitions import Stats
    from fastspeech2_lightning_tpu.utils import load_filelist

    ckpt = torch.load(args.reference_ckpt, map_location="cpu", weights_only=False)
    hp = ckpt.get("hyper_parameters", {})
    ref_config = hp.get("config", {})
    config = FastSpeech2Config.model_validate(ref_config)
    config.preprocessing.save_dir = args.preprocessed_dir
    stats = Stats(**hp["stats"]) if hp.get("stats") else None

    params, batch_stats, warnings = import_torch_fastspeech2(
        ckpt["state_dict"], config
    )
    for w in warnings:
        print(f"warning: {w}", file=sys.stderr)

    tp = TextProcessor(config.text)
    model = FastSpeech2(
        config=config, stats=stats, n_symbols=len(tp.symbols),
        n_speakers=max(len(hp.get("speaker2id", {}) or {}), 1),
        n_languages=max(len(hp.get("lang2id", {}) or {}), 1),
    )

    filelist = args.filelist or (args.preprocessed_dir / "validation_filelist.psv")
    items = load_filelist(filelist)[: args.n_utterances]
    ds = FastSpeechDataset(items, config, {"default": 0}, {"default": 0})
    samples = [ds[i] for i in range(len(ds))]
    batch = collate(samples, learn_alignment=config.model.learn_alignment)
    host_keys = {"basename", "speaker", "language", "raw_text",
                 "is_last_input_chunk", "max_src_len", "max_mel_len"}
    device_batch = {k: v for k, v in batch.items() if k not in host_keys}

    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    from fastspeech2_lightning_tpu.models.torch_import import extract_constants

    constants = extract_constants(ckpt["state_dict"])
    if constants:
        variables["constants"] = constants
    out = model.apply(variables, device_batch, deterministic=True)
    key = "postnet_output" if config.model.use_postnet else "output"
    ours = np.asarray(out[key])

    report = {
        "checkpoint": str(args.reference_ckpt),
        "n_utterances": len(samples),
        "mel_shape": list(ours.shape),
        "mel_mean": float(ours.mean()),
        "mel_std": float(ours.std()),
        "import_warnings": warnings,
    }

    # reference forward, if its implementation is importable here
    try:
        from fs2.model import FastSpeech2 as RefFS2  # type: ignore

        ref_model = RefFS2.load_from_checkpoint(args.reference_ckpt)
        ref_model.eval()
        tb = {
            k: torch.tensor(v) if isinstance(v, np.ndarray) else v
            for k, v in batch.items()
        }
        with torch.no_grad():
            ref_out = ref_model(tb)
        ref_mel = ref_out[key].numpy()
        mask = np.asarray(out["tgt_mask"])[:, :, None]
        l1 = float(np.abs((ours - ref_mel) * mask).sum() / np.maximum(mask.sum() * ours.shape[-1], 1))
        report["mel_l1_vs_reference"] = l1
        report["target"] = 1e-3
        print(f"mel L1 vs reference: {l1:.2e} (target < 1e-3)")
    except ImportError:
        report["mel_l1_vs_reference"] = None
        print(
            "reference implementation not importable here; wrote our mels "
            "only — run in an everyvoice environment for the L1 comparison.",
            file=sys.stderr,
        )
        np.save(args.out.with_suffix(".mels.npy"), ours)

    args.out.write_text(json.dumps(report, indent=2))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
