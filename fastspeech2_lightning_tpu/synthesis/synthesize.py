"""Synthesis orchestration (synthesize_helper parity,
fs2/cli/synthesize.py:333-462): prepared items -> batched jitted predict ->
writer callbacks, with teacher forcing and scoring modes."""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from ..config import FastSpeech2Config
from ..dataset import FastSpeechDataset, collate
from ..models import FastSpeech2
from ..text import TextProcessor
from ..training.checkpoint import load_checkpoint
from ..training.loss import compute_loss
from ..type_definitions import Stats


def load_model_from_checkpoint(ckpt_path: Path, use_ema: bool = False):
    """(model, variables, config, stats, lang2id, speaker2id, global_step).

    With use_ema, serve the exponential-moving-average shadow weights
    (training.ema_decay > 0) instead of the raw params.

    Accepts either an orbax checkpoint directory (step=N/) or a reference
    PyTorch Lightning .ckpt FILE — the latter is converted on the fly from
    its embedded hyper_parameters + state_dict (fs2/model.py:353-378), so
    reference users can synthesize from their existing checkpoints
    directly."""
    ckpt_path = Path(ckpt_path)
    if ckpt_path.is_file():
        from ..models.torch_import import load_reference_lightning_checkpoint

        if use_ema:
            raise ValueError(
                "--use-ema applies to checkpoints trained here with "
                "training.ema_decay; reference .ckpt files carry no EMA shadows."
            )
        (
            config, stats, lang2id, speaker2id, variables, n_symbols,
            global_step, warnings,
        ) = load_reference_lightning_checkpoint(ckpt_path)
        for w in warnings:
            print(f"torch checkpoint import: {w}")
        model = FastSpeech2(
            config=config,
            stats=stats,
            n_symbols=n_symbols,
            n_speakers=max(len(speaker2id), 1),
            n_languages=max(len(lang2id), 1),
        )
        return model, variables, config, stats, lang2id, speaker2id, global_step
    meta, arrays = load_checkpoint(ckpt_path)
    if use_ema:
        if arrays.get("ema_params") is None:
            raise ValueError(
                f"{ckpt_path} has no ema_params — the model was trained "
                "without training.ema_decay; cannot honor --use-ema."
            )
        arrays["params"] = arrays["ema_params"]
    config = FastSpeech2Config.model_validate(meta["config"])
    stats = Stats(**meta["stats"]) if meta.get("stats") else None
    tp = TextProcessor(config.text)
    model = FastSpeech2(
        config=config,
        stats=stats,
        n_symbols=max(len(tp.symbols), len(meta.get("symbols", []))),
        n_speakers=max(len(meta.get("speaker2id", {})), 1),
        n_languages=max(len(meta.get("lang2id", {})), 1),
    )
    variables = {"params": arrays["params"]}
    if arrays.get("batch_stats") is not None:
        variables["batch_stats"] = arrays["batch_stats"]
    if arrays.get("constants") is not None:
        variables["constants"] = arrays["constants"]
    return (
        model,
        variables,
        config,
        stats,
        meta.get("lang2id", {}),
        meta.get("speaker2id", {}),
        meta.get("global_step", 0),
    )


def synthesize_items(
    items: List[dict],
    model: FastSpeech2,
    variables: Dict[str, Any],
    config: FastSpeech2Config,
    lang2id: dict,
    speaker2id: dict,
    writers: Dict[Any, Any],
    batch_size: Optional[int] = None,
    teacher_forcing: bool = False,
    return_scores: bool = False,
    control: Optional[Dict[str, float]] = None,
    max_target_len: Optional[int] = None,
    mesh=None,
) -> None:
    """Run batched inference over prepared items, driving the writers.

    mesh: optional (data, model) device mesh — batch rows shard over the
    data axis (bulk corpus synthesis scales ~linearly with chips; rows are
    independent so the forward has no collectives). Partial batches pad by
    repeating row 0; padded rows are sliced off before the writers run.
    """
    batch_size = batch_size or config.training.batch_size
    if mesh is not None:
        n_data = mesh.shape["data"]
        # keep the dispatched batch a multiple of the data axis
        batch_size = max(batch_size // n_data, 1) * n_data
        variables = jax.device_put(
            variables,
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
        )
    if return_scores:
        batch_size = 1  # per-utterance scores (check_data.py:194-217)
    style_reference = any("mel_style_reference" in it for it in items)
    ds = FastSpeechDataset(
        items, config, lang2id, speaker2id,
        teacher_forcing=teacher_forcing, inference=True,
        style_reference=style_reference,
    )
    max_target_len = max_target_len or config.model.max_mel_length
    ctrl = {
        "pitch": np.float32((control or {}).get("pitch", 1.0)),
        "energy": np.float32((control or {}).get("energy", 1.0)),
        "duration": np.float32((control or {}).get("duration", 1.0)),
    }

    import functools

    @functools.partial(jax.jit, static_argnames=("teacher_forcing", "max_len"))
    def predict(variables, batch, ctrl, teacher_forcing, max_len):
        return model.apply(
            variables, batch, control=ctrl, inference=True,
            teacher_forcing=teacher_forcing, deterministic=True,
            max_target_len=max_len,
        )

    host_keys = {
        "basename", "speaker", "language", "raw_text", "is_last_input_chunk",
        "max_src_len", "max_mel_len", "phone_coverage_score",
        "trigram_coverage_score",
    }
    from ..dataset import _round_up, PAD_MULT_TEXT

    for start in range(0, len(ds), batch_size):
        samples = [ds[i] for i in range(start, min(start + batch_size, len(ds)))]
        n_true = len(samples)
        if mesh is not None:
            n_data = mesh.shape["data"]
            samples = samples + [samples[0]] * (
                _round_up(n_true, n_data) - n_true
            )
        # pad text to a multiple of 16 so distinct input lengths share a small
        # set of compiled programs (static-shape discipline, SURVEY.md §5.7)
        pad_text = _round_up(
            max(s["text"].shape[0] for s in samples), PAD_MULT_TEXT
        )
        batch = collate(
            samples, learn_alignment=config.model.learn_alignment,
            pad_text_to=pad_text,
            pad_mel_to=None if samples[0].get("mel") is not None else max_target_len,
        )
        device_batch = {k: v for k, v in batch.items() if k not in host_keys}
        if mesh is not None:
            from ..parallel.mesh import shard_batch

            device_batch = shard_batch(device_batch, mesh)
        # rename: at inference the aligner prior is not used; precomputed
        # duration field only exists under teacher forcing
        out = predict(
            variables, device_batch, ctrl, teacher_forcing,
            int(batch["max_mel_len"] or max_target_len),
        )
        out_host = jax.tree_util.tree_map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x, out
        )
        if len(samples) != n_true:
            # slice off the data-axis fill rows before any writer sees them
            b_pad = len(samples)

            def _trim(x):
                if (
                    hasattr(x, "shape")
                    and getattr(x, "ndim", 0) >= 1
                    and x.shape[0] == b_pad
                ):
                    return x[:n_true]
                if isinstance(x, list) and len(x) == b_pad:
                    return x[:n_true]
                return x

            out_host = jax.tree_util.tree_map(_trim, out_host)
            batch = {k: _trim(v) for k, v in batch.items()}
        if return_scores:
            losses = compute_loss(config, out, device_batch, 0)
            out_host["losses"] = {
                k: float(v) for k, v in losses.items()
            }
        for writer in writers.values():
            writer.on_predict_batch_end(out_host, batch)

    for writer in writers.values():
        if hasattr(writer, "finalize"):
            writer.finalize()
