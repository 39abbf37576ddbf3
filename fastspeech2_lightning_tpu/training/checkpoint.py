"""Versioned checkpoints: orbax arrays + JSON metadata.

Parity with the reference's checkpoint story (SURVEY.md §5.4):
 - every checkpoint embeds `model_info = {name, version}`, a checkpoint-safe
   config dump, corpus stats, and the lookup tables (fs2/model.py:369-378)
 - loading runs `check_and_upgrade_checkpoint`: wrong model type -> TypeError;
   newer version -> ValueError; <1.0 upgraded in place; pfs models <1.2
   rejected; character models <1.2 get their text embedding table remapped
   row-by-row by symbol (fs2/model.py:270-351)
 - top-k retention on the monitored metric + global_step recoverable from the
   raw checkpoint (fs2/cli/synthesize.py:322-330 semantics)
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp
from packaging.version import Version

from .. import MODEL_VERSION
from ..config import FastSpeech2Config
from ..type_definitions import Stats

MODEL_NAME = "FastSpeech2"


class CheckpointError(Exception):
    pass


def _opt_format(opt_state) -> str:
    from .fused_optim import opt_state_format

    return opt_state_format(opt_state)


def host_state_snapshot(state):
    """Full-value numpy snapshot of a (possibly multi-host-sharded) state.

    Multi-host checkpointing: every process calls this (the allgather is a
    collective), then only process 0 passes the numpy tree to
    save_checkpoint. Replicated global arrays are read locally; sharded ones
    (ZeRO-1 moments, TP params spanning hosts) are allgathered tiled."""

    def full(x):
        if x is None or not isinstance(x, jax.Array):
            return x
        if x.is_fully_addressable:
            return jax.device_get(x)
        if x.is_fully_replicated:
            return np.asarray(x)
        from jax.experimental import multihost_utils

        return multihost_utils.process_allgather(x, tiled=True)

    return jax.tree_util.tree_map(full, state)


def save_checkpoint(
    ckpt_dir: Path,
    state,
    config: FastSpeech2Config,
    stats: Optional[Stats],
    lang2id: dict,
    speaker2id: dict,
    symbols: list[str],
    metrics: Optional[dict] = None,
    epoch: Optional[int] = None,
) -> Path:
    """Write one checkpoint directory `step=N` under ckpt_dir."""
    ckpt_dir = Path(ckpt_dir)
    step = int(state.step)
    path = ckpt_dir / f"step={step}"
    # atomic publish: everything lands in step=N.tmp and is renamed to
    # step=N only after meta.json is on disk. A kill mid-save (observed
    # live when a stall watchdog escalated SIGTERM->SIGKILL during the
    # preemption checkpoint) must not leave a step dir that
    # latest_checkpoint would pick and load_checkpoint crash on.
    tmp = ckpt_dir / f"step={step}.tmp"
    # multi-host: every process calls this (orbax's save is collective);
    # plain filesystem work and the JSON sidecar are process-0-only
    is_main = jax.process_index() == 0
    if is_main:
        for p in (path, tmp):
            if p.exists():
                shutil.rmtree(p)
        tmp.mkdir(parents=True)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"fs2t_save_pre_{step}")

    arrays = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
    }
    if state.batch_stats is not None:
        arrays["batch_stats"] = jax.device_get(state.batch_stats)
    if getattr(state, "constants", None) is not None:
        arrays["constants"] = jax.device_get(state.constants)
    if getattr(state, "ema_params", None) is not None:
        arrays["ema_params"] = jax.device_get(state.ema_params)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save((tmp / "arrays").resolve(), arrays)
    ckptr.wait_until_finished()

    meta = {
        "model_info": {"name": MODEL_NAME, "version": MODEL_VERSION},
        "global_step": step,
        "config": config.model_checkpoint_dump(),
        "stats": stats.model_dump(mode="json") if stats is not None else None,
        "lang2id": lang2id,
        "speaker2id": speaker2id,
        "symbols": symbols,
        "metrics": metrics or {},
        # the epoch counter drives the bin-loss warmup and the max_epochs
        # budget — a resume that restarted at epoch 0 silently re-ramped
        # the binarization loss (persisted since this field's addition)
        "epoch": epoch,
        # top-level array keys actually saved, so load_checkpoint can build a
        # restore template that matches the on-disk structure even when the
        # run config toggled optional state (e.g. ema_decay) since saving
        "array_keys": sorted(arrays.keys()),
        # 'fused' (flat-buffer AdamW) or 'per_leaf' (optax chain) — lets a
        # resume under the other optimizer layout restore with the right
        # template and convert the moments exactly (training/fused_optim.py)
        "optimizer_format": _opt_format(state.opt_state),
    }
    if is_main:
        with open(tmp / "meta.json", "w", encoding="utf8") as f:
            json.dump(meta, f, indent=2)
        tmp.rename(path)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # non-main processes must not observe (or return) the path before
        # process 0 publishes it
        multihost_utils.sync_global_devices(f"fs2t_save_post_{step}")
    return path


class AsyncCheckpointWriter:
    """Overlap checkpoint I/O with training (training.async_checkpoint).

    `save()` snapshots every device array with an on-device copy — cheap
    (HBM bandwidth) and safe against the next train step's buffer donation,
    because the copies are dispatched on the main thread before the next
    step is — then a background thread performs the device->host fetch and
    the orbax/metadata write (and optional top-k prune) while training
    continues. At most one save is in flight: a new `save()` first joins
    the previous one. `wait()` joins and re-raises any background failure.
    """

    def __init__(self):
        import threading

        self._threading = threading
        self._thread = None
        self._exc: Optional[BaseException] = None

    def _snapshot(self, state):
        def copy_leaf(x):
            if isinstance(x, jax.Array):
                return jnp.copy(x)
            return x

        return jax.tree_util.tree_map(copy_leaf, state)

    def save(
        self,
        ckpt_dir: Path,
        state,
        config,
        stats,
        lang2id,
        speaker2id,
        symbols,
        metrics: Optional[dict] = None,
        keep_top_k: Optional[int] = None,
        monitor: Optional[str] = None,
        epoch: Optional[int] = None,
    ) -> None:
        self.wait()
        snap = self._snapshot(state)

        def work():
            try:
                save_checkpoint(
                    ckpt_dir, snap, config, stats, lang2id, speaker2id,
                    symbols, metrics=metrics, epoch=epoch,
                )
                if keep_top_k is not None and monitor is not None:
                    prune_checkpoints(ckpt_dir, keep_top_k, monitor)
            except BaseException as exc:  # surfaced on the next wait()
                self._exc = exc

        self._thread = self._threading.Thread(
            target=work, name="fs2t-async-ckpt", daemon=True
        )
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise CheckpointError(f"async checkpoint save failed: {exc}") from exc


def prune_checkpoints(ckpt_dir: Path, keep_top_k: int, monitor: str) -> None:
    """Keep the k best checkpoints by the monitored metric (lower is better),
    always keeping the latest (for resume)."""
    ckpt_dir = Path(ckpt_dir)
    entries = []
    for p in ckpt_dir.glob("step=*"):
        try:
            meta = json.loads((p / "meta.json").read_text())
        except Exception:
            continue
        entries.append((p, meta.get("metrics", {}).get(monitor), meta["global_step"]))
    if len(entries) <= keep_top_k:
        return
    latest = max(entries, key=lambda e: e[2])[0]
    scored = [e for e in entries if e[1] is not None]
    scored.sort(key=lambda e: e[1])
    keep = {p for p, _, _ in scored[:keep_top_k]} | {latest}
    for p, _, _ in entries:
        if p not in keep:
            shutil.rmtree(p)


def latest_checkpoint(ckpt_dir: Path) -> Optional[Path]:
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    steps = []
    for p in ckpt_dir.glob("step=*"):
        try:
            n = int(p.name.split("=")[1])
        except ValueError:  # step=N.tmp in-progress dirs
            continue
        if not (p / "meta.json").exists():
            # pre-atomic-publish half-written dir: unloadable, skip it
            continue
        steps.append((n, p))
    return max(steps)[1] if steps else None


def get_global_step(ckpt_path: Path) -> int:
    """Re-read global_step from the raw checkpoint (the reference must do
    this because Lightning resets it on load, fs2/cli/synthesize.py:322-330)."""
    meta = json.loads((Path(ckpt_path) / "meta.json").read_text())
    return int(meta["global_step"])


def check_and_upgrade_checkpoint(
    meta: dict, arrays: dict, current_symbols: list[str]
) -> tuple[dict, dict]:
    """Version gate + migrations (fs2/model.py:270-351 semantics)."""
    model_info = meta.get("model_info", {"name": MODEL_NAME, "version": "1.0"})
    meta["model_info"] = model_info

    name = model_info.get("name", "MISSING_TYPE")
    if name != MODEL_NAME:
        raise TypeError(
            f"Wrong model type ({name}), we are expecting a '{MODEL_NAME}' model"
        )

    version = Version(model_info.get("version", "0.0"))
    if version > Version(MODEL_VERSION):
        raise ValueError(
            "Your model was created with a newer version of this software, "
            "please update."
        )
    if version < Version("1.0"):
        meta["model_info"]["version"] = "1.0"

    level = (
        meta.get("config", {})
        .get("model", {})
        .get("target_text_representation_level", "characters")
    )
    if version < Version("1.2") and level == "phonological_features":
        raise ValueError(
            f"Breaking changes to phonological-feature handling in model "
            f"version 1.2; your model is version {version}. Please re-train."
        )
    elif version < Version("1.2"):
        # remap embedding rows by symbol (fs2/model.py:313-349)
        ckpt_symbols = meta.get("symbols", [])
        if len(ckpt_symbols) > len(current_symbols):
            raise CheckpointError(
                "Unable to automatically update your embedding table: the "
                "checkpoint has more symbols than the current model."
            )
        missing = [s for s in ckpt_symbols if s not in current_symbols]
        if missing:
            # the reference maps symbols absent from the current inventory
            # onto row 0 (fs2/model.py:335-341), silently overwriting the pad
            # embedding (last writer wins); we fail loudly instead
            raise CheckpointError(
                "Unable to automatically update your embedding table: "
                f"checkpoint symbols {missing!r} are not in the current "
                "model's symbol inventory."
            )
        old = np.asarray(arrays["params"]["text_input_layer"]["embedding"])
        new = np.zeros((len(current_symbols), old.shape[1]), dtype=old.dtype)
        index = {s: j for j, s in enumerate(current_symbols)}
        for i, sym in enumerate(ckpt_symbols):
            new[index[sym]] = old[i]
        arrays["params"]["text_input_layer"]["embedding"] = new
        meta["model_info"]["version"] = MODEL_VERSION
    return meta, arrays


def average_checkpoints(
    ckpt_paths: list[Path],
    out_path: Path,
    use_ema: bool = False,
) -> Path:
    """Uniform parameter averaging across checkpoints (Vaswani-style).

    Averages `params` (or `ema_params` with use_ema) leaf-wise across the
    given `step=N` directories; batch_stats/constants and all metadata come
    from the newest checkpoint. The optimizer state is NOT averaged (an
    averaged checkpoint is a serving artifact; resuming training from it
    restarts the optimizer). No reference equivalent — feature beyond the
    reference."""
    if not ckpt_paths:
        raise CheckpointError("average_checkpoints: no checkpoints given")
    ckpt_paths = [Path(p) for p in ckpt_paths]
    metas, trees = [], []
    key = "ema_params" if use_ema else "params"
    for p in ckpt_paths:
        meta, arrays = load_checkpoint(p)
        if use_ema and arrays.get("ema_params") is None:
            raise CheckpointError(f"{p} has no ema_params (trained without ema_decay)")
        metas.append((meta, arrays))
        trees.append(arrays[key])
    ref_struct = jax.tree_util.tree_structure(trees[0])
    for p, t in zip(ckpt_paths[1:], trees[1:]):
        if jax.tree_util.tree_structure(t) != ref_struct:
            raise CheckpointError(
                f"{p} has a different parameter structure; cannot average"
            )
    n = float(len(trees))

    def _avg_leaf(*leaves):
        # jnp.issubdtype understands ml_dtypes leaves (bfloat16, float8) that
        # np.issubdtype rejects; divide in float64 BEFORE casting back so
        # narrow dtypes neither overflow in the sum nor lose precision
        dtype = np.asarray(leaves[0]).dtype
        if not jnp.issubdtype(dtype, jnp.floating):
            return leaves[0]
        total = sum(np.asarray(x, dtype=np.float64) for x in leaves)
        return (total / n).astype(dtype)

    avg = jax.tree_util.tree_map(_avg_leaf, *trees)
    newest_meta, newest_arrays = max(metas, key=lambda m: m[0]["global_step"])

    out_path = Path(out_path)
    if out_path.exists():
        shutil.rmtree(out_path)
    out_path.mkdir(parents=True)
    out_arrays = {"params": avg, "opt_state": newest_arrays["opt_state"]}
    for k in ("batch_stats", "constants"):
        if newest_arrays.get(k) is not None:
            out_arrays[k] = newest_arrays[k]
    ckptr = ocp.StandardCheckpointer()
    ckptr.save((out_path / "arrays").resolve(), out_arrays)
    ckptr.wait_until_finished()
    meta = dict(newest_meta)
    meta["metrics"] = {}
    meta["averaged_from"] = [str(p) for p in ckpt_paths]
    # the averaged checkpoint drops optional arrays (e.g. ema_params) —
    # a stale array_keys would make the next template restore inject keys
    # orbax can't find (structure mismatch)
    meta["array_keys"] = sorted(out_arrays.keys())
    with open(out_path / "meta.json", "w", encoding="utf8") as f:
        json.dump(meta, f, indent=2)
    return out_path


def load_checkpoint(
    ckpt_path: Path,
    current_symbols: Optional[list[str]] = None,
    template: Optional[dict] = None,
) -> tuple[dict, dict]:
    """(meta, arrays) with version checks applied. arrays holds numpy pytrees
    for params/opt_state/batch_stats. Pass `template` (a pytree of the same
    structure, e.g. a freshly created TrainState's fields) to restore exact
    container types — without it orbax returns lists for tuples."""
    ckpt_path = Path(ckpt_path)
    with open(ckpt_path / "meta.json", "r", encoding="utf8") as f:
        meta = json.load(f)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        # Reconcile the template's top-level keys with what the checkpoint
        # actually holds: a run that toggles optional state (ema_decay on/off)
        # between save and resume must not hit orbax's structure-mismatch
        # ValueError. `array_keys` is recorded at save time; older checkpoints
        # fall back to the orbax metadata tree.
        saved_keys = meta.get("array_keys")
        if saved_keys is None:
            try:
                md = ckptr.metadata((ckpt_path / "arrays").resolve())
                saved_keys = sorted(md.item_metadata.tree.keys())
            except Exception:
                saved_keys = None
        if saved_keys is not None:
            template = {k: v for k, v in template.items() if k in saved_keys}
            if "ema_params" in saved_keys and "ema_params" not in template:
                # checkpoint carries EMA weights the current run doesn't use;
                # EMA mirrors the param structure, so borrow it for restore
                template = dict(template, ema_params=template["params"])
        abstract = jax.tree_util.tree_map(
            lambda x: ocp.utils.to_shape_dtype_struct(x)
            if hasattr(x, "shape")
            else x,
            template,
        )
        arrays = ckptr.restore((ckpt_path / "arrays").resolve(), abstract)
    else:
        arrays = ckptr.restore((ckpt_path / "arrays").resolve())
    if current_symbols is None:
        current_symbols = meta.get("symbols", [])
    meta, arrays = check_and_upgrade_checkpoint(meta, arrays, current_symbols)
    return meta, arrays
