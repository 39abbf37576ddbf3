"""Training loop.

The harness role of upstream `train_base_command` (SURVEY.md §2.2): builds the
model + data, restores/fine-tunes from checkpoints, runs jitted train steps
over bucketed batches, validates on a cadence, logs `training/*_loss` /
`validation/*_loss` scalars (tag parity with fs2/model.py:387-389,524-528) to
TensorBoard, checkpoints top-k on `validation/total_loss`."""

from __future__ import annotations

import json
import math
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FastSpeech2Config
from ..dataset import BucketedLoader, load_datasets
from ..text import TextProcessor, lookuptables_from_config
from ..type_definitions import Stats
from ..models import FastSpeech2
from ..parallel import make_mesh, shard_batch
from .checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    prune_checkpoints,
    save_checkpoint,
)
from .preemption import install_preemption_handler
from .state import TrainState, create_train_state, make_optimizer
from .step import make_eval_step, make_multi_train_step, make_train_step
from ..preprocessing.stats import load_stats

MONITOR = "validation/total_loss"


def _guard_finite_losses(host: dict, step: int, enabled: bool) -> None:
    """Failure detection (SURVEY.md §5.3): halt on a non-finite loss rather
    than silently optimizing on garbage — one Adam step through a NaN
    gradient poisons the moments permanently. Runs on the logging cadence
    (the losses are already fetched), so it costs nothing extra."""
    if not enabled or math.isfinite(host.get("total", 0.0)):
        return
    from ..exceptions import TrainingDivergedError

    raise TrainingDivergedError(
        f"non-finite training loss at step {step}: {host} — resume from the "
        "last good checkpoint (set training.halt_on_non_finite=false to "
        "override)"
    )


def _device_batch(batch: dict) -> dict:
    """Strip host-only fields; ship arrays."""
    from ..dataset import HOST_ONLY_KEYS

    return {k: v for k, v in batch.items() if k not in HOST_ONLY_KEYS}


def _group_steps(loader, k: int):
    """Yield (n, host_batch): runs of k consecutive SAME-SHAPE batches
    np.stacked on a new leading axis (host-only keys dropped — the device
    batch strips them anyway), stragglers yielded singly with n=1.

    Feeds make_multi_train_step: only equal-shape batches can ride one
    lax.scan, so length-bucket switches flush the pending run. Worst case
    (every batch a different bucket) degenerates to the plain per-batch
    path with no stacking cost."""
    from ..dataset import HOST_ONLY_KEYS

    pend: list = []
    sig = None

    def _sig(b):
        return tuple(
            sorted(
                (key, tuple(getattr(v, "shape", ())), str(getattr(v, "dtype", type(v))))
                for key, v in b.items()
            )
        )

    def _flush():
        nonlocal pend
        out = []
        while pend:
            if len(pend) >= k:
                take, pend = pend[:k], pend[k:]
                keys = [
                    key for key in take[0]
                    if key not in HOST_ONLY_KEYS
                    and hasattr(take[0][key], "shape")
                ]
                out.append(
                    (k, {key: np.stack([b[key] for b in take]) for key in keys})
                )
            else:
                out.append((1, pend.pop(0)))
        return out

    for b in loader:
        s = _sig(b)
        if sig is not None and s != sig:
            yield from _flush()
        sig = s
        pend.append(b)
        if len(pend) == k:
            yield from _flush()
            sig = None
    yield from _flush()


class _GroupedLoader:
    """Re-iterable view of _group_steps (the prefetcher restarts its loader
    every epoch; a bare generator would be exhausted after the first)."""

    def __init__(self, loader, k: int):
        self.loader = loader
        self.k = k

    def __iter__(self):
        return _group_steps(self.loader, self.k)


class DevicePrefetcher:
    """Host→device double buffer (reference analogue: DataLoader workers,
    fs2/dataset.py:295-351).

    A background thread runs the loader's collation AND dispatches the
    (asynchronous) host→device transfer, keeping `size` batches in flight so
    the accelerator never waits on the input pipeline. `size=0` disables
    prefetching (synchronous iteration — for A/B measurement)."""

    _SENTINEL = object()

    def __init__(self, loader, mesh=None, size: int = 2, grouped: bool = False):
        self.loader = loader
        self.mesh = mesh
        self.size = size
        # grouped: loader yields (n_steps, batch) pairs from _group_steps —
        # transfer the batch, pass n_steps through untouched
        self.grouped = grouped

    def _put(self, item):
        if self.grouped:
            n, batch = item
        else:
            n, batch = 1, item
        db = _device_batch(batch)
        if self.mesh is not None:
            db = shard_batch(db, self.mesh)
        else:
            db = jax.tree_util.tree_map(
                lambda x: jax.device_put(x) if hasattr(x, "shape") else x, db
            )
        return (n, db) if self.grouped else db

    def __iter__(self):
        if self.size <= 0:
            for batch in self.loader:
                yield self._put(batch)
            return
        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=self.size)
        err: list[BaseException] = []
        stop = threading.Event()

        def produce():
            try:
                for batch in self.loader:
                    item = self._put(batch)
                    # bounded put + stop flag: an abandoned consumer (early
                    # stop, preemption, exception mid-epoch) must not leave
                    # this thread blocked forever holding device batches
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.5)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # propagate into the consumer
                err.append(e)
            finally:
                while True:  # sentinel must land even if the queue is full
                    try:
                        q.put(self._SENTINEL, timeout=0.5)
                        break
                    except queue.Full:
                        if stop.is_set():
                            break
                        continue

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is self._SENTINEL:
                    break
                yield item
            t.join()
            if err:
                raise err[0]
        finally:
            # GeneratorExit / consumer exception: release the producer and
            # drop its in-flight device batches
            stop.set()


class _LockstepJit:
    """Multi-process compile coordination for a jitted step function.

    The first collective of a freshly compiled program initializes the CPU
    backend's Gloo context with a ~30 s rendezvous window; if one process
    compiles faster than another (cold cache, loaded host), the fast one
    times out waiting. For each NEW input signature this wrapper AOT-compiles
    first (warming the persistent compile cache), then holds every process
    at a coordination-service barrier (which has no such window), and only
    then dispatches — so the rendezvous clock starts aligned."""

    def __init__(self, fn, name: str):
        self.fn = fn
        self.name = name
        self.seen: set = set()

    def __call__(self, *args):
        key = tuple(
            (tuple(x.shape), str(x.dtype))
            for x in jax.tree_util.tree_leaves(args)
            if hasattr(x, "shape")
        )
        if key not in self.seen:
            self.seen.add(key)
            self.fn.lower(*args).compile()
            from jax._src import distributed

            distributed.global_state.client.wait_at_barrier(
                f"fs2t_{self.name}_{len(self.seen)}", 600_000
            )
        return self.fn(*args)


class Trainer:
    """Mesh-aware trainer: with one visible device it runs plain jit; with
    several it lays the batch over the 'data' axis and the wide matmul params
    over the optional 'model' axis (parallel/mesh.py rules) — XLA GSPMD
    inserts the gradient all-reduces. Multi-host: call
    `jax.distributed.initialize()` before constructing (or pass
    `--distributed` to the train CLI)."""

    def __init__(
        self,
        config: FastSpeech2Config,
        stats: Optional[Stats] = None,
        log_dir: Optional[Path] = None,
        model_parallel: int = 1,
    ):
        self.model_parallel = model_parallel
        # multi-host: every process runs this same Trainer; data loading,
        # checkpoint writes and logging are coordinated by process index
        # (the reference gets the analogous per-rank handling from
        # Lightning DDP, fs2/cli/train.py:33-41)
        self.process_index = jax.process_index()
        self.process_count = jax.process_count()
        self.is_main = self.process_index == 0
        if (
            self.process_count > 1
            and config.training.batch_size % self.process_count != 0
        ):
            raise ValueError(
                f"training.batch_size={config.training.batch_size} must "
                f"divide evenly over {self.process_count} processes"
            )
        self.mesh = None
        if len(jax.devices()) > 1:
            mesh = make_mesh(model_parallel=model_parallel)
            data_size = mesh.shape["data"]
            if config.training.batch_size % data_size == 0:
                self.mesh = mesh
            else:
                print(
                    f"training.batch_size={config.training.batch_size} is not "
                    f"divisible by the data axis ({data_size} devices); "
                    f"running single-device. Set a divisible batch size to "
                    f"use the mesh."
                )
        if self.process_count > 1 and self.mesh is None:
            raise ValueError(
                "multi-host training requires the global mesh: make "
                "training.batch_size divisible by the data axis"
            )
        self.config = config
        save_dir = Path(config.preprocessing.save_dir)
        if stats is None:
            stats_path = save_dir / "stats.json"
            stats = load_stats(stats_path) if stats_path.exists() else None
        self.stats = stats
        self.lang2id, self.speaker2id = lookuptables_from_config(config)
        self.text_processor = TextProcessor(config.text)
        self.model = FastSpeech2(
            config=config,
            stats=stats,
            n_symbols=len(self.text_processor.symbols),
            n_speakers=max(len(self.speaker2id), 1),
            n_languages=max(len(self.lang2id), 1),
        )
        self.log_dir = Path(
            log_dir
            or Path(config.training.logger.save_dir)
            / config.training.logger.name
            / config.training.logger.version
        )
        self.ckpt_dir = self.log_dir / "checkpoints"
        self.writer = None
        self._async_ckpt = None
        if config.training.async_checkpoint:
            from .checkpoint import AsyncCheckpointWriter

            self._async_ckpt = AsyncCheckpointWriter()

    def _save_ckpt(self, state, metrics: dict | None = None) -> None:
        """Checkpoint + top-k prune; background when async_checkpoint."""
        cfg = self.config
        epoch = getattr(self, "_epoch", None)
        if self.process_count > 1:
            # multi-host: all processes join the (collective) snapshot,
            # process 0 writes, everyone syncs so no process reads or
            # prunes a half-written checkpoint. Async writing is bypassed
            # here — the snapshot itself is the synchronization point.
            from jax.experimental import multihost_utils

            from .checkpoint import host_state_snapshot

            host_state = host_state_snapshot(state)
            # orbax's save is itself collective — ALL processes call it
            # (save_checkpoint gates the filesystem/JSON work on process 0)
            save_checkpoint(
                self.ckpt_dir, host_state, cfg, self.stats, self.lang2id,
                self.speaker2id, self.text_processor.symbols,
                metrics=metrics, epoch=epoch,
            )
            if self.is_main:
                prune_checkpoints(
                    self.ckpt_dir, cfg.training.save_top_k_ckpts, MONITOR
                )
            multihost_utils.sync_global_devices(
                f"fs2t_ckpt_{int(host_state.step)}"
            )
            return
        if self._async_ckpt is not None:
            self._async_ckpt.save(
                self.ckpt_dir, state, cfg, self.stats, self.lang2id,
                self.speaker2id, self.text_processor.symbols,
                metrics=metrics, epoch=epoch,
                keep_top_k=cfg.training.save_top_k_ckpts, monitor=MONITOR,
            )
            return
        save_checkpoint(
            self.ckpt_dir, state, cfg, self.stats, self.lang2id,
            self.speaker2id, self.text_processor.symbols, metrics=metrics,
            epoch=epoch,
        )
        prune_checkpoints(self.ckpt_dir, cfg.training.save_top_k_ckpts, MONITOR)

    def _log(self, tag: str, value: float, step: int):
        if not self.is_main:
            return
        if self.writer is None:
            try:
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(logdir=str(self.log_dir))
            except Exception:
                self.writer = False
        if self.writer:
            self.writer.add_scalar(tag, value, step)

    def fit(self, max_steps: Optional[int] = None, resume: bool = True) -> TrainState:
        config = self.config
        max_steps = max_steps or config.training.max_steps
        train_ds, val_ds = load_datasets(config, self.lang2id, self.speaker2id)
        shard = (self.process_index, self.process_count)
        loader = BucketedLoader(
            train_ds,
            config.training.batch_size,
            n_buckets=config.training.bucket_count,
            seed=config.training.seed,
            use_weighted_sampler=config.training.use_weighted_sampler,
            max_mel_length=config.model.max_mel_length,
            shard=shard,
        )
        val_bs = min(config.training.batch_size, max(len(val_ds), 1))
        if self.process_count > 1:
            # multi-host has no replicated-batch fallback (each process
            # holds different rows), so the global val batch must stay
            # divisible over the data axis — use the training batch size
            # and let the loader zero-weight-fill short batches
            val_bs = config.training.batch_size
        val_loader = BucketedLoader(
            val_ds,
            val_bs,
            n_buckets=config.training.bucket_count,
            seed=config.training.seed,
            max_mel_length=config.model.max_mel_length,
            shard=shard,
        )

        # dropout-mask PRNG: a typed key pins the implementation per-key (no
        # global-config mutation). The TPU hardware RNG (unsafe_rbg) cuts the
        # default-config train step 72.4 -> 42.6 ms at B=32/T=1024 — threefry
        # mask generation was ~40% of the step (config.training.prng_impl).
        try:
            rng = jax.random.key(
                config.training.seed, impl=config.training.prng_impl
            )
        except Exception as exc:
            # only reachable on a jax too old for typed keys — the value
            # itself is schema-validated (config.training.prng_impl Literal)
            print(
                f"prng_impl={config.training.prng_impl!r} unavailable "
                f"({exc}); falling back to threefry PRNGKey (slower dropout"
                " masks)"
            )
            rng = jax.random.PRNGKey(config.training.seed)
        example = _device_batch(next(iter(loader)))
        # tensor parallelism forces the per-leaf optimizer (moments shard
        # with their params); otherwise config.training.fused_optimizer rules
        fused = (
            False
            if (self.mesh is not None and self.mesh.shape["model"] > 1)
            else None
        )
        state = create_train_state(config, self.model, rng, example, fused=fused)
        # (state is placed on the mesh AFTER the restore block below —
        # restoring replaces leaves with host numpy arrays, and on a
        # multi-host mesh those must be re-assembled into global arrays
        # before the first jitted step)

        start_path = None
        if resume:
            start_path = latest_checkpoint(self.ckpt_dir)
        if start_path is None and config.training.finetune_checkpoint:
            start_path = Path(config.training.finetune_checkpoint)
        if start_path is not None:
            from .fused_optim import convert_opt_state, opt_state_format

            # the on-disk optimizer format (meta is cheap to read ahead of
            # the orbax restore) decides which opt_state template to restore
            # with; a format mismatch is converted exactly afterwards — the
            # Adam moments are the same numbers in either layout
            disk_format = "per_leaf"
            try:
                with open(start_path / "meta.json", "r", encoding="utf8") as f:
                    disk_format = json.load(f).get(
                        "optimizer_format", "per_leaf"
                    )
            except Exception:
                pass
            cur_format = opt_state_format(state.opt_state)
            opt_template = state.opt_state
            if disk_format != cur_format:
                opt_template = make_optimizer(
                    config, fused=(disk_format == "fused")
                ).init(state.params)
            template = {"params": state.params, "opt_state": opt_template}
            if state.batch_stats is not None:
                template["batch_stats"] = state.batch_stats
            if state.constants is not None:
                template["constants"] = state.constants
            if state.ema_params is not None:
                template["ema_params"] = state.ema_params
            # an older-version checkpoint whose symbol inventory differs
            # needs the row-by-row embedding remap — the current-shape
            # template would make orbax fail on the embedding shape before
            # the migration code ever ran. Restore template-less (numpy
            # trees), let check_and_upgrade remap the params, and start
            # from FRESH optimizer state (the saved moments carry the old
            # embedding shape and cannot be transplanted).
            migrate = False
            try:
                with open(start_path / "meta.json", "r", encoding="utf8") as f:
                    _m = json.load(f)
                from packaging.version import Version

                from .. import MODEL_VERSION

                migrate = Version(
                    str(_m.get("model_info", {}).get("version", MODEL_VERSION))
                ) < Version(MODEL_VERSION) and (
                    _m.get("symbols", []) != self.text_processor.symbols
                )
            except Exception:
                pass
            if migrate:
                meta, arrays = load_checkpoint(
                    start_path, self.text_processor.symbols
                )
                print(
                    f"migrated {start_path} (model version "
                    f"{meta['model_info']['version']}, remapped symbol "
                    "table); optimizer state starts fresh"
                )
                arrays["opt_state"] = jax.device_get(state.opt_state)
                arrays.pop("ema_params", None)
                disk_format = cur_format  # fresh state needs no conversion
            else:
                meta, arrays = load_checkpoint(
                    start_path, self.text_processor.symbols, template=template
                )
            if disk_format != cur_format:
                arrays["opt_state"] = convert_opt_state(
                    arrays["opt_state"], state.opt_state, arrays["params"]
                )
            ema = state.ema_params
            if state.ema_params is not None:
                ema = arrays.get("ema_params")
                if ema is None:
                    # resumed with ema_decay newly enabled: seed from the params
                    ema = jax.tree_util.tree_map(jnp.array, arrays["params"])
            # else: ema_decay is off this run — ignore any EMA weights the
            # checkpoint may carry (they are still loadable via --use-ema)
            state = state.replace(
                params=arrays["params"],
                opt_state=arrays["opt_state"],
                batch_stats=arrays.get("batch_stats", state.batch_stats),
                ema_params=ema,
                step=meta["global_step"],
            )
            # the epoch counter drives the bin-loss warmup and the
            # max_epochs budget — resuming at epoch 0 silently re-ramped
            # the binarization loss and unbounded the epoch budget
            self._epoch = int(meta.get("epoch") or 0)

        if self.mesh is not None:
            from ..parallel import shard_state

            state = shard_state(state, self.mesh)

        train_step = make_train_step(config, self.model)
        eval_step = make_eval_step(config, self.model)
        if self.process_count > 1:
            train_step = _LockstepJit(train_step, "train")
            eval_step = _LockstepJit(eval_step, "eval")
        steps_per_call = max(1, int(config.training.steps_per_call))
        if steps_per_call > 1 and (self.mesh is not None or self.process_count > 1):
            # batch stacking adds a leading axis the mesh batch shardings
            # don't expect; single-dispatch fusion is a single-device
            # optimization for now
            if self.is_main:
                print("steps_per_call > 1 requires an unsharded run; using 1")
            steps_per_call = 1
        multi_step = (
            make_multi_train_step(config, self.model)
            if steps_per_call > 1
            else None
        )

        step = int(state.step)
        epoch = int(getattr(self, "_epoch", 0) or 0)
        t0 = time.time()
        timed_from = None  # (step, wall) set after the first (compile) step
        val_interval = config.training.val_check_interval or 500
        if isinstance(val_interval, float):
            # Lightning semantics (fs2/cli/train.py:33-41): a float is a
            # fraction of an epoch; an int is a step count.
            val_interval = max(1, round(val_interval * max(len(loader), 1)))
        ckpt_steps = config.training.ckpt_steps
        ckpt_epochs = config.training.ckpt_epochs
        es = config.training.early_stopping
        best_monitor = float("inf")
        stale_validations = 0
        stop_early = False
        if steps_per_call > 1:
            prefetch = DevicePrefetcher(
                _GroupedLoader(loader, steps_per_call),
                mesh=self.mesh,
                size=config.training.prefetch_batches,
                grouped=True,
            )
        else:
            prefetch = DevicePrefetcher(
                loader, mesh=self.mesh, size=config.training.prefetch_batches
            )
        # Preemption-safe shutdown: TPU fleets reclaim VMs with SIGTERM.
        # First signal -> finish the in-flight step, checkpoint, exit 0
        # (resume picks up at the same step); handlers are restored
        # immediately so a second signal kills the process normally.
        # (The reference's recovery story is "resume from the last cadence
        # checkpoint" — this loses zero steps instead of up to ckpt_steps.)
        preempt = install_preemption_handler()
        try:
            return self._fit_loop(
                state, max_steps, config, prefetch, train_step, eval_step,
                val_loader, rng, step, epoch, timed_from, val_interval,
                ckpt_steps, ckpt_epochs, es, best_monitor,
                stale_validations, stop_early, preempt,
                multi_step=multi_step, steps_per_call=steps_per_call,
            )
        finally:
            # an unsignalled fit must not leave the handler installed
            # (sequential fits would stack otherwise)
            preempt["disarm"]()

    def _fit_loop(
        self, state, max_steps, config, prefetch, train_step, eval_step,
        val_loader, rng, step, epoch, timed_from, val_interval,
        ckpt_steps, ckpt_epochs, es, best_monitor, stale_validations,
        stop_early, preempt, multi_step=None, steps_per_call=1,
    ):
        def crossed(interval, lo, hi):
            # a multiple of `interval` lies in the step window (lo, hi]
            return bool(interval) and hi // interval > lo // interval

        while step < max_steps and epoch < config.training.max_epochs and not stop_early:
            self._epoch = epoch  # checkpoints persist the live counter
            for item in prefetch:
                n, db = item if steps_per_call > 1 else (1, item)
                if n > 1 and step + n > max_steps:
                    # peel the tail group into single rows so the run stops
                    # at exactly max_steps
                    calls = [
                        (
                            1,
                            jax.tree_util.tree_map(
                                lambda x, i=i: x[i], db
                            ),
                        )
                        for i in range(max_steps - step)
                    ]
                else:
                    calls = [(n, db)]
                for n_i, db_i in calls:
                    prev = step
                    if n_i == 1:
                        state, losses = train_step(state, db_i, rng, epoch)
                        row = lambda i, _ls=losses: _ls
                    else:
                        state, stacked = multi_step(state, db_i, rng, epoch)
                        row = lambda i, _st=stacked: {
                            k: v[i] for k, v in _st.items()
                        }
                    # host-side step counter (each train step increments
                    # state.step by exactly 1): fetching state.step would
                    # force a device sync every iteration, serializing
                    # dispatch — with a remote/tunneled device that made the
                    # wall step time RTT-bound. The device only syncs at the
                    # logging / validation / checkpoint cadences below.
                    step += n_i
                    if preempt["flag"]:
                        print(
                            f"received signal {preempt['signum']}: checkpointing "
                            f"at step {step} and exiting cleanly"
                        )
                        stop_early = True
                        break
                    if timed_from is None:
                        # steps/s excludes the first call (jit compile)
                        timed_from = (step, time.time())
                    for s in range(prev + 1, step + 1):
                        if not (s % 50 == 0 or s == 1):
                            continue
                        host = {
                            k: float(np.asarray(v))
                            for k, v in row(s - prev - 1).items()
                        }
                        _guard_finite_losses(
                            host, s, config.training.halt_on_non_finite
                        )
                        for k, v in host.items():
                            self._log(f"training/{k}_loss" if k != "grad_norm" else "training/grad_norm", v, s)
                        sps = (s - timed_from[0]) / max(
                            time.time() - timed_from[1], 1e-9
                        )
                        if self.is_main:
                            print(
                                f"step {s} epoch {epoch} total={host['total']:.4f} "
                                f"spec={host.get('spec', 0):.4f} ({sps:.2f} steps/s "
                                f"excl. compile)"
                            )
                    if ckpt_steps and crossed(ckpt_steps, prev, step):
                        self._save_ckpt(state)
                    if crossed(val_interval, prev, step) or step >= max_steps:
                        val_losses = self.validate(state, val_loader, eval_step, epoch)
                        for k, v in val_losses.items():
                            self._log(f"validation/{k}_loss", v, step)
                        self._save_ckpt(
                            state, metrics={MONITOR: val_losses.get("total")}
                        )
                        if es.metric.value != "none":
                            current = val_losses.get("total", float("inf"))
                            if current < best_monitor - 1e-6:
                                best_monitor = current
                                stale_validations = 0
                            else:
                                stale_validations += 1
                                if stale_validations >= es.patience:
                                    print(
                                        f"early stopping: {MONITOR} stale for "
                                        f"{stale_validations} validations"
                                    )
                                    stop_early = True
                                    break
                    if step >= max_steps:
                        break
                if stop_early or step >= max_steps:
                    break
            epoch += 1
            self._epoch = epoch
            if ckpt_epochs and epoch % ckpt_epochs == 0:
                self._save_ckpt(state)
        # final checkpoint; a pending async save is joined inside
        self._save_ckpt(state)
        if self._async_ckpt is not None:
            self._async_ckpt.wait()
        return state

    def validate(self, state, val_loader, eval_step, epoch) -> dict:
        sums: dict = {}
        total_w = 0.0
        first = True
        for batch in val_loader:
            db = _device_batch(batch)
            if self.mesh is not None:
                db = shard_batch(db, self.mesh)
            losses, out = eval_step(state, db, epoch)
            if first:
                try:
                    self._log_validation_media(state, batch, out)
                except Exception as e:  # media logging must never kill training
                    print(f"validation media logging failed: {e}")
                first = False
            # weight each batch mean by its REAL sample count: the last
            # bucket batch may be mostly zero-weight filler, and an equal-
            # weight average would bias the monitored metric (checkpoint
            # ranking + early stopping) toward its few real utterances.
            # n_real_global is the cross-host count — per-shard weight sums
            # differ between processes and would make hosts disagree on the
            # monitored metric (divergent early stopping = deadlock)
            if batch.get("n_real_global") is not None:
                w = float(batch["n_real_global"])
            else:
                sw = batch.get("sample_weight")
                w = float(np.sum(sw)) if sw is not None else float(
                    len(batch.get("basename", [])) or 1
                )
            for k, v in losses.items():
                sums[k] = sums.get(k, 0.0) + float(v) * w
            total_w += w
        return {k: v / max(total_w, 1e-9) for k, v in sums.items()}

    def _log_validation_media(self, state, batch, out) -> None:
        """Rich validation logging (parity with fs2/model.py:439-528):
        soft/hard attention figures, GT-vs-predicted mel figures with
        denormalized pitch/energy overlays, predicted audio via the vocoder."""
        if self.writer is None or self.writer is False:
            self._log("noop/init", 0.0, 0)  # ensure writer exists
        if not self.writer:
            return
        import numpy as np

        from ..utils.plotting import expand, plot_attn_maps, plot_mel

        step = int(state.step)

        def host(x):
            # model outputs may be data-sharded global arrays (multi-host):
            # concatenate this host's shards — process 0 (the only media
            # logger) owns the FIRST global rows, matching `batch`'s rows
            if isinstance(x, jax.Array) and not (
                x.is_fully_addressable or x.is_fully_replicated
            ):
                shards = sorted(
                    x.addressable_shards,
                    key=lambda s: s.index[0].start or 0,
                )
                return np.concatenate(
                    [np.asarray(s.data) for s in shards], axis=0
                )
            return np.asarray(x)
        if self.config.model.learn_alignment and out["attn_soft"] is not None:
            figs = plot_attn_maps(
                host(out["attn_soft"]),
                host(out["attn_hard"]),
                host(batch["mel_lens"]),
                host(batch["src_lens"]),
                n=1,
            )
            for i, fig in enumerate(figs):
                self.writer.add_figure(
                    f"attention/{batch['basename'][i]}", fig, step
                )

        if self.stats is not None:
            duration_np = host(out["duration_target"])[0]
            gt_pitch = host(batch["pitch"])[0]
            gt_energy = host(batch["energy"])[0]
            pred_pitch = host(out["pitch_prediction"])[0]
            pred_energy = host(out["energy_prediction"])[0]
            if self.config.model.variance_predictors.pitch.level.value == "phone":
                pred_pitch = expand(pred_pitch, duration_np)
                if not self.config.model.learn_alignment:
                    gt_pitch = expand(gt_pitch, duration_np)
            if self.config.model.variance_predictors.energy.level.value == "phone":
                pred_energy = expand(pred_energy, duration_np)
                if not self.config.model.learn_alignment:
                    gt_energy = expand(gt_energy, duration_np)
            output_key = (
                "postnet_output" if self.config.model.use_postnet else "output"
            )
            fig = plot_mel(
                [
                    {
                        "mel": host(batch["mel"])[0].T,
                        "pitch": gt_pitch,
                        "energy": gt_energy,
                    },
                    {
                        "mel": host(out[output_key])[0].T,
                        "pitch": pred_pitch,
                        "energy": pred_energy,
                    },
                ],
                self.stats,
                ["Ground-Truth Spectrogram", "Synthesized Spectrogram"],
            )
            self.writer.add_figure(
                f"pred/spec_{batch['basename'][0]}", fig, step
            )

        if step == 0:
            # ground-truth audio (+ vocoder copy-synthesis) once at step 0
            # (fs2/model.py:392-437)
            try:
                from ..preprocessing.pipeline import SEP, load_wav

                a = self.config.preprocessing.audio
                audio_path = (
                    Path(self.config.preprocessing.save_dir)
                    / "audio"
                    / SEP.join(
                        [
                            batch["basename"][0],
                            batch["speaker"][0],
                            batch["language"][0],
                            f"audio-{a.input_sampling_rate}.wav",
                        ]
                    )
                )
                if audio_path.exists():
                    gt = load_wav(audio_path, a.output_sampling_rate)
                    self.writer.add_audio(
                        f"gt/wav_{batch['basename'][0]}", gt, step,
                        a.output_sampling_rate,
                    )
            except Exception as e:
                print(f"gt audio logging failed: {e}")

        if self.config.training.vocoder_path:
            try:
                vocoder = getattr(self, "_media_vocoder", None)
                if vocoder is None:
                    # load once, not per validation pass (tens of MB of
                    # deserialization on the training loop otherwise)
                    from ..models.hifigan import load_vocoder_checkpoint

                    vocoder, _, _ = load_vocoder_checkpoint(
                        Path(self.config.training.vocoder_path)
                    )
                    self._media_vocoder = vocoder
                output_key = (
                    "postnet_output" if self.config.model.use_postnet else "output"
                )
                wav, sr = vocoder(host(out[output_key])[:1])
                self.writer.add_audio(
                    f"pred/wav_{batch['basename'][0]}", wav[0], step, sr
                )
                if step == 0:
                    cs, sr2 = vocoder(host(batch["mel"])[:1])
                    self.writer.add_audio(
                        f"copy-synthesis/wav_{batch['basename'][0]}",
                        cs[0], step, sr2,
                    )
            except Exception as e:
                print(f"vocoder audio logging failed: {e}")
