"""Capture a jax.profiler trace of the hot training-path kernels and print a
per-op on-device time summary (aggregated from the trace's XLA-op events).

Usage: python tools/profile_kernels.py [mas|ctc|train|all] [--dir DIR]
"""

from __future__ import annotations

import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

try:  # persistent compile cache: repeat profiling runs skip relay compiles
    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parents[1] / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass

B, T, L = 8, 1024, 128


def run_mas(reps=20):
    from fastspeech2_lightning_tpu.ops.mas_pallas import mas_width1_pallas

    rng = np.random.default_rng(0)
    la = jnp.asarray(rng.standard_normal((B, T, L)).astype(np.float32))
    in_lens = jnp.full((B,), L, jnp.int32)
    out_lens = jnp.full((B,), T, jnp.int32)

    @jax.jit
    def step(la):
        hard = mas_width1_pallas(la, in_lens, out_lens)
        return la + jnp.sum(hard[:, :1, :1]) * 1e-12

    x = step(la)
    np.asarray(x[0, 0, 0])  # compile + warmup OUTSIDE the trace

    def go(x=x):
        for _ in range(reps):
            x = step(x)
        np.asarray(x[0, 0, 0])

    return go


def run_ctc(reps=20):
    from fastspeech2_lightning_tpu.ops.ctc import ctc_forward_sum

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((B, T, L + 1)).astype(np.float32))
    in_lens = jnp.full((B,), L, jnp.int32)
    out_lens = jnp.full((B,), T, jnp.int32)

    def loss(logits):
        lp = jax.nn.log_softmax(logits, axis=-1)
        return jnp.mean(ctc_forward_sum(lp, in_lens, out_lens))

    g = jax.grad(loss)

    @jax.jit
    def step(logits):
        return logits + g(logits) * 1e-12

    x = step(logits)
    np.asarray(x[0, 0, 0])

    def go(x=x):
        for _ in range(reps):
            x = step(x)
        np.asarray(x[0, 0, 0])

    return go


def run_train(reps=10):
    from __graft_entry__ import _flagship_config, _make_model, _train_batch
    from fastspeech2_lightning_tpu.training.state import create_train_state
    from fastspeech2_lightning_tpu.training.step import make_train_step

    config = _flagship_config()
    model = _make_model(config)
    batch = _train_batch(np.random.default_rng(0), B, L, T, 80)
    batch = {k: jax.device_put(v) for k, v in batch.items()}
    state = create_train_state(config, model, jax.random.PRNGKey(0), batch)
    train_step = make_train_step(config, model)
    try:  # framework-default dropout PRNG (training.prng_impl)
        rng = jax.random.key(1, impl=config.training.prng_impl)
    except Exception:
        rng = jax.random.PRNGKey(1)

    state, _ = train_step(state, batch, rng, 0)
    np.asarray(state.step)

    def go(state=state):
        for _ in range(reps):
            state, _ = train_step(state, batch, rng, 0)
        np.asarray(state.step)

    return go


def run_vocoder(reps=20):
    """HiFiGAN V1 generator at the serving shape (B=8, 256 mel frames)."""
    from fastspeech2_lightning_tpu.models.hifigan import (
        HiFiGANConfig,
        init_random_hifigan,
        make_vocoder_fn,
    )

    config = HiFiGANConfig()
    params = init_random_hifigan(config)
    voc = make_vocoder_fn(params, config, precision="bfloat16")
    rng = np.random.default_rng(0)
    mel = jax.device_put(
        jnp.asarray(rng.standard_normal((8, 256, 80)).astype(np.float32))
    )
    wav = voc.device_fn(mel)
    np.asarray(wav[0, 0])

    def go(wav=wav):
        for _ in range(reps):
            wav = voc.device_fn(mel + wav[:, :1, None] * 1e-12)
        np.asarray(wav[0, 0])

    return go


def run_voctrain(reps=10):
    """Full HiFiGAN D+G train step at the bench shape (B=16, 32-frame crops)."""
    from fastspeech2_lightning_tpu.models.hifigan import HiFiGANConfig
    from fastspeech2_lightning_tpu.models.hifigan_discriminators import (
        DiscriminatorConfig,
    )
    from fastspeech2_lightning_tpu.training.vocoder import (
        VocoderTrainingConfig,
        create_vocoder_state,
        make_vocoder_train_step,
    )

    gen_config = HiFiGANConfig()
    disc_config = DiscriminatorConfig()
    tc = VocoderTrainingConfig(batch_size=16, frames_per_crop=32)
    state, opt_g, opt_d = create_vocoder_state(gen_config, disc_config, tc)
    step = make_vocoder_train_step(
        gen_config, disc_config, tc, _voc_audio(gen_config), opt_g, opt_d
    )
    rng = np.random.default_rng(0)
    hop = gen_config.total_upsampling
    batch = {
        "mel": jax.device_put(
            rng.normal(size=(16, 32, gen_config.n_mels)).astype(np.float32)
        ),
        "wav": jax.device_put(
            (0.3 * rng.normal(size=(16, 32 * hop))).clip(-1, 1).astype(
                np.float32
            )
        ),
    }
    state, losses = step(state, batch)
    float(np.asarray(losses["g"]))  # compile + warmup OUTSIDE the trace

    def go(state=state):
        losses = None
        for _ in range(reps):
            state, losses = step(state, batch)
        float(np.asarray(losses["g"]))

    return go


def _voc_audio(gen_config):
    """Audio settings matching the generator (for the in-step mel loss)."""
    from fastspeech2_lightning_tpu.config import FastSpeech2Config

    a = FastSpeech2Config().preprocessing.audio
    a.n_mels = gen_config.n_mels
    a.fft_hop_size = gen_config.hop_size
    a.input_sampling_rate = gen_config.sampling_rate
    return a


def _newest_session_files(trace_dir: Path) -> list[str]:
    """Trace files of the NEWEST profiler session under `trace_dir`.

    jax.profiler.trace creates plugins/profile/<timestamp>/ per run, with
    several .trace.json.gz inside (host + one per device worker). Re-running
    with the same --dir must not double-count stale sessions, so group files
    by parent dir and keep only the most recent group (newest mtime within
    the group).
    """
    files = glob.glob(str(trace_dir / "**" / "*.trace.json.gz"), recursive=True)
    if not files:
        return []
    sessions = defaultdict(list)
    for f in files:
        sessions[str(Path(f).parent)].append(f)
    newest = max(
        sessions.values(),
        key=lambda fs: max(Path(f).stat().st_mtime for f in fs),
    )
    return newest


def _device_op_events(fname: str):
    """Yield per-op device X-events from one trace file.

    Device traces carry per-op events on threads named "XLA Ops"; prefer
    those so host-side compile/runtime events don't pollute the totals.
    A file with neither op threads nor device pids (e.g. the host-only
    trace that coexists with device-worker files) is skipped entirely —
    falling through to unfiltered counting would sum host events into
    "on-device op time".
    """
    with gzip.open(fname) as f:
        trace = json.load(f)
    pid_names = {}
    tid_names = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pid_names[e.get("pid")] = e.get("args", {}).get("name", "")
        elif e.get("name") == "thread_name":
            tid_names[(e.get("pid"), e.get("tid"))] = e.get("args", {}).get(
                "name", ""
            )
    device_pids = {
        p for p, n in pid_names.items()
        if "TPU" in n or "/device" in n or "Chip" in n or "XLA" in n
    }
    op_tids = {
        k for k, n in tid_names.items()
        if "XLA Ops" in n or "XLA TPU Ops" in n
    }
    if not op_tids and not device_pids:
        return
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        key = (e.get("pid"), e.get("tid"))
        if op_tids:
            if key not in op_tids:
                continue
        elif e.get("pid") not in device_pids:
            continue
        yield e


def device_op_ms(trace_dir: Path, pattern: str, reps: int = 1) -> float:
    """Total on-device ms of ops whose name matches `pattern`, per rep."""
    import re

    files = _newest_session_files(trace_dir)
    if not files:
        return float("nan")
    rx = re.compile(pattern)
    total = 0.0
    for fname in files:
        for e in _device_op_events(fname):
            if rx.search(e.get("name", "")):
                total += e.get("dur", 0)
    return total / 1e3 / max(reps, 1)


def summarize(trace_dir: Path, top: int = 25):
    files = _newest_session_files(trace_dir)
    if not files:
        print("no trace json found under", trace_dir)
        return
    dur = defaultdict(float)
    cnt = defaultdict(int)
    for fname in files:
        for e in _device_op_events(fname):
            name = e.get("name", "?")
            dur[name] += e.get("dur", 0)
            cnt[name] += 1
    total = sum(dur.values())
    print(f"\n== on-device op time (total {total / 1e3:.2f} ms across reps) ==")
    for name, d in sorted(dur.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{d / 1e3:9.3f} ms  x{cnt[name]:<5} {name[:110]}")


def main():
    global B
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if "--batch" in sys.argv:
        B = int(sys.argv[sys.argv.index("--batch") + 1])
    out = Path(sys.argv[sys.argv.index("--dir") + 1]) if "--dir" in sys.argv else Path("/tmp/prof_" + which)
    runners = {
        "mas": run_mas,
        "ctc": run_ctc,
        "train": run_train,
        "vocoder": run_vocoder,
        "voctrain": run_voctrain,
    }
    todo = list(runners) if which == "all" else [which]
    for name in todo:
        d = Path(str(out) + "_" + name) if which == "all" else out
        # two-phase runners return a closure: setup/compile/warmup happen
        # OUTSIDE the trace (a multi-minute tunnel compile inside the trace
        # window used to evict the step's device events), reps inside
        maybe_go = runners[name]()
        if callable(maybe_go):
            with jax.profiler.trace(str(d)):
                maybe_go()
        else:
            with jax.profiler.trace(str(d)):
                runners[name]()
        print(f"\n######## {name} ########")
        summarize(d)


if __name__ == "__main__":
    main()
