"""Benchmark harness.

Prints ONE JSON line:
  {"metric": "mel_frames_per_sec_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": R}

value  = mel frames produced per second per chip by batched synthesis
         (inference forward, flagship config: 4+4 Conformer layers, dim 256,
         80 mels — the reference's defaults) on the available accelerator.
         Measured as sustained pipelined throughput: independent pre-staged
         batches dispatched back-to-back, one final fetch that depends on
         every call's output (utils/benchmarking.time_pipelined). The
         reported ms_per_call is the stricter chained per-call latency
         (each call data-depends on the previous one).
vs_baseline = value / (CPU eager PyTorch reference-equivalent frames/s) —
         the reference's own benchmark harness semantics (fs2/cli/benchmark.py:
         warmup reps + timed reps, batch from the training collator) with its
         CPU-Lightning deployment as the anchor. The north-star target is
         vs_baseline > 50.

The CPU baseline is measured once and cached in .bench_baseline.json (an
architecture-equivalent torch model, same layer counts/widths/kernels, eager
mode, same batch shapes). Set FS2T_BENCH_FORCE_CPU_BASELINE=1 to re-measure.

FLOP parity of baseline vs measured model: both run 4+4 conformer layers at
d=256/ffn=1024/k=9, 5-layer variance predictors, 256-bin variance embeddings,
the length regulator, and a 5x512 PostNet over the same [B?, 128]->[?, 1024, 80]
shapes, so FLOPs/frame match by construction (~18 MFLOP/frame either side;
the TPU side's 1.19 TFLOP/call at B=64 is XLA-cost-analysis-verified). The
baseline uses CPU_B=16 only to keep its wall-clock sane — frames/s is
batch-normalized on both sides.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compile cache: repeat bench runs skip the 10-20 min
    relay compiles of the big jitted programs."""
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            str(Path(__file__).parent / ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

# TPU measurement batch: large enough that the chip, not per-call dispatch,
# is the bottleneck (throughput scales ~linearly 16->128). The CPU baseline
# uses CPU_B (eager torch is batch-insensitive per frame; a full B would just
# make the baseline run take minutes). Both report frames/s.
B, L, T = 64, 128, 1024
CPU_B = 16
N_MELS = 80
WARMUP = 5
REPS = 30

BASELINE_CACHE = Path(__file__).parent / ".bench_baseline.json"


def _synthesis_batch(rng, b=None, l=None, t=None):
    """Duration-driven synthesis batch: every token expands to t/l frames
    (T/L = 8 is the LJSpeech-ish average), so each call produces exactly b*t
    mel frames — a weight-independent full-occupancy throughput measurement."""
    b, l, t = b or B, l or L, t or T
    text = rng.integers(1, 60, size=(b, l)).astype(np.int32)
    return {
        "text": text,
        "src_lens": np.full(b, l, dtype=np.int32),
        "mel_lens": np.full(b, t, dtype=np.int32),
        "duration": np.full((b, l), t // l, dtype=np.int32),
        "pitch": np.zeros((b, l), dtype=np.float32),
        "energy": np.zeros((b, l), dtype=np.float32),
        "speaker_id": np.zeros(b, dtype=np.int32),
        "language_id": np.zeros(b, dtype=np.int32),
    }


N_STAGED = 8  # distinct pre-staged batches; defeats any single-batch caching


def measure_tpu() -> tuple[float, float, float, float]:
    """(frames_per_sec, ms_per_call, flops_per_call, mfu) for batched synthesis.

    Honest timing via utils.benchmarking: a scalar carry threads a real data
    dependency through every call, each trial ends in one forced device->host
    fetch, FLOPs come from XLA cost analysis, and the harness hard-fails if
    the implied MFU exceeds 100% (impossible number == broken timing).
    """
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from __graft_entry__ import _flagship_config, _make_model
    from fastspeech2_lightning_tpu.utils.benchmarking import (
        chainable,
        check_mfu,
        compiled_flops,
        time_chained,
        time_pipelined,
    )

    config = _flagship_config()
    config.model.learn_alignment = False  # deployment synthesis: no aligner
    model = _make_model(config)
    batch = _synthesis_batch(np.random.default_rng(0))

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
        deterministic=True,
        max_target_len=T,
    )

    def apply_fn(variables, batch):
        return model.apply(
            variables, batch, deterministic=True, max_target_len=T
        )["output"]

    jf = jax.jit(chainable(apply_fn, "pitch"))
    staged = []
    for i in range(N_STAGED):
        b = _synthesis_batch(np.random.default_rng(i))
        staged.append({k: jax.device_put(v) for k, v in b.items()})
    variables = jax.device_put(variables)

    flops = compiled_flops(jf, variables, staged[0], jnp.float32(0.0))
    trials = time_chained(
        jf, variables, staged, reps=REPS, trials=5, warmup=WARMUP
    )
    # best-of-trials: the tunnel/queue to a shared chip is noisy; the minimum
    # over fully-synchronized trials is the honest hardware number
    best_dt = min(trials)
    ms_per_call = best_dt / REPS * 1000
    mfu = check_mfu(flops, best_dt / REPS)

    # Sustained serving throughput: independent calls, dispatch overlapped
    # with execution, completion of every call forced by the final fetch.
    # This is the frames/s headline; ms_per_call above is per-call latency.
    jf_scalar = jax.jit(
        lambda v, b: jnp.sum(jnp.ravel(apply_fn(v, b))[:4]) * 1e-12
    )
    pipe = time_pipelined(
        jf_scalar, variables, staged, reps=REPS, trials=5, warmup=WARMUP
    )
    pipe_dt = min(pipe)
    pipe_mfu = check_mfu(flops, pipe_dt / REPS)
    frames = B * T
    return frames * REPS / pipe_dt, ms_per_call, flops, max(mfu, pipe_mfu)


# ---------------------------------------------------------------------------
# CPU torch baseline: architecture-equivalent eager model
# ---------------------------------------------------------------------------


def _torch_baseline_model():
    """Reference-equivalent torch model (same layer counts, widths, kernels as
    the flagship config — torchaudio-Conformer-style blocks). Built from
    torch primitives; used only to anchor the CPU-Lightning baseline."""
    import torch
    import torch.nn as nn

    d, ffn, heads, layers, k = 256, 1024, 2, 4, 9

    class ConformerLayer(nn.Module):
        def __init__(self):
            super().__init__()
            self.ffn1 = nn.Sequential(
                nn.LayerNorm(d), nn.Linear(d, ffn), nn.SiLU(), nn.Linear(ffn, d)
            )
            self.ln_attn = nn.LayerNorm(d)
            self.attn = nn.MultiheadAttention(d, heads, batch_first=True)
            self.ln_conv = nn.LayerNorm(d)
            self.pw1 = nn.Conv1d(d, 2 * d, 1)
            self.dw = nn.Conv1d(d, d, k, padding=k // 2, groups=d)
            self.bn = nn.BatchNorm1d(d)
            self.pw2 = nn.Conv1d(d, d, 1)
            self.ffn2 = nn.Sequential(
                nn.LayerNorm(d), nn.Linear(d, ffn), nn.SiLU(), nn.Linear(ffn, d)
            )
            self.final_ln = nn.LayerNorm(d)

        def forward(self, x):
            import torch.nn.functional as F

            x = x + 0.5 * self.ffn1(x)
            a = self.ln_attn(x)
            x = x + self.attn(a, a, a, need_weights=False)[0]
            c = self.ln_conv(x).transpose(1, 2)
            c = F.glu(self.pw1(c), dim=1)
            c = self.pw2(F.silu(self.bn(self.dw(c))))
            x = x + c.transpose(1, 2)
            x = x + 0.5 * self.ffn2(x)
            return self.final_ln(x)

    class VariancePredictor(nn.Module):
        def __init__(self, n_layers=5, ks=3):
            super().__init__()
            convs = []
            for _ in range(n_layers):
                convs += [
                    nn.Conv1d(d, d, ks, padding=ks // 2, groups=d),
                    nn.Conv1d(d, d, 1),
                    nn.ReLU(),
                ]
            self.convs = nn.Sequential(*convs)
            self.ln = nn.LayerNorm(d)
            self.out = nn.Linear(d, 1)

        def forward(self, x):
            h = self.convs(x.transpose(1, 2)).transpose(1, 2)
            return self.out(self.ln(h)).squeeze(-1)

    class Baseline(nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = nn.Embedding(64, d)
            self.encoder = nn.ModuleList([ConformerLayer() for _ in range(layers)])
            self.dur = VariancePredictor()
            self.pitch = VariancePredictor()
            self.energy = VariancePredictor()
            self.pitch_emb = nn.Embedding(256, d)
            self.energy_emb = nn.Embedding(256, d)
            self.bins = torch.linspace(-3, 3, 255)
            self.decoder = nn.ModuleList([ConformerLayer() for _ in range(layers)])
            self.mel = nn.Linear(d, N_MELS)
            pn = []
            for i in range(5):
                cin = N_MELS if i == 0 else 512
                cout = N_MELS if i == 4 else 512
                pn += [nn.Conv1d(cin, cout, 5, padding=2), nn.BatchNorm1d(cout)]
                if i < 4:
                    pn.append(nn.Tanh())
            self.postnet = nn.Sequential(*pn)

        def forward(self, text, durations):
            import torch

            x = self.emb(text)
            for layer in self.encoder:
                x = layer(x)
            e = self.energy(x)
            x = x + self.energy_emb(torch.bucketize(e, self.bins))
            p = self.pitch(x)
            x = x + self.pitch_emb(torch.bucketize(p, self.bins))
            _ = self.dur(x)
            outs = []
            for b in range(x.shape[0]):
                rep = torch.repeat_interleave(x[b], durations[b], dim=0)[:T]
                pad = torch.zeros(T - rep.shape[0], d)
                outs.append(torch.cat([rep, pad], 0))
            x = torch.stack(outs)
            for layer in self.decoder:
                x = layer(x)
            mel = self.mel(x)
            mel = mel + self.postnet(mel.transpose(1, 2)).transpose(1, 2)
            return mel, durations.sum(1).clamp(max=T)

    return Baseline().eval()


def measure_cpu_baseline() -> float:
    import torch

    torch.manual_seed(0)
    model = _torch_baseline_model()
    rng = np.random.default_rng(0)
    text = torch.tensor(rng.integers(1, 60, size=(CPU_B, L)), dtype=torch.long)
    durations = torch.full((CPU_B, L), T // L, dtype=torch.long)
    with torch.no_grad():
        _, lens = model(text, durations)
        frames = int(lens.sum())
        for _ in range(2):
            model(text, durations)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            model(text, durations)
        dt = time.perf_counter() - t0
    return frames * reps / dt


def get_cpu_baseline() -> float:
    force = os.environ.get("FS2T_BENCH_FORCE_CPU_BASELINE") == "1"
    if BASELINE_CACHE.exists() and not force:
        try:
            return float(json.loads(BASELINE_CACHE.read_text())["cpu_frames_per_sec"])
        except Exception:
            pass
    fps = measure_cpu_baseline()
    BASELINE_CACHE.write_text(
        json.dumps({"cpu_frames_per_sec": fps, "shapes": {"B": B, "L": L, "T": T}})
    )
    return fps


TRAIN_B = int(os.environ.get("FS2T_TRAIN_B", "32"))
TRAIN_T = int(os.environ.get("FS2T_TRAIN_T", "1024"))
TRAIN_REPS = 15


def measure_training() -> dict:
    """Honest training-step numbers (grad + optimizer update included).

    The reference's primary workload is training (fs2/cli/train.py,
    benchmark's training mode fs2/cli/benchmark.py:48-80). Chaining is
    inherent: each step consumes the previous step's donated TrainState, and
    the trial ends in a device->host fetch of the final loss, so the whole
    chain must really execute. FLOPs from XLA cost analysis of the compiled
    step; MFU hard-fails above 100%.
    """
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from __graft_entry__ import _flagship_config, _make_model, _train_batch
    from fastspeech2_lightning_tpu.training.state import create_train_state
    from fastspeech2_lightning_tpu.training.step import (
        make_multi_train_step,
        make_train_step,
    )
    from fastspeech2_lightning_tpu.utils.benchmarking import check_mfu

    config = _flagship_config()  # learn_alignment on: the training workload
    # training.steps_per_call: fuse k optimizer steps into one dispatch
    # (lax.scan over the same step core — tests/test_training.py).
    # MEASURED NEGATIVE on this tunnel at k=4: 36.68 vs 35.89 ms/step —
    # dispatch already pipelines; the ~3 ms wall-over-op-sum gap is device
    # scheduling bubbles, which a scan does not remove. Default 1; the knob
    # stays for genuinely RTT-bound links.
    spc = int(os.environ.get("FS2T_STEPS_PER_CALL", "1"))
    config.training.steps_per_call = spc
    model = _make_model(config)
    rng = np.random.default_rng(0)
    batches = [
        {
            k: jax.device_put(v)
            for k, v in _train_batch(
                np.random.default_rng(i), TRAIN_B, L, TRAIN_T, N_MELS
            ).items()
        }
        for i in range(4)
    ]
    state = create_train_state(
        config, model, jax.random.PRNGKey(0), batches[0]
    )
    train_step = make_train_step(config, model)
    # dropout PRNG impl: framework default (training.prng_impl, unsafe_rbg =
    # TPU hardware RNG); FS2T_PRNG_IMPL overrides for A/B (threefry2x32
    # measured 72.4 ms/step vs 42.6 with unsafe_rbg at B=32/T=1024)
    impl = os.environ.get("FS2T_PRNG_IMPL", config.training.prng_impl)
    try:
        key = jax.random.key(7, impl=impl)
    except Exception:
        key = jax.random.PRNGKey(7)

    flops = 0.0
    try:
        cost = train_step.lower(state, batches[0], key, 0).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:
        pass

    if spc > 1:
        multi = make_multi_train_step(config, model)
        stacked = {
            k: jnp.stack([b[k] for b in batches[:spc]])
            if spc <= len(batches)
            else jnp.stack([batches[i % len(batches)][k] for i in range(spc)])
            for k in batches[0]
        }
        # compile + warmup (forced completion via loss fetch)
        for _ in range(2):
            state, slosses = multi(state, stacked, key, 0)
        assert np.isfinite(float(np.asarray(slosses["total"][-1])))
        reps = max(1, TRAIN_REPS // spc)
        trials = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                state, slosses = multi(state, stacked, key, 0)
            final = float(np.asarray(slosses["total"][-1]))  # forces the chain
            trials.append(time.perf_counter() - t0)
            assert np.isfinite(final)
        sec_per_step = min(trials) / (reps * spc)
    else:
        # compile + warmup (forced completion via loss fetch)
        for i in range(3):
            state, losses = train_step(state, batches[i % len(batches)], key, 0)
        assert np.isfinite(float(np.asarray(losses["total"])))

        trials = []
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(TRAIN_REPS):
                state, losses = train_step(state, batches[i % len(batches)], key, 0)
            final = float(np.asarray(losses["total"]))  # forces the chain
            trials.append(time.perf_counter() - t0)
            assert np.isfinite(final)
        sec_per_step = min(trials) / TRAIN_REPS
    mfu = check_mfu(flops, sec_per_step)
    return {
        "train_ms_per_step": round(sec_per_step * 1000, 3),
        "train_frames_per_sec": round(TRAIN_B * TRAIN_T / sec_per_step, 1),
        "train_tflops_per_step": round(flops / 1e12, 3),
        "train_mfu_pct": round(mfu * 100, 2),
        "train_shapes": {
            "B": TRAIN_B, "L": L, "T": TRAIN_T, "steps_per_call": spc,
        },
    }


VOC_B = int(os.environ.get("FS2T_VOC_B", "16"))
VOC_FRAMES = int(os.environ.get("FS2T_VOC_FRAMES", "32"))
VOC_REPS = int(os.environ.get("FS2T_VOC_REPS", "20"))


def measure_vocoder_training() -> dict:
    """Honest HiFiGAN D+G training-step numbers (V1 generator + MPD/MSD,
    paper defaults: B=16, 32-frame crops = 8192-sample segments).

    Chaining is inherent — each step consumes the previous step's donated
    state — and each trial ends in a device->host loss fetch. FLOPs from
    XLA cost analysis of the compiled step. The reference delegates this
    workload to the torch everyvoice/HiFiGAN repo; the classic comparison
    anchor is upstream HiFiGAN's reported ~0.6 steps/s per V100 at these
    settings."""
    import jax

    _enable_compile_cache()

    from __graft_entry__ import _flagship_config
    from fastspeech2_lightning_tpu.models.hifigan import HiFiGANConfig
    from fastspeech2_lightning_tpu.models.hifigan_discriminators import (
        DiscriminatorConfig,
    )
    from fastspeech2_lightning_tpu.training.vocoder import (
        VocoderTrainingConfig,
        create_vocoder_state,
        make_vocoder_train_step,
    )
    from fastspeech2_lightning_tpu.utils.benchmarking import check_mfu

    audio = _flagship_config().preprocessing.audio
    gen_config = HiFiGANConfig(
        n_mels=audio.n_mels,
        sampling_rate=audio.output_sampling_rate,
        hop_size=audio.fft_hop_size,
    )
    disc_config = DiscriminatorConfig()
    tc = VocoderTrainingConfig(
        batch_size=VOC_B, frames_per_crop=VOC_FRAMES
    )
    state, opt_g, opt_d = create_vocoder_state(gen_config, disc_config, tc)
    step = make_vocoder_train_step(gen_config, disc_config, tc, audio,
                                   opt_g, opt_d)
    hop = gen_config.total_upsampling
    rng = np.random.default_rng(0)
    batches = [
        {
            "mel": jax.device_put(
                rng.normal(size=(VOC_B, VOC_FRAMES, audio.n_mels))
                .astype(np.float32)
            ),
            "wav": jax.device_put(
                (0.3 * rng.normal(size=(VOC_B, VOC_FRAMES * hop)))
                .clip(-1, 1).astype(np.float32)
            ),
        }
        for _ in range(4)
    ]

    # MFU numerator = ALGORITHMIC FLOPs: the timed step runs lane-packing
    # execution strategies (phase-packed / block-diagonal grouped convs)
    # whose widened/zero-padded kernels inflate XLA's counted flops — cost-
    # analyzing the timed program would overstate MFU. Compile the plain
    # grouped-conv strategy (same math, reference execution) just for the
    # count; AOT-compiled, never executed, and served from the persistent
    # compile cache on repeat runs.
    flops = 0.0
    try:
        import dataclasses as _dc

        ref_step = make_vocoder_train_step(
            gen_config,
            _dc.replace(
                disc_config, msd_phase_packed=False, msd_block_diag=False
            ),
            tc, audio, opt_g, opt_d,
        )
        cost = ref_step.lower(state, batches[0]).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:
        pass

    for i in range(3):
        state, losses = step(state, batches[i % len(batches)])
    assert np.isfinite(float(np.asarray(losses["g"])))

    trials = []
    for _ in range(4):
        t0 = time.perf_counter()
        for i in range(VOC_REPS):
            state, losses = step(state, batches[i % len(batches)])
        final = float(np.asarray(losses["g"]))  # forces the chain
        trials.append(time.perf_counter() - t0)
        assert np.isfinite(final)
    # median, not min: the tunnel occasionally acks the first post-compile
    # cycle before the device has finished it, which would record an
    # impossibly fast trial (observed 3.6 ms for a ~100 ms step)
    sec_per_step = sorted(trials)[len(trials) // 2] / VOC_REPS
    mfu = check_mfu(flops, sec_per_step)
    samples = VOC_B * VOC_FRAMES * hop
    return {
        "metric": "vocoder_train_step",
        "voc_ms_per_step": round(sec_per_step * 1000, 3),
        "voc_steps_per_sec": round(1.0 / sec_per_step, 2),
        "voc_samples_per_sec": round(samples / sec_per_step, 1),
        "voc_tflops_per_step": round(flops / 1e12, 3),
        "voc_mfu_pct": round(mfu * 100, 2),
        "voc_shapes": {"B": VOC_B, "frames": VOC_FRAMES, "hop": hop},
    }


# ---------------------------------------------------------------------------
# End-to-end text -> wav (acoustic model + HiFiGAN V1 vocoder)
# ---------------------------------------------------------------------------

E2E_B = int(os.environ.get("FS2T_E2E_B", "8"))
E2E_T = int(os.environ.get("FS2T_E2E_T", "1024"))
E2E_REPS = int(os.environ.get("FS2T_E2E_REPS", "20"))


def _torch_hifigan_v1(n_mels=N_MELS):
    """Eager torch HiFiGAN V1 generator (canonical topology: conv_pre k=7,
    4 ConvTranspose1d upsample stages 8/8/2/2, 3 resblocks per stage with
    kernels 3/7/11 x dilations 1/3/5, conv_post k=7) — the CPU anchor for
    the e2e baseline, mirroring the reference's wav handoff
    (fs2/prediction_writing_callback.py:656-681 -> everyvoice hfgl)."""
    import torch
    import torch.nn as nn

    ups, upk = (8, 8, 2, 2), (16, 16, 4, 4)
    rks, rds = (3, 7, 11), ((1, 3, 5),) * 3

    class ResBlock1(nn.Module):
        def __init__(self, ch, k, dils):
            super().__init__()
            self.convs1 = nn.ModuleList(
                nn.Conv1d(ch, ch, k, dilation=d, padding=(k - 1) * d // 2)
                for d in dils
            )
            self.convs2 = nn.ModuleList(
                nn.Conv1d(ch, ch, k, padding=(k - 1) // 2) for _ in dils
            )

        def forward(self, x):
            import torch.nn.functional as F

            for c1, c2 in zip(self.convs1, self.convs2):
                xt = c2(F.leaky_relu(c1(F.leaky_relu(x, 0.1)), 0.1))
                x = x + xt
            return x

    class Generator(nn.Module):
        def __init__(self):
            super().__init__()
            ch = 512
            self.conv_pre = nn.Conv1d(n_mels, ch, 7, padding=3)
            self.ups = nn.ModuleList()
            self.res = nn.ModuleList()
            for u, k in zip(ups, upk):
                self.ups.append(
                    nn.ConvTranspose1d(ch, ch // 2, k, u, padding=(k - u) // 2)
                )
                ch //= 2
                self.res.append(
                    nn.ModuleList(
                        ResBlock1(ch, k_, d_) for k_, d_ in zip(rks, rds)
                    )
                )
            self.conv_post = nn.Conv1d(ch, 1, 7, padding=3)

        def forward(self, mel):
            import torch
            import torch.nn.functional as F

            x = self.conv_pre(mel)
            for up, blocks in zip(self.ups, self.res):
                x = up(F.leaky_relu(x, 0.1))
                x = torch.stack([b(x) for b in blocks]).mean(0)
            return torch.tanh(self.conv_post(F.leaky_relu(x, 0.1)))[:, 0]

    return Generator().eval()


def measure_cpu_e2e_baseline() -> float:
    """CPU eager torch samples/s for the full text -> mel -> wav chain
    (architecture-equivalent acoustic model + HiFiGAN V1). Small shapes keep
    the run sane; samples/s is batch/length-normalized."""
    import torch

    torch.manual_seed(0)
    model = _torch_baseline_model()
    voc = _torch_hifigan_v1()
    b, t = 2, 256
    rng = np.random.default_rng(0)
    text = torch.tensor(rng.integers(1, 60, size=(b, L)), dtype=torch.long)
    durations = torch.full((b, L), t // L, dtype=torch.long)
    with torch.no_grad():
        mel, _ = model(text, durations)
        mel = mel[:, :t]
        wav = voc(mel.transpose(1, 2))
        samples = wav.numel()
        model(text, durations)  # warmup consistency with acoustic baseline
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            m, _ = model(text, durations)
            voc(m[:, :t].transpose(1, 2))
        dt = time.perf_counter() - t0
    return samples * reps / dt


def get_cpu_e2e_baseline() -> float:
    force = os.environ.get("FS2T_BENCH_FORCE_CPU_BASELINE") == "1"
    if BASELINE_CACHE.exists() and not force:
        try:
            cached = json.loads(BASELINE_CACHE.read_text())
            if "cpu_e2e_samples_per_sec" in cached:
                return float(cached["cpu_e2e_samples_per_sec"])
        except Exception:
            pass
    fps = measure_cpu_e2e_baseline()
    try:
        cached = json.loads(BASELINE_CACHE.read_text())
    except Exception:
        cached = {}
    cached["cpu_e2e_samples_per_sec"] = fps
    BASELINE_CACHE.write_text(json.dumps(cached))
    return fps


def measure_e2e() -> dict:
    """Honest end-to-end deployment numbers: text batch -> mel (flagship
    acoustic model, duration-driven full occupancy) -> wav (HiFiGAN V1) in
    one jitted program. Reports chained per-call latency, pipelined
    throughput as a realtime factor (audio seconds generated per wall
    second), and TTFA — the streaming path's time to first audio: one
    acoustic forward + one vocoder window + the device->host fetch of the
    first audio bytes, per call."""
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from __graft_entry__ import _flagship_config, _make_model
    from fastspeech2_lightning_tpu.models.hifigan import (
        HiFiGANConfig,
        hifigan_generator,
        init_random_hifigan,
    )
    from fastspeech2_lightning_tpu.utils.benchmarking import (
        chainable,
        check_mfu,
        compiled_flops,
        time_chained,
        time_pipelined,
    )

    config = _flagship_config()
    config.model.learn_alignment = False
    model = _make_model(config)
    vcfg = HiFiGANConfig(n_mels=N_MELS)
    vparams = jax.device_put(init_random_hifigan(vcfg))
    hop = vcfg.total_upsampling
    mel_key = "postnet_output" if config.model.use_postnet else "output"

    batch0 = _synthesis_batch(np.random.default_rng(0), b=E2E_B, t=E2E_T)
    variables = jax.device_put(
        model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch0,
            deterministic=True,
            max_target_len=E2E_T,
        )
    )

    def e2e_apply(packed, batch):
        avars, vp = packed
        mel = model.apply(
            avars, batch, deterministic=True, max_target_len=E2E_T
        )[mel_key]
        return hifigan_generator(vp, mel, vcfg)

    packed = (variables, vparams)
    staged = [
        {
            k: jax.device_put(v)
            for k, v in _synthesis_batch(
                np.random.default_rng(i), b=E2E_B, t=E2E_T
            ).items()
        }
        for i in range(4)
    ]
    jf = jax.jit(chainable(e2e_apply, "pitch"))
    flops = compiled_flops(jf, packed, staged[0], jnp.float32(0.0))
    trials = time_chained(jf, packed, staged, reps=E2E_REPS, trials=5, warmup=3)
    ms_per_call = min(trials) / E2E_REPS * 1000
    mfu = check_mfu(flops, min(trials) / E2E_REPS)

    jf_scalar = jax.jit(
        lambda v, b: jnp.sum(jnp.ravel(e2e_apply(v, b))[:4]) * 1e-12
    )
    pipe = time_pipelined(
        jf_scalar, packed, staged, reps=E2E_REPS, trials=5, warmup=3
    )
    pipe_sec_per_call = min(pipe) / E2E_REPS
    audio_sec_per_call = E2E_B * E2E_T * hop / vcfg.sampling_rate
    samples_per_sec = E2E_B * E2E_T * hop / pipe_sec_per_call
    pipe_mfu = check_mfu(flops, pipe_sec_per_call)

    # TTFA: a single B=1 request on the streaming path (synthesis/streaming):
    # acoustic forward at a small frame bucket, vocode the first
    # (window + 2*margin) frames, fetch the audio. Each rep pays the real
    # device->host fetch of the first audio bytes — that IS first audio.
    window = 128
    margin = vcfg.receptive_margin_frames
    t1 = 512
    ttfa_batch = {
        k: jax.device_put(v)
        for k, v in _synthesis_batch(
            np.random.default_rng(9), b=1, t=t1
        ).items()
    }

    @jax.jit
    def first_window(packed, batch):
        avars, vp = packed
        mel = model.apply(
            avars, batch, deterministic=True, max_target_len=t1
        )[mel_key]
        return hifigan_generator(vp, mel[:, : window + 2 * margin], vcfg)

    wav = np.asarray(first_window(packed, ttfa_batch))  # compile + warmup
    assert np.isfinite(wav).all()
    ttfa_trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            np.asarray(first_window(packed, ttfa_batch))
        ttfa_trials.append((time.perf_counter() - t0) / reps)
    ttfa_ms = min(ttfa_trials) * 1000

    try:
        cpu = get_cpu_e2e_baseline()
    except Exception:
        cpu = float("nan")
    ratio = samples_per_sec / cpu if cpu == cpu and cpu > 0 else None
    return {
        "metric": "e2e_text_to_wav",
        "e2e_ms_per_call": round(ms_per_call, 3),
        "e2e_samples_per_sec": round(samples_per_sec, 1),
        "e2e_rtf": round(audio_sec_per_call / pipe_sec_per_call, 1),
        "e2e_tflops_per_call": round(flops / 1e12, 3),
        "e2e_mfu_pct": round(max(mfu, pipe_mfu) * 100, 2),
        "ttfa_ms": round(ttfa_ms, 3),
        "ttfa_first_audio_sec": round((window + 2 * margin) * hop
                                      / vcfg.sampling_rate, 3),
        "vs_baseline": round(ratio, 2) if ratio else None,
        "e2e_shapes": {"B": E2E_B, "L": L, "T": E2E_T, "hop": hop},
    }


def main():
    import sys

    if "--mode" in sys.argv and "training" in sys.argv:
        print(json.dumps(dict({"metric": "train_step"}, **measure_training())))
        return
    if "--mode" in sys.argv and "e2e" in sys.argv:
        print(json.dumps(measure_e2e()))
        return
    if "--mode" in sys.argv and "vocoder" in sys.argv:
        print(json.dumps(measure_vocoder_training()))
        return
    tpu_fps, ms_per_call, flops, mfu = measure_tpu()
    try:
        cpu_fps = get_cpu_baseline()
    except Exception:
        cpu_fps = float("nan")
    ratio = tpu_fps / cpu_fps if cpu_fps == cpu_fps and cpu_fps > 0 else None
    line = {
        "metric": "mel_frames_per_sec_per_chip",
        "value": round(tpu_fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(ratio, 2) if ratio else None,
        "ms_per_call": round(ms_per_call, 3),
        "tflops_per_call": round(flops / 1e12, 3),
        "mfu_pct": round(mfu * 100, 2),
    }
    # Training is the reference's primary workload — include its headline
    # numbers on the same line (grad + optimizer update, B=32/T=1024).
    # Guarded: a training-measurement failure must never cost the
    # inference line. Opt out with FS2T_BENCH_SKIP_TRAINING=1.
    if os.environ.get("FS2T_BENCH_SKIP_TRAINING", "0") != "1":
        try:
            line.update(measure_training())
        except Exception as exc:  # pragma: no cover - defensive
            line["train_error"] = f"{type(exc).__name__}: {exc}"[:200]
    print(json.dumps(line))


if __name__ == "__main__":
    main()
