"""HiFiGAN vocoder training: one jitted D+G step, TPU-first.

The reference delegates vocoder training to a separate torch repo (everyvoice
hfgl; this repo only loads its checkpoints, fs2/prediction_writing_callback.py
:656-681). Training it here closes the last gap in a self-contained TTS
stack: preprocess -> train acoustic model -> train vocoder -> synthesize,
all on TPU.

Recipe = the HiFiGAN paper (arXiv:2010.05646):
 - LSGAN adversarial losses over MPD+MSD sub-discriminators
 - feature-matching L1 (weight 2) over all intermediate discriminator maps
 - log-mel L1 (weight 45) between generated and real audio, computed with
   the same differentiable batched mel used by on-device preprocessing
   (preprocessing/features.mel_spectrogram_jax)
 - AdamW(betas 0.8/0.99) for both sides, exponential LR decay
 - D updates first, then G against the updated D (torch step order)

TPU shape discipline: training operates on fixed-size random crops
(`frames_per_crop` mel frames ≈ crop*hop samples), so the whole D+G step is
ONE compiled program; both discriminators see static shapes. The step is
donated, so state stays on-device across steps.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import FastSpeech2Config
from ..models.hifigan import (
    HiFiGANConfig,
    hifigan_generator,
    init_random_hifigan,
)
from ..models.hifigan_discriminators import (
    DiscriminatorConfig,
    discriminator_forward,
    init_discriminators,
)
from ..preprocessing.features import mel_spectrogram_jax


@dataclasses.dataclass
class VocoderTrainingConfig:
    batch_size: int = 16
    frames_per_crop: int = 32  # 32 * hop(256) = 8192-sample crops
    learning_rate: float = 2e-4
    adam_b1: float = 0.8
    adam_b2: float = 0.99
    lr_decay: float = 0.999  # per 1000 steps (paper: per epoch on LJSpeech)
    lr_decay_steps: int = 1000
    mel_weight: float = 45.0
    fm_weight: float = 2.0
    max_steps: int = 400000
    ckpt_steps: int = 5000
    seed: int = 0
    # Generator/discriminator conv compute dtype. Params, losses, and the
    # optimizer stay float32 (mixed precision); "bfloat16" is the TPU
    # default — measured 120.7 -> 99.7 ms/step on the full D+G step at
    # B=16/32-frame crops on v5e (same recipe the acoustic trainer uses).
    # Set "float32" for exact-f32 training.
    compute_dtype: str = "bfloat16"


def _mel_fn(audio, a):
    """[B, N] -> [B, n_mels, T] log-mel with the corpus audio settings."""
    return mel_spectrogram_jax(
        audio, a.input_sampling_rate, a.n_fft, a.fft_hop_size,
        a.fft_window_size, a.n_mels, a.f_min, a.f_max,
        htk=a.spec_type == "mel",
    )


def make_vocoder_train_step(
    gen_config: HiFiGANConfig,
    disc_config: DiscriminatorConfig,
    train_config: VocoderTrainingConfig,
    audio_config,
    opt_g, opt_d,
):
    """(state, batch) -> (state, losses). batch: {"mel" [B, F, n_mels],
    "wav" [B, F*hop]}. state: dict of params + opt states.

    Mixed precision: the conv compute (generator + both discriminators) runs
    in train_config.compute_dtype (bf16 default — ~1.2x step speedup on
    v5e); params, every loss term, the mel-spectrogram loss, and both
    optimizers stay float32."""
    dt = jnp.bfloat16 if train_config.compute_dtype == "bfloat16" else (
        jnp.float32
    )

    def _cast(tree):
        return jax.tree_util.tree_map(lambda x: x.astype(dt), tree)

    def g_forward(gen_params, mel):
        out = hifigan_generator(_cast(gen_params), mel.astype(dt), gen_config)
        return out.astype(jnp.float32)

    def _disc(disc_params, wav):
        scores, feats = discriminator_forward(
            _cast(disc_params), wav.astype(dt), disc_config
        )
        return (
            [s.astype(jnp.float32) for s in scores],
            [[f.astype(jnp.float32) for f in fl] for fl in feats],
        )

    def d_loss_fn(disc_params, wav_real, wav_fake):
        # One 2B-batch discriminator pass over [real; fake] instead of two
        # B-batch passes: identical math (the LSGAN terms are split per
        # half before the means), but every conv and its weight-gradient
        # runs once at twice the batch — fewer kernels, fatter matmuls.
        B = wav_real.shape[0]
        s_all, _ = _disc(
            disc_params, jnp.concatenate([wav_real, wav_fake], axis=0)
        )
        loss = 0.0
        for s in s_all:
            loss = (
                loss
                + jnp.mean((s[:B] - 1.0) ** 2)
                + jnp.mean(s[B:] ** 2)
            )
        return loss

    def g_loss_fn(gen_params, disc_params, mel, wav_real):
        wav_fake = g_forward(gen_params, mel)
        s_fake, f_fake = _disc(disc_params, wav_fake)
        _, f_real = _disc(disc_params, wav_real)
        adv = 0.0
        for sf in s_fake:
            adv = adv + jnp.mean((sf - 1.0) ** 2)
        fm = 0.0
        for fr_list, ff_list in zip(f_real, f_fake):
            for fr, ff in zip(fr_list, ff_list):
                fm = fm + jnp.mean(jnp.abs(jax.lax.stop_gradient(fr) - ff))
        mel_fake = _mel_fn(wav_fake, audio_config)
        mel_real = _mel_fn(wav_real, audio_config)
        mel_l1 = jnp.mean(jnp.abs(mel_fake - mel_real))
        total = (
            adv
            + train_config.fm_weight * fm
            + train_config.mel_weight * mel_l1
        )
        return total, {"g_adv": adv, "fm": fm, "mel_l1": mel_l1}

    def step(state, batch):
        mel, wav = batch["mel"], batch["wav"]
        # 1) discriminator update (generator output detached)
        wav_fake = jax.lax.stop_gradient(g_forward(state["gen"], mel))
        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
            state["disc"], wav, wav_fake
        )
        d_updates, d_opt = opt_d.update(
            d_grads, state["d_opt"], state["disc"]
        )
        disc = optax.apply_updates(state["disc"], d_updates)
        # 2) generator update against the updated discriminator
        (g_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state["gen"], disc, mel, wav
        )
        g_updates, g_opt = opt_g.update(g_grads, state["g_opt"], state["gen"])
        gen = optax.apply_updates(state["gen"], g_updates)
        new_state = {
            "gen": gen, "disc": disc, "g_opt": g_opt, "d_opt": d_opt,
            "step": state["step"] + 1,
        }
        losses = {"d": d_loss, "g": g_loss, **aux}
        return new_state, losses

    return jax.jit(step, donate_argnums=(0,))


def create_vocoder_state(
    gen_config: HiFiGANConfig,
    disc_config: DiscriminatorConfig,
    train_config: VocoderTrainingConfig,
):
    """-> (state dict, opt_g, opt_d)."""
    schedule = optax.exponential_decay(
        train_config.learning_rate,
        transition_steps=train_config.lr_decay_steps,
        decay_rate=train_config.lr_decay,
    )

    def adam():
        return optax.adamw(
            schedule, b1=train_config.adam_b1, b2=train_config.adam_b2,
            weight_decay=0.01,
        )

    opt_g, opt_d = adam(), adam()
    gen = init_random_hifigan(gen_config, seed=train_config.seed)
    gen = jax.tree_util.tree_map(jnp.asarray, gen)
    disc = init_discriminators(train_config.seed, disc_config)
    state = {
        "gen": gen,
        "disc": disc,
        "g_opt": opt_g.init(gen),
        "d_opt": opt_d.init(disc),
        "step": jnp.zeros((), dtype=jnp.int32),
    }
    return state, opt_g, opt_d


# ---------------------------------------------------------------------------
# data: random fixed-size crops from preprocessed artifacts
# ---------------------------------------------------------------------------


class VocoderCropLoader:
    """Random (mel, wav) crops from the preprocessed corpus.

    Reads the same artifacts the acoustic model trains on — `audio-SR.wav`
    and the raw log-mel `spec` (.npy [n_mels, T]) — so the vocoder learns
    exactly the mel domain the acoustic model emits. Utterances shorter
    than the crop are padded (wav with zeros, mel with LOG_CLIP floor)."""

    def __init__(
        self,
        config: FastSpeech2Config,
        train_config,
        rng=None,
        finetune_mel_dir: Optional[Path] = None,
    ):
        """finetune_mel_dir: read mels from `synthesize -O spec
        --teacher-forcing-directory …` outputs (spec-pred-*.npy under
        <dir>/synthesized_spec) instead of the ground-truth spec artifacts —
        the classic "fine-tune the vocoder on the acoustic model's own
        mels" quality step. Teacher forcing pins the predicted mel to the
        target length, so frames stay aligned with the real audio."""
        from ..preprocessing.pipeline import Preprocessor
        from ..utils import load_filelist

        self.a = config.preprocessing.audio
        self.frames = train_config.frames_per_crop
        self.hop = self.a.fft_hop_size
        self.batch = train_config.batch_size
        self.rng = rng or np.random.default_rng(train_config.seed)
        pre = Preprocessor(config)
        rows = load_filelist(Path(config.training.training_filelist))
        self.items = []
        skipped = 0
        for r in rows:
            b = r["basename"]
            s = r.get("speaker") or "default"
            lang = r.get("language") or "default"
            wav_p = pre.artifact_path(
                "audio", b, s, lang, f"audio-{self.a.input_sampling_rate}.wav",
            )
            if finetune_mel_dir is not None:
                from ..utils import slugify, truncate_basename

                # the spec writer names files by the slugified utterance
                # TEXT (reference parity, fs2/prediction_writing_callback
                # .py:270); fall back to the filelist basename for rows
                # whose basename IS the text slug
                tail = (
                    f"spec-pred-{self.a.input_sampling_rate}-"
                    f"{self.a.spec_type}.npy"
                )
                text = r.get("characters") or r.get("text") or ""
                candidates = [
                    truncate_basename(slugify(text)) if text else None,
                    truncate_basename(b),
                ]
                spec_p = None
                for name in candidates:
                    if not name:
                        continue
                    p = (
                        Path(finetune_mel_dir) / "synthesized_spec" /
                        "--".join([name, s, lang, tail])
                    )
                    spec_p = p
                    if p.exists():
                        break
            else:
                spec_p = pre.artifact_path(
                    "spec", b, s, lang, pre.spec_filename()
                )
            if wav_p.exists() and spec_p.exists():
                self.items.append((wav_p, spec_p))
            else:
                skipped += 1
        if not self.items:
            raise FileNotFoundError(
                "no (audio, spec) artifact pairs found — run `preprocess` "
                "with the audio and spec steps first"
                + (
                    " (and synthesize teacher-forced specs into "
                    f"{finetune_mel_dir})" if finetune_mel_dir else ""
                )
            )
        if skipped:
            print(f"vocoder loader: skipped {skipped} rows missing artifacts")

    def next_batch(self) -> Dict[str, np.ndarray]:
        from ..preprocessing.features import LOG_CLIP
        from ..preprocessing.pipeline import load_wav

        F, hop = self.frames, self.hop
        mels = np.full(
            (self.batch, F, self.a.n_mels), np.log(LOG_CLIP), np.float32
        )
        wavs = np.zeros((self.batch, F * hop), np.float32)
        for i in range(self.batch):
            wav_p, spec_p = self.items[self.rng.integers(len(self.items))]
            mel = np.load(spec_p)  # [n_mels, T]
            wav = load_wav(wav_p, self.a.input_sampling_rate)
            T = mel.shape[1]
            if T > F:
                s = int(self.rng.integers(0, T - F))
            else:
                s = 0
            m = mel[:, s : s + F]
            w = wav[s * hop : (s + F) * hop]
            mels[i, : m.shape[1]] = m.T
            wavs[i, : len(w)] = w
        return {"mel": mels, "wav": wavs}


def save_vocoder_checkpoint(
    ckpt_dir: Path,
    state: Dict,
    gen_config: HiFiGANConfig,
    keep: int = 5,
) -> Path:
    """Write step=N/ (orbax arrays + meta, for resume) AND refresh
    `vocoder.npz` at ckpt_dir root — the serving handoff format
    load_vocoder_checkpoint already reads."""
    import shutil

    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir)
    step = int(jax.device_get(state["step"]))
    path = ckpt_dir / f"step={step}"
    # atomic publish: write into step=N.tmp, rename only once meta.json
    # is on disk. A SIGKILL mid-save (e.g. a stall-watchdog escalating
    # after SIGTERM) must never leave a step=N/ that resume would pick
    # and crash on (observed live: step dir with arrays but no meta).
    tmp = ckpt_dir / f"step={step}.tmp"
    for p in (path, tmp):
        if p.exists():
            shutil.rmtree(p)
    tmp.mkdir(parents=True)
    host = jax.device_get(
        {k: state[k] for k in ("gen", "disc", "g_opt", "d_opt")}
    )
    ckptr = ocp.StandardCheckpointer()
    ckptr.save((tmp / "arrays").resolve(), host)
    ckptr.wait_until_finished()
    (tmp / "meta.json").write_text(
        json.dumps(
            {
                "model_info": {"name": "HiFiGAN", "version": "1.0"},
                "global_step": step,
                "generator_config": dataclasses.asdict(gen_config),
            },
            indent=2,
        )
    )
    tmp.rename(path)
    np.savez(
        ckpt_dir / "vocoder.npz",
        params=np.array(host["gen"], dtype=object),
        config=np.array(dataclasses.asdict(gen_config), dtype=object),
        global_step=step,
    )
    # keep the newest `keep` step dirs (GAN training has no single monotone
    # val metric; recency is the standard retention policy here)
    steps = sorted(
        (
            p for p in ckpt_dir.glob("step=*")
            if p.name.split("=")[1].isdigit()
        ),
        key=lambda p: int(p.name.split("=")[1]),
    )
    for p in steps[:-keep]:
        shutil.rmtree(p)
    return path


def load_vocoder_training_checkpoint(path: Path, state_template: Dict) -> Dict:
    """Restore a step=N/ dir into the template's structure (resume)."""
    import orbax.checkpoint as ocp

    path = Path(path)
    meta = json.loads((path / "meta.json").read_text())
    template = {
        k: jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, state_template[k]
        )
        for k in ("gen", "disc", "g_opt", "d_opt")
    }
    ckptr = ocp.StandardCheckpointer()
    arrays = ckptr.restore((path / "arrays").resolve(), target=template)
    arrays["step"] = jnp.asarray(meta["global_step"], dtype=jnp.int32)
    return arrays


def train_vocoder(
    config: FastSpeech2Config,
    train_config: Optional[VocoderTrainingConfig] = None,
    gen_config: Optional[HiFiGANConfig] = None,
    disc_config: Optional[DiscriminatorConfig] = None,
    log_dir: Optional[Path] = None,
    max_steps: Optional[int] = None,
    resume: bool = True,
    data_parallel: Optional[int] = None,
    finetune_from: Optional[Path] = None,
    finetune_mel_dir: Optional[Path] = None,
) -> Dict:
    """Train loop: crops -> jitted D+G step -> periodic checkpoints.

    data_parallel: shard crop batches over the first N chips' data axis
    (params replicated; XLA GSPMD inserts the gradient all-reduces — same
    recipe as the acoustic trainer). batch_size is rounded up to a multiple
    of N.
    finetune_from: initialize the generator from an existing vocoder
    checkpoint (.ckpt torch or .npz ours); discriminators start fresh, the
    standard fine-tuning setup.
    finetune_mel_dir: train on acoustic-model-predicted mels (`synthesize
    -O spec -T <preprocessed>` outputs) instead of ground-truth specs —
    adapts the vocoder to the mels it will actually see at inference."""
    train_config = train_config or VocoderTrainingConfig()
    a = config.preprocessing.audio
    if finetune_from is not None:
        from ..models.hifigan import load_vocoder_params

        ft_params, ft_config, ft_step = load_vocoder_params(Path(finetune_from))
        if gen_config is not None and dataclasses.asdict(gen_config) != (
            dataclasses.asdict(ft_config)
        ):
            raise ValueError(
                "--finetune-from checkpoint architecture differs from the "
                "requested generator config"
            )
        gen_config = ft_config
        print(f"fine-tuning generator from {finetune_from} (step {ft_step})")
    if gen_config is None:
        gen_config = HiFiGANConfig(
            n_mels=a.n_mels,
            sampling_rate=a.output_sampling_rate,
            hop_size=a.fft_hop_size,
        )
    if gen_config.total_upsampling != a.fft_hop_size:
        raise ValueError(
            f"generator upsampling {gen_config.total_upsampling} != "
            f"fft_hop_size {a.fft_hop_size}"
        )
    disc_config = disc_config or DiscriminatorConfig()
    log_dir = Path(
        log_dir
        or Path(config.training.logger.save_dir) / "vocoder"
    )
    ckpt_dir = log_dir / "checkpoints"
    ckpt_dir.mkdir(parents=True, exist_ok=True)

    mesh = None
    if data_parallel is not None and data_parallel > 1:
        from ..dataset import _round_up
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(n_devices=data_parallel, model_parallel=1)
        train_config = dataclasses.replace(
            train_config,
            batch_size=_round_up(train_config.batch_size, data_parallel),
        )

    state, opt_g, opt_d = create_vocoder_state(
        gen_config, disc_config, train_config
    )
    if finetune_from is not None:
        state["gen"] = jax.tree_util.tree_map(
            lambda a_, b_: jnp.asarray(b_, dtype=a_.dtype),
            state["gen"], ft_params,
        )
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        state = jax.device_put(state, NamedSharding(mesh, P()))
    if resume:
        # complete checkpoints only: a .tmp dir (or one missing meta.json,
        # from a pre-atomic-publish save killed mid-write) must not be
        # picked as the resume point
        existing = sorted(
            (
                p for p in ckpt_dir.glob("step=*")
                if p.name.split("=")[1].isdigit()
                and (p / "meta.json").exists()
            ),
            key=lambda p: int(p.name.split("=")[1]),
        )
        if existing and finetune_from is not None:
            # resuming would silently replace the just-loaded finetune
            # weights with the old run's — make the conflict explicit
            raise ValueError(
                f"--finetune-from given but {ckpt_dir} already contains "
                f"checkpoints (would resume {existing[-1].name} and discard "
                "the finetune initialization). Pass --no-resume, a fresh "
                "log dir, or drop --finetune-from to continue the old run."
            )
        if existing:
            state = load_vocoder_training_checkpoint(existing[-1], state)
            print(f"resumed vocoder training from {existing[-1]}")
    step_fn = make_vocoder_train_step(
        gen_config, disc_config, train_config, a, opt_g, opt_d
    )
    loader = VocoderCropLoader(
        config, train_config, finetune_mel_dir=finetune_mel_dir
    )
    max_steps = max_steps or train_config.max_steps
    step = int(jax.device_get(state["step"]))
    t0 = time.time()

    tb = None
    try:
        from tensorboardX import SummaryWriter

        tb = SummaryWriter(logdir=str(log_dir))
    except Exception:
        pass

    import queue as _queue
    import threading

    # background crop assembly: numpy slicing + wav reads off the step path
    q: "_queue.Queue" = _queue.Queue(maxsize=2)
    stop = threading.Event()

    def produce():
        batch = None
        while not stop.is_set():
            if batch is None:
                batch = loader.next_batch()  # build once...
            try:
                q.put(batch, timeout=0.5)
                batch = None  # ...and only rebuild after it lands
            except _queue.Full:
                continue  # retry the SAME batch; don't re-read the disk

    producer = threading.Thread(target=produce, daemon=True)
    producer.start()
    # SIGTERM/SIGINT -> finish the step, checkpoint, exit 0 (resume-exact;
    # see training/preemption.py)
    from .preemption import install_preemption_handler

    preempt = install_preemption_handler()
    try:
        while step < max_steps:
            if preempt["flag"]:
                print(
                    f"received signal {preempt['signum']}: checkpointing "
                    f"vocoder at step {step} and exiting cleanly"
                )
                break
            batch = q.get()
            if mesh is not None:
                from ..parallel.mesh import shard_batch

                batch = shard_batch(batch, mesh)
            state, losses = step_fn(state, batch)
            # host-side counter (step_fn increments by exactly 1): fetching
            # state["step"] every iteration forces a device sync that
            # serializes dispatch — RTT-bound wall time on remote devices.
            # The device syncs at the logging/checkpoint cadences below.
            step += 1
            if step % 50 == 0 or step == 1:
                host = {k: float(v) for k, v in losses.items()}
                sps = step / max(time.time() - t0, 1e-9)
                print(
                    f"vocoder step {step} d={host['d']:.4f} g={host['g']:.4f} "
                    f"mel_l1={host['mel_l1']:.4f} ({sps:.2f} steps/s)"
                )
                if tb is not None:
                    for k, v in host.items():
                        tb.add_scalar(f"vocoder/{k}", v, step)
                if not all(np.isfinite(v) for v in host.values()):
                    raise RuntimeError(
                        f"non-finite vocoder loss at step {step}: {host}"
                    )
            if step % train_config.ckpt_steps == 0 or step >= max_steps:
                save_vocoder_checkpoint(ckpt_dir, state, gen_config)
    finally:
        stop.set()
        preempt["disarm"]()  # unsignalled runs must not leak the handler
    save_vocoder_checkpoint(ckpt_dir, state, gen_config)
    print(f"vocoder checkpoint: {ckpt_dir / 'vocoder.npz'}")
    return state
