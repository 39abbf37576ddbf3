"""Measure: share ONE generator forward between the D and G updates via
jax.vjp, vs the shipped step's two g_forward calls (stop-gradded for D,
re-traced under grad for G). Mathematically identical (gen params unchanged
between the two uses; torch HiFiGAN reuses y_g_hat the same way).

MEASURED RESULT (2026-08-20, single v5e chip, B=16 x 32-frame crops,
bf16 compute, bench.py-style forced-fetch median timing):

    baseline (two g_forward in one jit): 57.82 ms/step
    shared-vjp (one g_forward):          57.49 ms/step
    losses: bit-identical at every step (d/g/fm/g_adv/mel_l1)

CONCLUSION — NEUTRAL, not landed. Both g_forward calls live in the SAME
jit program with identical inputs (params untouched between them), so XLA
common-subexpression elimination already merges them; the vjp restructure
saves nothing and would hold the generator's vjp residuals across the
whole D update, raising peak activation memory. The shipped two-forward
step in training/vocoder.py stays. (An earlier run that timed
block_until_ready on the donated output state read 2.9 ms/step for the
baseline — the tunnel acks donated-alias buffers before execution
finishes; see bench() below for the forced-fetch harness.)"""
import time
import numpy as np
import jax
import jax.numpy as jnp
import optax

from fastspeech2_lightning_tpu.models.hifigan import HiFiGANConfig, hifigan_generator
from fastspeech2_lightning_tpu.models.hifigan_discriminators import (
    DiscriminatorConfig, discriminator_forward,
)
from fastspeech2_lightning_tpu.training.vocoder import (
    VocoderTrainingConfig, create_vocoder_state, make_vocoder_train_step, _mel_fn,
)
from fastspeech2_lightning_tpu.config import FastSpeech2Config


def _voc_audio(gen_config):
    a = FastSpeech2Config().preprocessing.audio
    a.n_mels = gen_config.n_mels
    a.fft_hop_size = gen_config.hop_size
    a.input_sampling_rate = gen_config.sampling_rate
    return a


def make_shared_fwd_step(gen_config, disc_config, tc, audio_config, opt_g, opt_d):
    dt = jnp.bfloat16 if tc.compute_dtype == "bfloat16" else jnp.float32

    def _cast(tree):
        return jax.tree_util.tree_map(lambda x: x.astype(dt), tree)

    def g_forward(gen_params, mel):
        out = hifigan_generator(_cast(gen_params), mel.astype(dt), gen_config)
        return out.astype(jnp.float32)

    def _disc(disc_params, wav):
        scores, feats = discriminator_forward(_cast(disc_params), wav.astype(dt), disc_config)
        return ([s.astype(jnp.float32) for s in scores],
                [[f.astype(jnp.float32) for f in fl] for fl in feats])

    def d_loss_fn(disc_params, wav_real, wav_fake):
        B = wav_real.shape[0]
        s_all, _ = _disc(disc_params, jnp.concatenate([wav_real, wav_fake], axis=0))
        loss = 0.0
        for s in s_all:
            loss = loss + jnp.mean((s[:B] - 1.0) ** 2) + jnp.mean(s[B:] ** 2)
        return loss

    def g_loss_from_wav(wav_fake, disc_params, wav_real):
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
        total = adv + tc.fm_weight * fm + tc.mel_weight * mel_l1
        return total, {"g_adv": adv, "fm": fm, "mel_l1": mel_l1}

    def step(state, batch):
        mel, wav = batch["mel"], batch["wav"]
        # ONE generator forward, residuals kept for the later pullback
        wav_fake, g_vjp = jax.vjp(lambda p: g_forward(p, mel), state["gen"])
        # D update on the detached fake
        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
            state["disc"], wav, jax.lax.stop_gradient(wav_fake))
        d_updates, d_opt = opt_d.update(d_grads, state["d_opt"], state["disc"])
        disc = optax.apply_updates(state["disc"], d_updates)
        # G update against the updated D, pulling back through the saved vjp
        (g_loss, aux), dwav = jax.value_and_grad(g_loss_from_wav, has_aux=True)(
            wav_fake, disc, wav)
        (g_grads,) = g_vjp(dwav)
        g_updates, g_opt = opt_g.update(g_grads, state["g_opt"], state["gen"])
        gen = optax.apply_updates(state["gen"], g_updates)
        new_state = {"gen": gen, "disc": disc, "g_opt": g_opt, "d_opt": d_opt,
                     "step": state["step"] + 1}
        return new_state, {"d": d_loss, "g": g_loss, **aux}

    return jax.jit(step, donate_argnums=(0,))


def bench(step, state, batch, reps=20, trials=4):
    """Mirror bench.py's measure_vocoder_training timing: the loss fetch
    INSIDE the timed window forces the chained steps (block_until_ready on
    donated-alias buffers can ack early over the tunnel — observed 2.9 ms
    for a ~68 ms step); median of trials rejects stray fast acks."""
    for _ in range(3):
        state, losses = step(state, batch)
    assert np.isfinite(float(np.asarray(losses["g"])))
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(reps):
            state, losses = step(state, batch)
        final = float(np.asarray(losses["g"]))  # forces the chain
        times.append(time.perf_counter() - t0)
        assert np.isfinite(final)
    dt = sorted(times)[len(times) // 2] / reps * 1000
    return dt, {k: float(np.asarray(v)) for k, v in losses.items()}


def main():
    from bench import _enable_compile_cache

    _enable_compile_cache()
    # exactly the bench.py measure_vocoder_training() model config so the
    # baseline step comes out of the persistent compile cache
    from __graft_entry__ import _flagship_config

    flagship_audio = _flagship_config().preprocessing.audio
    gen_config = HiFiGANConfig(
        n_mels=flagship_audio.n_mels,
        sampling_rate=flagship_audio.output_sampling_rate,
        hop_size=flagship_audio.fft_hop_size,
    )
    disc_config = DiscriminatorConfig()
    tc = VocoderTrainingConfig(batch_size=16, frames_per_crop=32)
    audio = flagship_audio
    rng = np.random.default_rng(0)
    hop = gen_config.total_upsampling
    batch = {
        "mel": jax.device_put(rng.normal(size=(16, 32, gen_config.n_mels)).astype(np.float32)),
        "wav": jax.device_put((0.3 * rng.normal(size=(16, 32 * hop))).clip(-1, 1).astype(np.float32)),
    }

    state, opt_g, opt_d = create_vocoder_state(gen_config, disc_config, tc)
    base = make_vocoder_train_step(gen_config, disc_config, tc, audio, opt_g, opt_d)
    ms_base, l_base = bench(base, state, batch)
    print(f"baseline (two g fwd): {ms_base:.2f} ms/step  losses={l_base}")

    state2, opt_g2, opt_d2 = create_vocoder_state(gen_config, disc_config, tc)
    shared = make_shared_fwd_step(gen_config, disc_config, tc, audio, opt_g2, opt_d2)
    ms_sh, l_sh = bench(shared, state2, batch)
    print(f"shared-vjp (one g fwd): {ms_sh:.2f} ms/step  losses={l_sh}")


if __name__ == "__main__":
    main()
