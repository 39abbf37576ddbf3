"""HiFiGAN vocoder training (models/hifigan_discriminators.py,
training/vocoder.py): beyond-reference — the torch stack trains its vocoder
in a separate repo; here spec-to-wav trains in-framework on TPU."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastspeech2_lightning_tpu.models.hifigan import HiFiGANConfig
from fastspeech2_lightning_tpu.models.hifigan_discriminators import (
    DiscriminatorConfig,
    _init_wn_conv,
    _wn_weight,
    count_params,
    discriminator_forward,
    init_discriminators,
)
from fastspeech2_lightning_tpu.training.vocoder import (
    VocoderTrainingConfig,
    create_vocoder_state,
    make_vocoder_train_step,
)

TINY_DISC = DiscriminatorConfig(
    periods=(2, 3),
    mpd_channels=(4, 8),
    msd_channels=(8, 8, 16),
    msd_groups=(1, 4, 4),
    msd_strides=(1, 2, 2),
    msd_kernels=(15, 41, 41),
    n_scales=2,
)

TINY_GEN = HiFiGANConfig(
    upsample_rates=(8, 8, 2, 2),
    upsample_kernel_sizes=(16, 16, 4, 4),
    upsample_initial_channel=16,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
    n_mels=20,
)


class _Audio:
    input_sampling_rate = 22050
    output_sampling_rate = 22050
    n_fft = 1024
    fft_window_size = 1024
    fft_hop_size = 256
    n_mels = 20
    f_min = 0.0
    f_max = 8000.0
    spec_type = "mel-librosa"


def test_weight_norm_parameterization():
    """w = g * v/||v|| with per-output-channel norm; at init w == v
    (torch weight_norm init semantics)."""
    p = _init_wn_conv(jax.random.PRNGKey(0), (5, 3, 8))
    w = _wn_weight(p)
    np.testing.assert_allclose(np.asarray(w), np.asarray(p["v"]), rtol=1e-5)
    # scaling g by 2 scales w by 2 without touching the direction
    p2 = dict(p, g=p["g"] * 2.0)
    np.testing.assert_allclose(
        np.asarray(_wn_weight(p2)), 2 * np.asarray(w), rtol=1e-5
    )


def test_discriminator_shapes_and_feature_maps():
    params = init_discriminators(0, TINY_DISC)
    wav = jnp.asarray(np.random.default_rng(0).normal(size=(2, 2048)), jnp.float32)
    scores, feats = discriminator_forward(params, wav, TINY_DISC)
    # 2 periods + 2 scales
    assert len(scores) == 4 and len(feats) == 4
    for s in scores:
        assert s.shape[0] == 2 and s.ndim == 2
    # each sub-discriminator exposes one feature map per conv + post
    assert len(feats[0]) == len(TINY_DISC.mpd_channels) + 1
    assert len(feats[2]) == len(TINY_DISC.msd_channels) + 1
    assert count_params(params) > 0


@pytest.mark.slow
def test_vocoder_train_step_learns():
    """A jitted D+G step runs, losses are finite, both sides update, and
    the mel-L1 term drops when overfitting one fixed crop."""
    tc = VocoderTrainingConfig(
        batch_size=2, frames_per_crop=8, learning_rate=2e-4, seed=0
    )
    state, opt_g, opt_d = create_vocoder_state(TINY_GEN, TINY_DISC, tc)
    step_fn = make_vocoder_train_step(
        TINY_GEN, TINY_DISC, tc, _Audio(), opt_g, opt_d
    )
    rng = np.random.default_rng(0)
    t = np.arange(8 * 256) / 22050.0
    wav = np.stack(
        [0.3 * np.sin(2 * np.pi * f * t) for f in (220.0, 330.0)]
    ).astype(np.float32)
    from fastspeech2_lightning_tpu.preprocessing.features import (
        mel_spectrogram_numpy,
    )

    mel = np.stack(
        [
            mel_spectrogram_numpy(
                w, 22050, 1024, 256, 1024, 20, 0.0, 8000.0
            ).T[:8]
            for w in wav
        ]
    ).astype(np.float32)
    batch = {"mel": mel, "wav": wav}

    g0 = jax.device_get(state["gen"])
    first = None
    for i in range(30):
        state, losses = step_fn(state, dict(batch))
        host = {k: float(v) for k, v in losses.items()}
        assert all(np.isfinite(v) for v in host.values()), host
        if first is None:
            first = host
    g1 = jax.device_get(state["gen"])
    # both parameter sets moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), g0, g1
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0
    assert int(jax.device_get(state["step"])) == 30
    assert host["mel_l1"] < first["mel_l1"], (first, host)


def test_train_vocoder_end_to_end(tmp_path):
    """CLI-level: preprocess a tiny corpus, train the vocoder a few steps,
    then load vocoder.npz through the standard serving path and vocode."""
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from helpers import make_training_workspace

    from fastspeech2_lightning_tpu.models.hifigan import (
        load_vocoder_checkpoint,
    )
    from fastspeech2_lightning_tpu.training.vocoder import train_vocoder

    cfg = make_training_workspace(tmp_path)
    state = train_vocoder(
        cfg,
        train_config=VocoderTrainingConfig(
            batch_size=2, frames_per_crop=8, ckpt_steps=100, seed=0
        ),
        gen_config=TINY_GEN,
        disc_config=TINY_DISC,
        max_steps=2,
    )
    assert int(jax.device_get(state["step"])) == 2
    npz = Path(cfg.training.logger.save_dir) / "vocoder" / "checkpoints" / "vocoder.npz"
    assert npz.exists()
    voc, step, hop = load_vocoder_checkpoint(npz)
    assert step == 2 and hop == 256
    mel = np.zeros((1, 16, 20), np.float32)
    wav, sr = voc(mel)
    assert np.asarray(wav).shape == (1, 16 * 256) and sr == 22050

    # resume restores the step counter and optimizer state structure
    state2 = train_vocoder(
        cfg,
        train_config=VocoderTrainingConfig(
            batch_size=2, frames_per_crop=8, ckpt_steps=100, seed=0
        ),
        gen_config=TINY_GEN,
        disc_config=TINY_DISC,
        max_steps=3,
        resume=True,
    )
    assert int(jax.device_get(state2["step"])) == 3


def test_generator_hop_mismatch_raises(tmp_path):
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from helpers import make_training_workspace

    from fastspeech2_lightning_tpu.training.vocoder import train_vocoder

    cfg = make_training_workspace(tmp_path)
    bad = HiFiGANConfig(
        upsample_rates=(8, 8, 2),
        upsample_kernel_sizes=(16, 16, 4),
        upsample_initial_channel=16,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
        n_mels=20,
    )
    with pytest.raises(ValueError, match="upsampling"):
        train_vocoder(cfg, gen_config=bad, max_steps=1)


def test_vocoder_step_data_parallel_matches_single():
    """The D+G step on a 2-wide data mesh matches single-device losses for
    the same total batch (GSPMD gradient all-reduce; step is noise-free so
    the comparison is direct)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fastspeech2_lightning_tpu.parallel.mesh import make_mesh, shard_batch

    tc = VocoderTrainingConfig(batch_size=2, frames_per_crop=8, seed=0)
    rng = np.random.default_rng(1)
    t = np.arange(8 * 256) / 22050.0
    wav = np.stack(
        [0.3 * np.sin(2 * np.pi * f * t) for f in (220.0, 330.0)]
    ).astype(np.float32)
    from fastspeech2_lightning_tpu.preprocessing.features import (
        mel_spectrogram_numpy,
    )

    mel = np.stack(
        [
            mel_spectrogram_numpy(w, 22050, 1024, 256, 1024, 20, 0.0, 8000.0).T[:8]
            for w in wav
        ]
    ).astype(np.float32)
    batch = {"mel": mel, "wav": wav}

    def run(mesh):
        state, opt_g, opt_d = create_vocoder_state(TINY_GEN, TINY_DISC, tc)
        if mesh is not None:
            state = jax.device_put(state, NamedSharding(mesh, P()))
        step_fn = make_vocoder_train_step(
            TINY_GEN, TINY_DISC, tc, _Audio(), opt_g, opt_d
        )
        out = dict(batch)
        if mesh is not None:
            out = shard_batch(out, mesh)
        losses = None
        for _ in range(2):
            state, losses = step_fn(state, dict(out))
        return {k: float(v) for k, v in losses.items()}

    single = run(None)
    dp = run(make_mesh(n_devices=2, model_parallel=1))
    for k in single:
        np.testing.assert_allclose(dp[k], single[k], rtol=2e-4, atol=2e-5)


def test_vocoder_finetune_from_and_predicted_mels(tmp_path):
    """--finetune-from seeds the generator with checkpoint weights;
    --finetune-mels reads teacher-forced synthesized specs instead of
    ground-truth artifacts."""
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from helpers import make_training_workspace

    from fastspeech2_lightning_tpu.testing import get_stubbed_vocoder
    from fastspeech2_lightning_tpu.training.vocoder import (
        VocoderCropLoader,
        train_vocoder,
    )
    from fastspeech2_lightning_tpu.utils import load_filelist, truncate_basename

    cfg = make_training_workspace(tmp_path)
    _voc, voc_path = get_stubbed_vocoder(tmp_path)  # n_mels=20 matches cfg

    # --finetune-from: the generator starts from the checkpoint's params
    from fastspeech2_lightning_tpu.models.hifigan import load_vocoder_params

    ft_params, ft_cfg, _ = load_vocoder_params(voc_path)
    state = train_vocoder(
        cfg,
        train_config=VocoderTrainingConfig(
            batch_size=2, frames_per_crop=8, ckpt_steps=100, seed=0,
            learning_rate=0.0,  # freeze: end state == checkpoint
        ),
        disc_config=TINY_DISC,
        max_steps=1,
        resume=False,
        finetune_from=voc_path,
        log_dir=tmp_path / "voclogs",
    )
    got = jax.device_get(state["gen"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-7
        ),
        got, jax.device_get(jax.tree_util.tree_map(jnp.asarray, ft_params)),
    )

    # --finetune-mels: loader picks synthesized_spec files
    a = cfg.preprocessing.audio
    mel_dir = tmp_path / "synth_out" / "synthesized_spec"
    mel_dir.mkdir(parents=True)
    rows = load_filelist(Path(cfg.training.training_filelist))
    from fastspeech2_lightning_tpu.utils import slugify

    for r in rows:
        # the REAL writer naming: slugified utterance text (reference
        # parity, fs2/prediction_writing_callback.py:270) — NOT the
        # filelist basename (regression: the loader used to expect the
        # basename and found zero files from the documented pipeline)
        text = r.get("characters") or r.get("text") or ""
        name = "--".join([
            truncate_basename(slugify(text)),
            r.get("speaker") or "default",
            r.get("language") or "default",
            f"spec-pred-{a.input_sampling_rate}-{a.spec_type}.npy",
        ])
        np.save(mel_dir / name, np.zeros((a.n_mels, 40), np.float32))
    tc = VocoderTrainingConfig(batch_size=2, frames_per_crop=8, seed=0)
    loader = VocoderCropLoader(
        cfg, tc, finetune_mel_dir=tmp_path / "synth_out"
    )
    assert len(loader.items) == len(rows)
    assert all("synthesized_spec" in str(p[1]) for p in loader.items)
    batch = loader.next_batch()
    assert batch["mel"].shape == (2, 8, a.n_mels)
    # the all-zero predicted mels flow through (not the ground-truth specs)
    assert np.all(batch["mel"] == 0.0)


def test_evaluate_vocoder(tmp_path):
    """evaluate-vocoder scores copy-synthesis on validation artifacts."""
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from helpers import make_training_workspace

    from fastspeech2_lightning_tpu.evaluation import evaluate_vocoder
    from fastspeech2_lightning_tpu.testing import get_stubbed_vocoder

    cfg = make_training_workspace(tmp_path)
    _voc, voc_path = get_stubbed_vocoder(tmp_path)
    report = evaluate_vocoder(cfg, voc_path, n_utterances=1)
    assert report["n"] == 1
    for key in ("mel_l1", "si_sdr_db", "stoi", "pesq_proxy"):
        assert np.isfinite(report[key]), report
    # a random-weight vocoder reconstructs nothing: SI-SDR deeply negative
    assert report["si_sdr_db"] < 0


def test_vocoder_step_mixed_precision():
    """compute_dtype="bfloat16" (the TPU default) keeps params, losses, and
    optimizer state in float32, produces finite losses close to the f32
    step, and updates both sides."""
    import dataclasses

    rng = np.random.default_rng(3)
    t = np.arange(8 * 256) / 22050.0
    wav = np.stack(
        [0.3 * np.sin(2 * np.pi * f * t) for f in (220.0, 330.0)]
    ).astype(np.float32)
    from fastspeech2_lightning_tpu.preprocessing.features import (
        mel_spectrogram_numpy,
    )

    mel = np.stack(
        [
            mel_spectrogram_numpy(
                w, 22050, 1024, 256, 1024, 20, 0.0, 8000.0
            ).T[:8]
            for w in wav
        ]
    ).astype(np.float32)
    batch = {"mel": mel, "wav": wav}

    def one_step(dtype):
        tc = VocoderTrainingConfig(
            batch_size=2, frames_per_crop=8, seed=0, compute_dtype=dtype
        )
        state, opt_g, opt_d = create_vocoder_state(TINY_GEN, TINY_DISC, tc)
        step_fn = make_vocoder_train_step(
            TINY_GEN, TINY_DISC, tc, _Audio(), opt_g, opt_d
        )
        state, losses = step_fn(state, dict(batch))
        return state, {k: float(v) for k, v in losses.items()}

    s_bf, l_bf = one_step("bfloat16")
    s_f32, l_f32 = one_step("float32")
    for k, v in l_bf.items():
        assert np.isfinite(v), (k, v)
    # params and optimizer state stay f32 under mixed precision
    for leaf in jax.tree_util.tree_leaves(s_bf["gen"]) + jax.tree_util.tree_leaves(
        s_bf["g_opt"]
    ):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
    # the two precisions see the same optimization problem: losses agree to
    # bf16-forward tolerance
    for k in ("d", "g", "mel_l1"):
        assert abs(l_bf[k] - l_f32[k]) <= 0.1 * max(1.0, abs(l_f32[k])), (
            k, l_bf[k], l_f32[k],
        )


def test_msd_phase_packed_exact():
    """The phase-packed grouped-conv execution strategy is bit-level
    equivalent (to f32 conv tolerance) to the plain grouped conv on every
    HiFiGAN-V1 MSD geometry, and the full discriminator forward matches
    with the flag on/off."""
    import dataclasses

    from fastspeech2_lightning_tpu.models.hifigan_discriminators import (
        _phase_packed_grouped_conv,
    )

    rng = np.random.default_rng(0)
    for (T, C, cout, k, s, g) in [
        (1024, 128, 128, 41, 2, 4),
        (512, 128, 256, 41, 2, 16),
        (256, 256, 512, 41, 4, 16),
        (128, 512, 1024, 41, 4, 16),
        (64, 1024, 1024, 41, 1, 16),
    ]:
        x = jnp.asarray(rng.standard_normal((2, T, C)).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal((k, C // g, cout)).astype(np.float32) * 0.05
        )
        pad = (k - 1) // 2
        want = jax.lax.conv_general_dilated(
            x, w, (s,), [(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=g,
        )
        got = _phase_packed_grouped_conv(x, w, s, g)
        assert got is not None and got.shape == want.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    # full MSD forward: flag on == flag off
    cfg_on = dataclasses.replace(TINY_DISC, msd_phase_packed=True)
    cfg_off = dataclasses.replace(TINY_DISC, msd_phase_packed=False)
    params = init_discriminators(0, cfg_on)["msd"]
    wav = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 2048)), jnp.float32
    )
    from fastspeech2_lightning_tpu.models.hifigan_discriminators import (
        msd_forward as _msd,
    )

    s_on, f_on = _msd(params, wav, cfg_on)
    s_off, f_off = _msd(params, wav, cfg_off)
    for a, b in zip(s_on, s_off):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )


def test_msd_block_diag_exact():
    """The block-diagonal dense execution strategy for small-group grouped
    convs (the odd-T MSD scales where phase-packing declines) equals the
    plain grouped conv: the scattered kernel's off-diagonal blocks are
    exact zeros, so only f32 summation order differs."""
    from fastspeech2_lightning_tpu.models.hifigan_discriminators import (
        _block_diag_grouped_conv,
    )

    rng = np.random.default_rng(0)
    for (T, C, cout, k, s, g, m) in [
        (1025, 128, 128, 41, 2, 4, 1),  # the scale-2/3 geometry it serves
        (513, 128, 128, 41, 2, 2, 1),
        (255, 64, 128, 15, 1, 4, 1),
        # macro form: fgc=m, block-diag within each macro group
        (1025, 128, 256, 41, 2, 16, 2),  # MSD L2 odd-scale geometry
        (513, 256, 512, 41, 4, 16, 4),  # MSD L3
        (129, 512, 1024, 41, 4, 16, 8),  # MSD L4
        (65, 1024, 1024, 41, 1, 16, 8),  # MSD L5
    ]:
        x = jnp.asarray(rng.standard_normal((2, T, C)).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal((k, C // g, cout)).astype(np.float32) * 0.05
        )
        pad = (k - 1) // 2
        want = jax.lax.conv_general_dilated(
            x, w, (s,), [(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=g,
        )
        got = _block_diag_grouped_conv(x, w, s, g, m)
        assert got.shape == want.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )
