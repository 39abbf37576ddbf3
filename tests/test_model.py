"""FastSpeech2 model forward/loss tests on tiny shapes (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastspeech2_lightning_tpu.models import FastSpeech2
from fastspeech2_lightning_tpu.training.loss import compute_loss

from helpers import synthetic_batch, tiny_config, tiny_stats

N_SYMBOLS = 30


def build(learn_alignment=True, **overrides):
    cfg = tiny_config(learn_alignment=learn_alignment, **overrides)
    model = FastSpeech2(
        config=cfg, stats=tiny_stats(), n_symbols=N_SYMBOLS, n_speakers=2, n_languages=2
    )
    return cfg, model


def init_and_apply(model, batch, **kwargs):
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, batch, deterministic=True)
    out = jax.jit(
        lambda v, b: model.apply(v, b, deterministic=True, **kwargs)
    )(variables, batch)
    return variables, out


def test_forward_training_learned_alignment():
    rng = np.random.default_rng(0)
    cfg, model = build(learn_alignment=True)
    batch = synthetic_batch(rng, learn_alignment=True)
    _, out = init_and_apply(model, batch)
    B, T, L = 2, 48, 12
    assert out["output"].shape == (B, T, cfg.preprocessing.audio.n_mels)
    assert out["postnet_output"].shape == (B, T, cfg.preprocessing.audio.n_mels)
    assert out["attn_soft"].shape == (B, T, L)
    assert out["attn_hard"].shape == (B, T, L)
    # MAS invariant: durations sum to mel lengths (fs2/variance_adaptor.py:289-305)
    np.testing.assert_array_equal(
        np.asarray(out["duration_target"]).sum(axis=1), batch["mel_lens"]
    )
    assert np.isfinite(np.asarray(out["output"])).all()


def test_forward_training_oracle_durations():
    rng = np.random.default_rng(1)
    cfg, model = build(learn_alignment=False)
    batch = synthetic_batch(rng, learn_alignment=False)
    _, out = init_and_apply(model, batch)
    assert out["attn_soft"] is None
    np.testing.assert_array_equal(
        np.asarray(out["duration_target"]), batch["duration"]
    )
    assert np.isfinite(np.asarray(out["output"])).all()


def test_forward_inference_static_shapes():
    rng = np.random.default_rng(2)
    cfg, model = build(learn_alignment=True)
    train_batch = synthetic_batch(rng, learn_alignment=True)
    variables = FastSpeech2(
        config=cfg, stats=tiny_stats(), n_symbols=N_SYMBOLS, n_speakers=2, n_languages=2
    ).init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}, train_batch)

    inf_batch = synthetic_batch(rng, learn_alignment=True, inference=True)
    out = model.apply(
        variables, inf_batch, inference=True, deterministic=True, max_target_len=64
    )
    assert out["output"].shape == (2, 64, cfg.preprocessing.audio.n_mels)
    mel_lens = np.asarray(out["tgt_lens"])
    tgt_mask = np.asarray(out["tgt_mask"])
    assert (mel_lens >= 0).all() and (mel_lens <= 64).all()
    for b in range(2):
        assert tgt_mask[b, : mel_lens[b]].all()
        assert not tgt_mask[b, mel_lens[b]:].any()
    # predicted durations drive lengths
    np.testing.assert_array_equal(
        np.minimum(np.asarray(out["duration_rounded"]).sum(axis=1), 64), mel_lens
    )


def test_loss_finite_and_all_keys():
    rng = np.random.default_rng(3)
    cfg, model = build(learn_alignment=True)
    batch = synthetic_batch(rng, learn_alignment=True)
    _, out = init_and_apply(model, batch)
    losses = compute_loss(cfg, out, batch, current_epoch=1)
    expected = {"pitch", "energy", "duration", "spec", "postnet", "attn_ctc", "attn_bin", "total"}
    assert set(losses) == expected
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    total = sum(float(v) for k, v in losses.items() if k != "total")
    np.testing.assert_allclose(float(losses["total"]), total, rtol=1e-5)


def test_loss_oracle_duration_keys():
    rng = np.random.default_rng(4)
    cfg, model = build(learn_alignment=False)
    batch = synthetic_batch(rng, learn_alignment=False)
    _, out = init_and_apply(model, batch)
    losses = compute_loss(cfg, out, batch, current_epoch=0)
    assert "attn_ctc" not in losses and "attn_bin" not in losses
    assert np.isfinite(float(losses["total"]))


def test_multispeaker_multilingual_and_gst():
    rng = np.random.default_rng(5)
    cfg, model = build(
        learn_alignment=True,
        multispeaker=True,
        multilingual=True,
        use_global_style_token_module=True,
    )
    batch = synthetic_batch(rng, learn_alignment=True)
    batch["speaker_id"] = np.array([0, 1], dtype=np.int32)
    batch["language_id"] = np.array([1, 0], dtype=np.int32)
    variables, out = init_and_apply(model, batch)
    assert "gst" in variables["params"]
    assert "speaker_embedding" in variables["params"]
    assert np.isfinite(np.asarray(out["output"])).all()


@pytest.mark.slow
def test_grad_flows():
    rng = np.random.default_rng(6)
    cfg, model = build(learn_alignment=True)
    batch = synthetic_batch(rng, learn_alignment=True)
    variables, _ = init_and_apply(model, batch)

    def loss_fn(params):
        out = model.apply(
            {**variables, "params": params}, batch, deterministic=True
        )
        return compute_loss(cfg, out, batch, current_epoch=1)["total"]

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # encoder gets gradient signal
    gnorm = sum(float(jnp.sum(g * g)) for g in flat)
    assert gnorm > 0


def test_frame_level_variances():
    rng = np.random.default_rng(7)
    cfg, model = build(learn_alignment=True)
    cfg.model.variance_predictors.pitch.level = "frame"
    cfg.model.variance_predictors.energy.level = "frame"
    model = FastSpeech2(
        config=cfg, stats=model.stats, n_symbols=N_SYMBOLS, n_speakers=2, n_languages=2
    )
    batch = synthetic_batch(rng, learn_alignment=True)
    _, out = init_and_apply(model, batch)
    # frame-level predictions span mel frames
    assert out["pitch_prediction"].shape == (2, 48)
    assert out["energy_prediction"].shape == (2, 48)
    losses = compute_loss(cfg, out, batch, 1)
    assert np.isfinite(float(losses["total"]))


def test_pfs_input_path():
    from fastspeech2_lightning_tpu.text.features import N_PHONOLOGICAL_FEATURES

    rng = np.random.default_rng(8)
    cfg, _ = build(
        learn_alignment=True,
        target_text_representation_level="phonological_features",
    )
    model = FastSpeech2(
        config=cfg, stats=tiny_stats(), n_symbols=N_SYMBOLS, n_speakers=1, n_languages=1
    )
    batch = synthetic_batch(rng, learn_alignment=True)
    B, L = batch["text"].shape
    batch["pfs"] = rng.standard_normal((B, L, N_PHONOLOGICAL_FEATURES)).astype(
        np.float32
    )
    variables, out = init_and_apply(model, batch)
    # bias-free linear input layer (fs2/model.py:77-81)
    til = variables["params"]["text_input_layer"]
    assert "kernel" in til and "bias" not in til
    assert np.isfinite(np.asarray(out["output"])).all()


def test_teacher_forcing_inference():
    rng = np.random.default_rng(9)
    cfg, model = build(learn_alignment=True)
    batch = synthetic_batch(rng, learn_alignment=True)
    variables, _ = init_and_apply(model, batch)
    out = model.apply(
        variables, batch, inference=True, teacher_forcing=True, deterministic=True
    )
    # teacher forcing pins output length to the target mel length
    assert out["output"].shape[1] == batch["mel"].shape[1]
    np.testing.assert_array_equal(np.asarray(out["tgt_lens"]), batch["mel_lens"])


def test_duration_control_scales_length():
    rng = np.random.default_rng(10)
    cfg, model = build(learn_alignment=True)
    train_batch = synthetic_batch(rng, learn_alignment=True)
    variables, _ = init_and_apply(model, train_batch)
    inf_batch = synthetic_batch(rng, learn_alignment=True, inference=True)

    def run(mult):
        control = {
            "pitch": jnp.float32(1.0),
            "energy": jnp.float32(1.0),
            "duration": jnp.float32(mult),
        }
        out = model.apply(
            variables, inf_batch, control=control, inference=True,
            deterministic=True, max_target_len=64,
        )
        return np.asarray(out["duration_rounded"]).sum()

    slow = run(2.0)
    fast = run(0.5)
    assert slow >= fast


def test_gst_style_reference_inference():
    """Style-reference conditioning at inference (fs2/model.py:196-198)."""
    rng = np.random.default_rng(11)
    cfg, model = build(learn_alignment=True, use_global_style_token_module=True)
    train_batch = synthetic_batch(rng, learn_alignment=True)
    variables, _ = init_and_apply(model, train_batch)

    inf_batch = synthetic_batch(rng, learn_alignment=True, inference=True)
    inf_batch["mel_style_reference"] = rng.standard_normal((2, 40, 20)).astype(
        np.float32
    )
    out_ref = model.apply(
        variables, inf_batch, inference=True, deterministic=True, max_target_len=64
    )
    # without a reference, conditioning falls back to GST token 0
    inf_batch2 = {k: v for k, v in inf_batch.items() if k != "mel_style_reference"}
    out_tok = model.apply(
        variables, inf_batch2, inference=True, deterministic=True, max_target_len=64
    )
    assert np.isfinite(np.asarray(out_ref["output"])).all()
    assert np.isfinite(np.asarray(out_tok["output"])).all()
    # the two conditioning paths produce different outputs
    assert not np.allclose(
        np.asarray(out_ref["output"]), np.asarray(out_tok["output"])
    )


def test_style_reference_with_teacher_forcing():
    """Style-reference conditioning composes with teacher forcing: the GST
    conditions on the reference mel while the target mel pins durations
    (fs2/model.py:162-203 — both paths are active in the same forward)."""
    rng = np.random.default_rng(12)
    cfg, model = build(learn_alignment=True, use_global_style_token_module=True)
    batch = synthetic_batch(rng, learn_alignment=True)
    variables, _ = init_and_apply(model, batch)

    tf_batch = dict(batch)
    tf_batch["mel_style_reference"] = rng.standard_normal((2, 40, 20)).astype(
        np.float32
    )
    out = model.apply(
        variables, tf_batch, inference=True, teacher_forcing=True,
        deterministic=True,
    )
    # teacher forcing still pins the output length to the target mel length
    assert out["output"].shape[1] == batch["mel"].shape[1]
    np.testing.assert_array_equal(np.asarray(out["tgt_lens"]), batch["mel_lens"])
    # and the style reference changes the output vs GST-token fallback
    out_tok = model.apply(
        variables, batch, inference=True, teacher_forcing=True,
        deterministic=True,
    )
    assert np.isfinite(np.asarray(out["output"])).all()
    assert not np.allclose(
        np.asarray(out["output"]), np.asarray(out_tok["output"])
    )
