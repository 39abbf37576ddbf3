"""Training correctness: Noam schedule parity, gradient clipping, and an
overfit smoke test (loss must drop substantially on a fixed tiny batch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastspeech2_lightning_tpu.models import FastSpeech2
from fastspeech2_lightning_tpu.training.state import (
    create_train_state,
    noam_schedule,
)
from fastspeech2_lightning_tpu.training.step import make_train_step

from helpers import synthetic_batch, tiny_config, tiny_stats


def test_noam_schedule_matches_reference_formula():
    # fs2/noam.py:20-26: scale = warmup^0.5 * min(step^-0.5, step*warmup^-1.5)
    sched = noam_schedule(base_lr=1e-3, warmup_steps=100)
    for step in [1, 10, 100, 1000]:
        expected = 1e-3 * (100**0.5) * min(step**-0.5, step * 100**-1.5)
        np.testing.assert_allclose(
            float(sched(jnp.int32(step))), expected, rtol=1e-6
        )
    # step 0 is clamped to 1 (protect against 0^-0.5)
    np.testing.assert_allclose(
        float(sched(jnp.int32(0))), float(sched(jnp.int32(1)))
    )
    # warmup peak at step == warmup_steps
    peak = float(sched(jnp.int32(100)))
    assert peak > float(sched(jnp.int32(50)))
    assert peak > float(sched(jnp.int32(500)))


@pytest.mark.slow
def test_overfit_tiny_batch():
    cfg = tiny_config(learn_alignment=True)
    cfg.training.optimizer.learning_rate = 1e-2
    cfg.training.optimizer.warmup_steps = 20
    model = FastSpeech2(
        config=cfg, stats=tiny_stats(), n_symbols=30, n_speakers=1, n_languages=1
    )
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, B=2, L=8, T=32)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
    train_step = make_train_step(cfg, model)
    key = jax.random.PRNGKey(0)

    first = None
    for i in range(80):
        state, losses = train_step(state, batch, key, 0)
        if i == 4:
            first = float(losses["spec"] + losses["postnet"])
    last = float(losses["spec"] + losses["postnet"])
    assert np.isfinite(last)
    assert last < 0.5 * first, (first, last)


def test_fused_optimizer_matches_per_leaf_chain():
    """training/fused_optim.py vs optax.chain(clip_by_global_norm, adamw):
    identical params after several steps (same grads, same schedule, clip
    both triggered and untriggered, weight decay on)."""
    from fastspeech2_lightning_tpu.training.state import make_optimizer
    from helpers import tiny_config as _tc

    cfg = _tc()
    cfg.training.optimizer.weight_decay = 0.01
    rngs = jax.random.split(jax.random.PRNGKey(7), 8)
    params = {
        "a": {"kernel": jax.random.normal(rngs[0], (5, 3)),
              "bias": jnp.zeros((3,))},
        "b": {"w": jax.random.normal(rngs[1], (4,)) * 10.0},
    }
    tx_leaf = make_optimizer(cfg, fused=False)
    tx_fused = make_optimizer(cfg, fused=True)
    s_leaf = tx_leaf.init(params)
    s_fused = tx_fused.init(params)
    p_leaf = params
    p_fused = jax.tree_util.tree_map(jnp.array, params)
    import optax

    for i in range(4):
        scale = 100.0 if i % 2 == 0 else 1e-3  # clip on / off
        grads = jax.tree_util.tree_map(
            lambda p: jnp.full_like(
                p, scale * (0.1 + 0.01 * i)
            ) * jnp.sign(p + 0.1),
            p_leaf,
        )
        u1, s_leaf = tx_leaf.update(grads, s_leaf, p_leaf)
        p_leaf = optax.apply_updates(p_leaf, u1)
        u2, s_fused = tx_fused.update(grads, s_fused, p_fused)
        p_fused = optax.apply_updates(p_fused, u2)
    for l1, l2 in zip(
        jax.tree_util.tree_leaves(p_leaf), jax.tree_util.tree_leaves(p_fused)
    ):
        np.testing.assert_allclose(
            np.asarray(l1), np.asarray(l2), rtol=1e-6, atol=1e-7
        )


def test_fused_train_step_matches_per_leaf_step():
    """Full train step: fused and per-leaf optimizers produce the same
    updated model params (shared dropout key, same batch)."""
    cfg = tiny_config(learn_alignment=False)
    model = FastSpeech2(
        config=cfg, stats=tiny_stats(), n_symbols=30, n_speakers=1,
        n_languages=1,
    )
    rng = np.random.default_rng(3)
    batch = synthetic_batch(rng, B=2, L=8, T=32, learn_alignment=False)
    ts = make_train_step(cfg, model)
    outs = {}
    for fused in (False, True):
        state = create_train_state(
            cfg, model, jax.random.PRNGKey(0), batch, fused=fused
        )
        for _ in range(2):
            state, losses = ts(state, batch, jax.random.PRNGKey(5), 0)
        outs[fused] = (
            [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)],
            float(losses["total"]),
        )
    np.testing.assert_allclose(outs[False][1], outs[True][1], rtol=1e-5)
    for a, b in zip(outs[False][0], outs[True][0]):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)


def test_grad_norm_reported_and_clipped():
    cfg = tiny_config(learn_alignment=False)
    cfg.training.gradient_clip_val = 1e-8  # clip hard: updates ~ 0
    model = FastSpeech2(
        config=cfg, stats=tiny_stats(), n_symbols=30, n_speakers=1, n_languages=1
    )
    rng = np.random.default_rng(1)
    batch = synthetic_batch(rng, B=2, L=8, T=32, learn_alignment=False)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
    # train_step donates the state, so snapshot params to host first
    params_before = [
        np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)
    ]
    train_step = make_train_step(cfg, model)
    state, losses = train_step(state, batch, jax.random.PRNGKey(0), 0)
    assert "grad_norm" in losses and float(losses["grad_norm"]) > 0
    # with near-zero clip, parameters barely move
    params_after = jax.tree_util.tree_leaves(state.params)
    max_delta = max(
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(params_before, params_after)
    )
    assert max_delta < 1e-4


def test_early_stopping_halts_training(tmp_path):
    """Early stopping (implements the reference's config TODO) stops fit()
    when validation loss stalls."""
    import yaml

    from click.testing import CliRunner

    from fastspeech2_lightning_tpu.cli import app
    from fastspeech2_lightning_tpu.preprocessing.pipeline import save_wav
    from fastspeech2_lightning_tpu.utils import write_filelist

    SR = 22050
    wav_dir = tmp_path / "wavs"
    rng = np.random.default_rng(0)
    rows = []
    for i in range(4):
        t = np.arange(int(0.5 * SR)) / SR
        save_wav(
            wav_dir / f"utt{i}.wav",
            (0.4 * np.sin(2 * np.pi * (150 + 30 * i) * t)).astype(np.float32),
            SR,
        )
        rows.append({"basename": f"utt{i}", "characters": "ab cd",
                     "language": "default", "speaker": "default"})
    write_filelist(rows, tmp_path / "filelist.psv")
    config = {
        "model": {
            "encoder": {"layers": 1, "heads": 2, "input_dim": 32,
                        "feedforward_dim": 64, "conv_kernel_size": 3},
            "decoder": {"layers": 1, "heads": 2, "input_dim": 32,
                        "feedforward_dim": 64, "conv_kernel_size": 3},
            "variance_predictors": {
                "energy": {"input_dim": 32, "n_layers": 1, "n_bins": 16},
                "pitch": {"input_dim": 32, "n_layers": 1, "n_bins": 16},
                "duration": {"input_dim": 32, "n_layers": 1, "n_bins": 16}},
            "max_mel_length": 64, "use_postnet": False},
        "preprocessing": {"save_dir": str(tmp_path / "pre"), "train_split": 0.75,
            "audio": {"n_mels": 20},
            "source_data": [{"data_dir": str(wav_dir),
                             "filelist": str(tmp_path / "filelist.psv")}]},
        "text": {"symbols": {"letters": list("abcd")}},
        "training": {"batch_size": 2, "bucket_count": 1,
            "training_filelist": str(tmp_path / "pre" / "training_filelist.psv"),
            "validation_filelist": str(tmp_path / "pre" / "validation_filelist.psv"),
            "logger": {"save_dir": str(tmp_path / "logs")},
            "val_check_interval": 1,
            # lr 0 => validation loss can never improve => stop after patience
            "optimizer": {"warmup_steps": 5, "learning_rate": 0.0},
            "early_stopping": {"metric": "mae", "patience": 2}},
    }
    (tmp_path / "config.yaml").write_text(yaml.safe_dump(config))
    runner = CliRunner()
    assert runner.invoke(
        app, ["preprocess", str(tmp_path / "config.yaml"), "--cpus", "1"]
    ).exit_code == 0

    from fastspeech2_lightning_tpu.config import FastSpeech2Config
    from fastspeech2_lightning_tpu.training.loop import Trainer

    cfg = FastSpeech2Config.load_config_from_path(tmp_path / "config.yaml")
    trainer = Trainer(cfg)
    state = trainer.fit(max_steps=50)
    # params are frozen (lr=0) so the monitored loss stalls — only the
    # batch-norm running statistics drift it briefly — and training must
    # stop well before max_steps
    assert int(state.step) < 40


@pytest.mark.slow
def test_ema_params_follow_update_rule():
    """ema' = d*ema + (1-d)*params' after each optimizer step."""
    cfg = tiny_config(learn_alignment=False)
    cfg.training.ema_decay = 0.5  # large 1-d so drift is visible
    model = FastSpeech2(
        config=cfg, stats=tiny_stats(), n_symbols=30, n_speakers=1, n_languages=1
    )
    rng = np.random.default_rng(2)
    batch = synthetic_batch(rng, B=2, L=8, T=32, learn_alignment=False)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
    assert state.ema_params is not None
    ema0 = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.ema_params)]
    p0 = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]
    for a, b in zip(ema0, p0):
        np.testing.assert_array_equal(a, b)  # initialized to params

    train_step = make_train_step(cfg, model)
    state, _ = train_step(state, batch, jax.random.PRNGKey(0), 0)
    p1 = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]
    ema1 = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.ema_params)]
    for e1, e0, p in zip(ema1, ema0, p1):
        np.testing.assert_allclose(e1, 0.5 * e0 + 0.5 * p, rtol=1e-5, atol=1e-7)


def test_freeze_components_pins_subtree():
    cfg = tiny_config(learn_alignment=False)
    cfg.training.freeze_components = ["encoder"]
    model = FastSpeech2(
        config=cfg, stats=tiny_stats(), n_symbols=30, n_speakers=1, n_languages=1
    )
    rng = np.random.default_rng(3)
    batch = synthetic_batch(rng, B=2, L=8, T=32, learn_alignment=False)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
    frozen_before = jax.device_get(state.params["encoder"])
    thawed_before = jax.device_get(state.params["mel_linear"])
    train_step = make_train_step(cfg, model)
    for _ in range(3):
        state, _ = train_step(state, batch, jax.random.PRNGKey(0), 0)
    frozen_after = jax.device_get(state.params["encoder"])
    thawed_after = jax.device_get(state.params["mel_linear"])
    for a, b in zip(
        jax.tree_util.tree_leaves(frozen_before),
        jax.tree_util.tree_leaves(frozen_after),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    moved = max(
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(
            jax.tree_util.tree_leaves(thawed_before),
            jax.tree_util.tree_leaves(thawed_after),
        )
    )
    assert moved > 0


def test_freeze_components_unknown_name_raises():
    from fastspeech2_lightning_tpu.training.state import freeze_mask

    with pytest.raises(ValueError, match="not found"):
        freeze_mask({"encoder": {"w": np.zeros(2)}}, ["enc0der"])


def test_zero_weight_fill_matches_real_batch_loss():
    """A batch padded with zero-sample_weight filler rows must produce the
    SAME loss as the batch of only the real rows (the reference's drop_last /
    smaller-final-batch gradient semantics at a static shape)."""
    from fastspeech2_lightning_tpu.training.step import make_eval_step

    cfg = tiny_config(learn_alignment=True)
    model = FastSpeech2(
        config=cfg, stats=tiny_stats(), n_symbols=30, n_speakers=1, n_languages=1
    )
    rng = np.random.default_rng(3)
    batch = synthetic_batch(rng, B=2, L=8, T=32)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
    eval_step = make_eval_step(cfg, model)

    real = dict(batch)
    real["sample_weight"] = np.ones(2, dtype=np.float32)
    losses_real, _ = eval_step(state, real, 1)

    # duplicate row 0 twice as filler with weight 0
    filled = {}
    for k, v in batch.items():
        if v is None:
            filled[k] = None
        elif hasattr(v, "shape") and v.ndim >= 1 and v.shape[0] == 2:
            filled[k] = np.concatenate([v, v[:1], v[:1]], axis=0)
        else:
            filled[k] = v
    filled["sample_weight"] = np.array([1, 1, 0, 0], dtype=np.float32)
    losses_filled, _ = eval_step(state, filled, 1)

    for k in losses_real:
        np.testing.assert_allclose(
            float(losses_real[k]), float(losses_filled[k]), rtol=2e-5,
            err_msg=f"loss {k} changed under zero-weight fill",
        )


def test_train_step_with_rbg_prng_key():
    """training.prng_impl='unsafe_rbg' (the default: TPU hardware RNG for
    dropout masks, 72.4 -> 42.6 ms/step measured) must run the jitted step
    with a typed rbg key: finite losses, deterministic per seed."""
    cfg = tiny_config(learn_alignment=False)
    assert cfg.training.prng_impl == "unsafe_rbg"
    model = FastSpeech2(
        config=cfg, stats=tiny_stats(), n_symbols=30, n_speakers=1, n_languages=1
    )
    rng = np.random.default_rng(5)
    batch = synthetic_batch(rng, B=2, L=8, T=32, learn_alignment=False)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
    ts = make_train_step(cfg, model)
    key = jax.random.key(3, impl="unsafe_rbg")
    s1, losses1 = ts(state, batch, key, 0)
    assert np.isfinite(float(losses1["total"]))
    state2 = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
    _, losses2 = ts(state2, batch, jax.random.key(3, impl="unsafe_rbg"), 0)
    np.testing.assert_allclose(
        float(losses1["total"]), float(losses2["total"]), rtol=1e-6
    )


def test_non_finite_loss_guard():
    """training.halt_on_non_finite raises TrainingDivergedError instead of
    optimizing on NaNs for the rest of the run (failure detection §5.3)."""
    import pytest

    from fastspeech2_lightning_tpu.exceptions import TrainingDivergedError
    from fastspeech2_lightning_tpu.training.loop import _guard_finite_losses

    _guard_finite_losses({"total": 1.25, "spec": 0.5}, 50, enabled=True)
    _guard_finite_losses({"total": float("nan")}, 50, enabled=False)
    with pytest.raises(TrainingDivergedError, match="step 100"):
        _guard_finite_losses({"total": float("nan")}, 100, enabled=True)
    with pytest.raises(TrainingDivergedError):
        _guard_finite_losses({"total": float("inf")}, 150, enabled=True)


def test_async_checkpoint_matches_sync(tmp_path):
    """training.async_checkpoint writes the same checkpoint (params exact:
    the on-device snapshot is taken before any further update) and resume /
    load works; background failures surface on the next save/wait."""
    from helpers import make_training_workspace

    from fastspeech2_lightning_tpu.training.checkpoint import (
        AsyncCheckpointWriter,
        CheckpointError,
        latest_checkpoint,
        load_checkpoint,
    )
    from fastspeech2_lightning_tpu.training.loop import Trainer

    cfg = make_training_workspace(
        tmp_path, val_check_interval=2, async_checkpoint=True,
    )
    trainer = Trainer(cfg)
    state = trainer.fit(max_steps=3)
    ckpt = latest_checkpoint(trainer.ckpt_dir)
    assert ckpt is not None
    meta, arrays = load_checkpoint(ckpt)
    final = jax.device_get(state.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        final, arrays["params"],
    )
    assert meta["global_step"] == int(state.step)

    # a failing background save surfaces as CheckpointError on wait()
    w = AsyncCheckpointWriter()
    w.save(
        tmp_path / "nope", state, cfg, None, {}, {}, ["a"],
    )
    # /nope parent exists so the failure must come from something real:
    # poison the config to make model_checkpoint_dump raise
    w.wait()  # first save may legitimately succeed; force a real failure

    class Boom:
        def model_checkpoint_dump(self):
            raise RuntimeError("boom")

    w.save(tmp_path / "nope2", state, Boom(), None, {}, {}, ["a"])
    with pytest.raises(CheckpointError, match="boom"):
        w.wait()


def test_multi_train_step_matches_sequential():
    """make_multi_train_step(k) — one lax.scan dispatch — produces the same
    final params, step count, and per-step losses as k sequential
    make_train_step dispatches (the per-step dropout stream folds on
    state.step either way)."""
    from fastspeech2_lightning_tpu.training.step import make_multi_train_step

    cfg = tiny_config(learn_alignment=True)
    model = FastSpeech2(
        config=cfg, stats=tiny_stats(), n_symbols=30, n_speakers=1,
        n_languages=1,
    )
    batches = [
        synthetic_batch(np.random.default_rng(i), B=2, L=8, T=32)
        for i in range(3)
    ]
    key = jax.random.PRNGKey(5)
    ts = make_train_step(cfg, model)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batches[0])
    seq = []
    for b in batches:
        state, losses = ts(state, b, key, 0)
        seq.append({k: float(np.asarray(v)) for k, v in losses.items()})
    seq_params = jax.device_get(state.params)
    seq_step = int(state.step)

    ms = make_multi_train_step(cfg, model)
    state2 = create_train_state(cfg, model, jax.random.PRNGKey(0), batches[0])
    stacked_b = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    state2, stacked = ms(state2, stacked_b, key, 0)
    assert int(state2.step) == seq_step == 3
    for i, row in enumerate(seq):
        for k, v in row.items():
            # XLA picks different (equally valid) f32 reduction orders
            # inside lax.scan vs the standalone program; the drift then
            # compounds step over step through the parameter updates, so
            # the tolerance escalates with the step index (step 0 is pure
            # reduction-order noise; grad_norm — a sum over every param
            # element — is the most sensitive aggregate).
            tol = [1e-4, 1e-3, 1e-2][i] * (10 if k == "grad_norm" else 1)
            np.testing.assert_allclose(
                float(np.asarray(stacked[k][i])), v, rtol=min(tol, 2e-2),
                atol=1e-6, err_msg=f"loss {k} step {i}",
            )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        jax.device_get(state2.params), seq_params,
    )


def test_trainer_steps_per_call_matches_single(tmp_path):
    """Trainer.fit with training.steps_per_call=2 reaches exactly max_steps
    (odd max_steps exercises the tail-group peel) with the same final params
    as the per-step loop."""
    from helpers import make_training_workspace

    from fastspeech2_lightning_tpu.training.loop import Trainer

    params = {}
    for k in (1, 2):
        ws = tmp_path / f"k{k}"
        ws.mkdir()
        cfg = make_training_workspace(
            ws, val_check_interval=3, steps_per_call=k, prefetch_batches=0,
        )
        trainer = Trainer(cfg)
        state = trainer.fit(max_steps=5)
        assert int(state.step) == 5
        params[k] = jax.device_get(state.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        params[1], params[2],
    )
