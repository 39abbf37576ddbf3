"""Checkpoint versioning/migration tests (parity with the reference's
fs2/tests/test_loading.py:23-203 patterns): wrong model type, newer versions,
<1.2 embedding-table remap, top-k pruning, global-step recovery, and a full
save->load->identical-predictions roundtrip."""


import jax
import numpy as np
import pytest

from fastspeech2_lightning_tpu.models import FastSpeech2
from fastspeech2_lightning_tpu.training.checkpoint import (
    check_and_upgrade_checkpoint,
    get_global_step,
    latest_checkpoint,
    load_checkpoint,
    prune_checkpoints,
    save_checkpoint,
)
from fastspeech2_lightning_tpu.training.state import create_train_state

from helpers import synthetic_batch, tiny_config, tiny_stats


def make_state(cfg):
    model = FastSpeech2(
        config=cfg, stats=tiny_stats(), n_symbols=30, n_speakers=1, n_languages=1
    )
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
    return model, state, batch


def test_optimizer_format_conversion_both_directions(tmp_path):
    """per-leaf <-> fused opt_state conversion moves the Adam moments
    exactly (training/fused_optim.py), and save_checkpoint records the
    format so a resume under the other layout knows to convert."""
    import json

    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    from fastspeech2_lightning_tpu.training.fused_optim import (
        _find_adam_state,
        convert_opt_state,
        find_fused_state,
        opt_state_format,
    )
    from fastspeech2_lightning_tpu.training.state import make_optimizer

    cfg = tiny_config()
    params = {
        "enc": {"kernel": jnp.arange(12.0).reshape(3, 4) / 10, "bias": jnp.ones(4)},
        "dec": {"w": jnp.linspace(-1, 1, 5)},
    }
    grads = jax.tree_util.tree_map(lambda p: 0.3 * jnp.ones_like(p), params)

    tx_leaf = make_optimizer(cfg, fused=False)
    s_leaf = tx_leaf.init(params)
    _, s_leaf = tx_leaf.update(grads, s_leaf, params)
    assert opt_state_format(s_leaf) == "per_leaf"

    tx_fused = make_optimizer(cfg, fused=True)
    fused_template = tx_fused.init(params)
    assert opt_state_format(fused_template) == "fused"

    # per-leaf -> fused
    conv = convert_opt_state(s_leaf, fused_template, params)
    fs = find_fused_state(conv)
    adam = _find_adam_state(s_leaf)
    np.testing.assert_array_equal(
        np.asarray(fs.mu), np.asarray(ravel_pytree(adam.mu)[0])
    )
    np.testing.assert_array_equal(
        np.asarray(fs.nu), np.asarray(ravel_pytree(adam.nu)[0])
    )
    assert int(fs.count) == int(adam.count) == 1

    # fused -> per-leaf (round trip restores the moment trees)
    back = convert_opt_state(conv, s_leaf, params)
    adam_back = _find_adam_state(back)
    for a, b in zip(
        jax.tree_util.tree_leaves(adam.mu),
        jax.tree_util.tree_leaves(adam_back.mu),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # fused -> FRESH per-leaf template: every count leaf (Adam bias
    # correction AND the Noam schedule's ScaleByScheduleState) must carry
    # the restored step, not the template's 0 — a dropped schedule count
    # silently restarts LR warmup on resume
    fresh = convert_opt_state(conv, tx_leaf.init(params), params)
    for a, b in zip(
        jax.tree_util.tree_leaves(fresh), jax.tree_util.tree_leaves(s_leaf)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # same format passes through untouched
    assert convert_opt_state(s_leaf, s_leaf, params) is s_leaf

    # save_checkpoint stamps the format into meta.json
    cfg2 = tiny_config()
    model, state, batch = make_state(cfg2)
    path = save_checkpoint(
        tmp_path, state, cfg2, tiny_stats(), {"default": 0}, {"default": 0},
        ["\x80", " ", "a", "b"],
    )
    with open(path / "meta.json", encoding="utf8") as f:
        assert json.load(f)["optimizer_format"] == "per_leaf"


def test_save_load_roundtrip(tmp_path):
    cfg = tiny_config()
    model, state, batch = make_state(cfg)
    path = save_checkpoint(
        tmp_path, state, cfg, tiny_stats(), {"default": 0}, {"default": 0},
        ["\x80", " ", "a", "b"], metrics={"validation/total_loss": 1.5},
    )
    assert path.name == "step=0"
    meta, arrays = load_checkpoint(path)
    assert meta["model_info"] == {"name": "FastSpeech2", "version": "1.2"}
    assert get_global_step(path) == 0
    # params identical
    orig = jax.tree_util.tree_leaves(state.params)
    loaded = jax.tree_util.tree_leaves(arrays["params"])
    assert all(np.allclose(a, b) for a, b in zip(orig, loaded))
    # model produces identical outputs from restored params
    out1 = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats}, batch
    )
    out2 = model.apply(
        {"params": arrays["params"], "batch_stats": arrays["batch_stats"]}, batch
    )
    np.testing.assert_allclose(
        np.asarray(out1["output"]), np.asarray(out2["output"]), rtol=1e-6
    )


def test_wrong_model_type_rejected():
    with pytest.raises(TypeError, match="Wrong model type"):
        check_and_upgrade_checkpoint(
            {"model_info": {"name": "HiFiGAN", "version": "1.0"}}, {}, []
        )


def test_newer_version_rejected():
    with pytest.raises(ValueError, match="newer version"):
        check_and_upgrade_checkpoint(
            {"model_info": {"name": "FastSpeech2", "version": "99.0"}}, {}, []
        )


def test_old_pfs_model_rejected():
    meta = {
        "model_info": {"name": "FastSpeech2", "version": "1.1"},
        "config": {
            "model": {"target_text_representation_level": "phonological_features"}
        },
    }
    with pytest.raises(ValueError, match="phonological-feature"):
        check_and_upgrade_checkpoint(meta, {}, [])


def test_pre_1_2_symbol_remap():
    old_symbols = ["\x80", " ", "b", "a"]
    new_symbols = ["\x80", " ", "<EXCL>", "a", "b", "c"]
    emb = np.arange(4 * 3, dtype=np.float32).reshape(4, 3)
    meta = {
        "model_info": {"name": "FastSpeech2", "version": "1.1"},
        "config": {"model": {"target_text_representation_level": "characters"}},
        "symbols": old_symbols,
    }
    arrays = {"params": {"text_input_layer": {"embedding": emb.copy()}}}
    meta, arrays = check_and_upgrade_checkpoint(meta, arrays, new_symbols)
    new = arrays["params"]["text_input_layer"]["embedding"]
    assert new.shape == (6, 3)
    # row for 'b' moved from old index 2 to new index 4; 'a' from 3 to 3
    np.testing.assert_array_equal(new[4], emb[2])
    np.testing.assert_array_equal(new[3], emb[3])
    np.testing.assert_array_equal(new[1], emb[1])
    assert meta["model_info"]["version"] == "1.2"


def test_missing_model_info_defaults_to_1_0():
    meta, _ = check_and_upgrade_checkpoint(
        {"config": {"model": {}}, "symbols": []}, {"params": {"text_input_layer": {"embedding": np.zeros((0, 4))}}}, []
    )
    assert meta["model_info"]["version"] in ("1.0", "1.2")


def test_prune_checkpoints_keeps_topk_and_latest(tmp_path):
    cfg = tiny_config()
    _, state, _ = make_state(cfg)
    monitor = "validation/total_loss"
    for step, loss in [(1, 5.0), (2, 1.0), (3, 3.0), (4, 2.0), (5, 4.0)]:
        state = state.replace(step=step)
        save_checkpoint(
            tmp_path, state, cfg, tiny_stats(), {}, {}, [],
            metrics={monitor: loss},
        )
    prune_checkpoints(tmp_path, keep_top_k=2, monitor=monitor)
    kept = sorted(p.name for p in tmp_path.glob("step=*"))
    # best two (steps 2, 4) + latest (step 5)
    assert kept == ["step=2", "step=4", "step=5"]
    assert latest_checkpoint(tmp_path).name == "step=5"


def test_average_checkpoints_and_use_ema(tmp_path):
    from fastspeech2_lightning_tpu.training.checkpoint import (
        average_checkpoints,
    )

    cfg = tiny_config()
    cfg.training.ema_decay = 0.9
    model, state, batch = make_state(cfg)
    assert state.ema_params is not None

    # two checkpoints with different params: p and 3p -> average must be 2p
    symbols = ["\x80", " ", "a", "b"]
    p1 = save_checkpoint(
        tmp_path, state, cfg, tiny_stats(), {"d": 0}, {"d": 0}, symbols
    )
    tripled = jax.tree_util.tree_map(lambda x: x * 3.0, state.params)
    state2 = state.replace(params=tripled, step=state.step + 1)
    p2 = save_checkpoint(
        tmp_path, state2, cfg, tiny_stats(), {"d": 0}, {"d": 0}, symbols
    )

    out = average_checkpoints([p1, p2], tmp_path / "avg")
    meta, arrays = load_checkpoint(out)
    want = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: np.asarray(x) * 2.0, state.params)
    )
    got = jax.tree_util.tree_leaves(arrays["params"])
    for w, g in zip(want, got):
        np.testing.assert_allclose(w, np.asarray(g), rtol=1e-6)
    assert meta["averaged_from"] == [str(p1), str(p2)]

    # ema_params land in the checkpoint and can be served via use_ema
    _, arrays1 = load_checkpoint(p1)
    assert arrays1.get("ema_params") is not None
    from fastspeech2_lightning_tpu.synthesis.synthesize import (
        load_model_from_checkpoint,
    )
    _m, variables, *_ = load_model_from_checkpoint(p1, use_ema=True)
    ema_leaves = jax.tree_util.tree_leaves(arrays1["ema_params"])
    var_leaves = jax.tree_util.tree_leaves(variables["params"])
    for a, b in zip(ema_leaves, var_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pre_1_2_remap_rejects_missing_symbols():
    # symbols absent from the current inventory must fail loudly, not be
    # stacked onto row 0 (which would overwrite the pad embedding)
    meta = {
        "model_info": {"name": "FastSpeech2", "version": "1.1"},
        "config": {"model": {"target_text_representation_level": "characters"}},
        "symbols": ["\x80", "x", "y"],
    }
    arrays = {
        "params": {"text_input_layer": {"embedding": np.zeros((3, 4), np.float32)}}
    }
    from fastspeech2_lightning_tpu.training.checkpoint import CheckpointError

    with pytest.raises(CheckpointError, match="not in the current"):
        check_and_upgrade_checkpoint(meta, arrays, ["\x80", " ", "a", "b"])


def test_ema_toggle_resume_both_directions(tmp_path):
    """Toggling ema_decay between save and resume must not crash the
    templated restore (advisor round-2 medium finding)."""
    cfg = tiny_config()
    cfg.training.ema_decay = 0.9
    _, state_ema, _ = make_state(cfg)
    assert state_ema.ema_params is not None
    p_with = save_checkpoint(
        tmp_path / "with", state_ema, cfg, tiny_stats(), {"d": 0}, {"d": 0}, ["\x80"]
    )

    cfg2 = tiny_config()
    _, state_plain, _ = make_state(cfg2)
    assert state_plain.ema_params is None
    p_without = save_checkpoint(
        tmp_path / "without", state_plain, cfg2, tiny_stats(), {"d": 0}, {"d": 0},
        ["\x80"],
    )

    def template_for(state):
        t = {"params": state.params, "opt_state": state.opt_state}
        if state.batch_stats is not None:
            t["batch_stats"] = state.batch_stats
        if state.constants is not None:
            t["constants"] = state.constants
        if state.ema_params is not None:
            t["ema_params"] = state.ema_params
        return t

    # ckpt has ema_params, run has ema off: restore succeeds, EMA available
    _, arrays = load_checkpoint(p_with, template=template_for(state_plain))
    assert arrays.get("ema_params") is not None
    # ckpt lacks ema_params, run has ema newly on: restore succeeds, no EMA
    _, arrays = load_checkpoint(p_without, template=template_for(state_ema))
    assert arrays.get("ema_params") is None

    # legacy checkpoint without array_keys in meta: orbax metadata fallback
    import json as _json

    meta_path = p_with / "meta.json"
    meta = _json.loads(meta_path.read_text())
    del meta["array_keys"]
    meta_path.write_text(_json.dumps(meta))
    _, arrays = load_checkpoint(p_with, template=template_for(state_plain))
    assert arrays.get("ema_params") is not None


def test_average_checkpoints_bf16_leaves(tmp_path):
    """bfloat16 leaves must actually be averaged (not silently copied) and
    averaging must divide before the narrow-dtype cast."""
    import jax.numpy as jnp
    from fastspeech2_lightning_tpu.training.checkpoint import average_checkpoints

    cfg = tiny_config()
    _, state, _ = make_state(cfg)
    bf16 = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.bfloat16), state.params
    )
    p1 = save_checkpoint(
        tmp_path / "a", state.replace(params=bf16), cfg, tiny_stats(), {}, {}, []
    )
    tripled = jax.tree_util.tree_map(lambda x: x * 3.0, bf16)
    p2 = save_checkpoint(
        tmp_path / "b",
        state.replace(params=tripled, step=state.step + 1),
        cfg, tiny_stats(), {}, {}, [],
    )
    out = average_checkpoints([p1, p2], tmp_path / "avg")
    _, arrays = load_checkpoint(out)
    got = jax.tree_util.tree_leaves(arrays["params"])
    want = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: np.asarray(x * 2.0), bf16)
    )
    for w, g in zip(want, got):
        assert np.asarray(g).dtype == np.asarray(w).dtype
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(w, np.float32), rtol=2e-2
        )


def test_average_checkpoints_requires_ema_when_asked(tmp_path):
    from fastspeech2_lightning_tpu.training.checkpoint import (
        CheckpointError,
        average_checkpoints,
    )

    cfg = tiny_config()
    model, state, batch = make_state(cfg)
    p1 = save_checkpoint(
        tmp_path, state, cfg, tiny_stats(), {"d": 0}, {"d": 0}, ["\x80"]
    )
    with pytest.raises(CheckpointError, match="no ema_params"):
        average_checkpoints([p1], tmp_path / "avg", use_ema=True)


def test_training_resume_migrates_old_symbol_table(tmp_path):
    """A version-1.1 checkpoint with a SMALLER symbol inventory loads on
    the TRAINING path: template restores used to fail on the embedding
    shape before the row-by-row remap ever ran. The migrate branch
    restores template-less, remaps the table, and starts the optimizer
    fresh (old moments carry the old embedding shape)."""
    import json

    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).parent))
    from helpers import make_training_workspace

    from fastspeech2_lightning_tpu.training.loop import Trainer

    cfg = make_training_workspace(
        tmp_path, max_steps=1, ckpt_steps=10_000, val_check_interval=10_000
    )
    trainer = Trainer(cfg)
    state = trainer.fit(max_steps=1, resume=False)
    ckpt = sorted(trainer.ckpt_dir.glob("step=*"))[-1]

    # doctor the checkpoint into a v1.1 model with a smaller inventory:
    # drop the LAST symbol and the matching embedding row
    meta = json.loads((ckpt / "meta.json").read_text())
    old_symbols = meta["symbols"][:-1]
    import jax as _jax
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    arrays = ckptr.restore((ckpt / "arrays").resolve())
    emb = np.asarray(arrays["params"]["text_input_layer"]["embedding"])
    doctored_dir = tmp_path / "old_ckpt" / "step=1"
    doctored_dir.mkdir(parents=True)
    arrays["params"]["text_input_layer"]["embedding"] = emb[:-1] + 1.0
    ckptr.save((doctored_dir / "arrays").resolve(), arrays)
    ckptr.wait_until_finished()
    meta["model_info"]["version"] = "1.1"
    meta["symbols"] = old_symbols
    (doctored_dir / "meta.json").write_text(json.dumps(meta))

    cfg.training.finetune_checkpoint = str(doctored_dir)
    trainer2 = Trainer(cfg)
    state2 = trainer2.fit(max_steps=2, resume=False)
    got = np.asarray(
        _jax.device_get(
            state2.params["text_input_layer"]["embedding"]
        )
    )
    # rows for surviving symbols came from the doctored (+1.0) table; the
    # dropped symbol's row stays untouched by the remap. After 1 finetune
    # step values moved slightly, so compare against the doctored rows
    # loosely and assert the remap actually took (offset >> step size)
    assert got.shape[0] == len(meta["symbols"]) + 1
    diff = np.abs(got[: len(old_symbols)] - (emb[:-1] + 1.0)).max()
    assert diff < 0.5, f"remapped rows not loaded (max diff {diff})"
