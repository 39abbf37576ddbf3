"""Sharding tests on the virtual 8-device CPU mesh: data-parallel batch
sharding, tensor-parallel param rules, full train step under both, and
loss equivalence between 1-device and 8-device execution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from fastspeech2_lightning_tpu.models import FastSpeech2
from fastspeech2_lightning_tpu.parallel import (
    make_mesh,
    param_pspec_tree,
    shard_batch,
)
from fastspeech2_lightning_tpu.parallel.mesh import _validated_spec
from fastspeech2_lightning_tpu.training.state import create_train_state
from fastspeech2_lightning_tpu.training.step import make_train_step

from helpers import synthetic_batch, tiny_config, tiny_stats

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def build_state_and_batch(B=8):
    cfg = tiny_config()
    model = FastSpeech2(
        config=cfg, stats=tiny_stats(), n_symbols=30, n_speakers=1, n_languages=1
    )
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, B=B, L=16, T=32)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
    return cfg, model, state, batch


def test_mesh_shapes():
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8, "model": 1}


def test_batch_sharded_on_data_axis():
    mesh = make_mesh(8)
    _, _, _, batch = build_state_and_batch()
    sharded = shard_batch(batch, mesh)
    sh = sharded["text"].sharding
    assert sh.spec[0] == "data"
    # each device holds B/8 rows
    assert sharded["text"].addressable_shards[0].data.shape[0] == 1


def test_param_rules_target_big_matmuls():
    _, _, state, _ = build_state_and_batch()
    specs = param_pspec_tree(state.params)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    hits = [
        "/".join(p.key for p in path)
        for path, spec in flat
        if spec != P()
    ]
    assert any("linear1/kernel" in h for h in hits)
    assert any("qkv/kernel" in h for h in hits)


def test_train_step_dp_matches_single_device():
    cfg, model, state, batch = build_state_and_batch()
    ts = make_train_step(cfg, model)
    # single device
    s1, losses1 = ts(state, batch, jax.random.PRNGKey(1), 0)

    # 8-device data parallel
    mesh = make_mesh(8)
    _, _, state2, _ = build_state_and_batch()
    repl = NamedSharding(mesh, P())
    state2 = state2.replace(
        params=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), state2.params
        ),
        opt_state=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl) if hasattr(x, "shape") else x,
            state2.opt_state,
        ),
        batch_stats=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), state2.batch_stats
        ),
        constants=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), state2.constants
        )
        if state2.constants is not None
        else None,
    )
    sharded = shard_batch(batch, mesh)
    with mesh:
        s8, losses8 = ts(state2, sharded, jax.random.PRNGKey(1), 0)
    for k in losses1:
        # grad_norm sums squares over every parameter: reduction order across
        # shards shifts it slightly more than the per-loss scalars
        rtol = 2e-3 if k == "grad_norm" else 2e-4
        np.testing.assert_allclose(
            float(losses1[k]), float(losses8[k]), rtol=rtol, atol=2e-5
        )


def test_train_step_tensor_parallel_executes():
    mesh = make_mesh(8, model_parallel=2)
    cfg, model, state, batch = build_state_and_batch()
    pspecs = param_pspec_tree(state.params)
    params = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(
            x, NamedSharding(mesh, _validated_spec(s, x, mesh))
        ),
        state.params,
        pspecs,
    )
    repl = NamedSharding(mesh, P())
    state = state.replace(
        params=params,
        opt_state=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl) if hasattr(x, "shape") else x,
            state.opt_state,
        ),
        batch_stats=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), state.batch_stats
        ),
    )
    sharded = shard_batch(batch, mesh)
    ts = make_train_step(cfg, model)
    with mesh:
        new_state, losses = ts(state, sharded, jax.random.PRNGKey(1), 0)
    assert np.isfinite(float(losses["total"]))
