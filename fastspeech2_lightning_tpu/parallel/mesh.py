"""Device mesh + sharding layout.

The reference's distributed story is Lightning DDP over NCCL (SURVEY.md §2.4).
The TPU-native equivalent: a `jax.sharding.Mesh(("data", "model"))` over
ICI/DCN, batches sharded on the data axis, parameters replicated by default
with the wide Conformer FFN / attention / embedding matrices optionally sharded
on the model axis (tensor parallelism). All collectives (gradient psum under
`jax.grad` of a data-sharded loss, all-gathers for model-sharded matmuls) are
inserted by XLA GSPMD from these annotations — no explicit communication code.

Multi-host: call `jax.distributed.initialize()` before `make_mesh()`; the same
code paths then span hosts (DCN between slices)."""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, model_parallel: int = 1
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def batch_pspec(batch: dict) -> dict:
    """PartitionSpec tree for a batch: leading (batch) axis on 'data'."""
    def spec(x):
        if x is None or not hasattr(x, "ndim") or x.ndim == 0:
            return P()
        return P("data", *([None] * (x.ndim - 1)))

    return jax.tree_util.tree_map(spec, batch)


# Model-axis tensor-parallel layout for the big matmuls. Megatron-style
# pairing: first FFN projection column-sharded, second row-sharded; fused qkv
# column-sharded (head dim), attention output row-sharded.
_PARAM_RULES: list[tuple[str, P]] = [
    (r".*ffn\d/linear1/kernel$", P(None, "model")),
    (r".*ffn\d/linear1/bias$", P("model")),
    (r".*ffn\d/linear2/kernel$", P("model", None)),
    (r".*attn/qkv/kernel$", P(None, "model")),
    (r".*attn/qkv/bias$", P("model")),
    (r".*attn/out/kernel$", P("model", None)),
    (r".*text_input_layer/embedding$", P(None, "model")),
]


def param_pspec_tree(params) -> dict:
    """PartitionSpec tree for params: rules above, else fully replicated."""

    def spec_for(path: str, leaf) -> P:
        for pattern, pspec in _PARAM_RULES:
            if re.match(pattern, path):
                # only shard when the dimension divides evenly; checked later
                return pspec
        return P()

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    specs = []
    for path, leaf in flat:
        path_str = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        specs.append(spec_for(path_str, leaf))
    return jax.tree_util.tree_unflatten(treedef, specs)


def opt_pspec_tree(opt_state, params):
    """PartitionSpec tree for an optax state.

    Any subtree whose pytree structure equals the params' (the Adam moments
    mu/nu inside ScaleByAdamState, EMA traces, …) gets the params' specs, so
    a model-sharded param's moments live sharded next to it instead of being
    replicated (2x param bytes of wasted HBM per device at TP scale, plus a
    GSPMD reshard every update). Scalars (step counts) and empty states are
    replicated."""
    from ..training.fused_optim import FusedAdamWState

    pspecs = param_pspec_tree(params)
    params_def = jax.tree_util.tree_structure(params)

    def rec(node):
        if node is None:
            return None
        if isinstance(node, FusedAdamWState):
            # flat-buffer moments (fused optimizer, data-parallel only):
            # shard the big 1-D buffers over the data axis — ZeRO-1 style
            # optimizer-state sharding. GSPMD turns the update into
            # slice-local Adam math + an all-gather of the param delta.
            return FusedAdamWState(count=P(), mu=P("data"), nu=P("data"))
        if isinstance(node, dict) or (
            hasattr(node, "items") and hasattr(node, "keys")
        ):
            if jax.tree_util.tree_structure(node) == params_def:
                return pspecs
            return {k: rec(v) for k, v in node.items()}
        if isinstance(node, tuple) and hasattr(node, "_fields"):  # NamedTuple
            return type(node)(*[rec(getattr(node, f)) for f in node._fields])
        if isinstance(node, (tuple, list)):
            return type(node)(rec(c) for c in node)
        return P()

    return rec(opt_state)


def _validated_spec(spec: P, leaf, mesh: Mesh) -> P:
    """Drop model-axis sharding for dims that don't divide evenly."""
    if spec == P():
        return spec
    dims = list(spec)
    for i, axis in enumerate(dims):
        if axis is None:
            continue
        size = mesh.shape[axis]
        if i >= leaf.ndim or leaf.shape[i] % size != 0:
            return P()
    return spec


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a batch on the mesh, batch axis over 'data'.

    Single-process: a plain device_put. Multi-process (multi-host): each
    process holds only its OWN rows of the global batch (BucketedLoader
    `shard=` slicing) and the global array is assembled with
    `host_local_array_to_global_array` — the process-order concatenation
    matches the loader's contiguous per-process slices."""
    specs = batch_pspec(batch)

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        def put_global(x, spec):
            if x is None:
                return None
            return multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, spec
            )

        return jax.tree_util.tree_map(put_global, batch, specs)

    def put(x, spec):
        if x is None:
            return None
        spec = _validated_spec(spec, x, mesh)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch, specs)


def _put_sharded(x, spec: P, mesh: Mesh):
    """Place one HOST-REPLICATED value (numpy or local array — every process
    holds the identical full value) onto the mesh with `spec`.

    Multi-process device_put cannot target non-addressable devices, so the
    global array is built with make_array_from_callback: each process
    serves the shards its devices own by slicing its full local copy."""
    if x is None or not hasattr(x, "shape"):
        return x
    spec = _validated_spec(spec, x, mesh)
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() > 1:
        xh = np.asarray(x)
        return jax.make_array_from_callback(
            xh.shape, sharding, lambda idx: xh[idx]
        )
    return jax.device_put(x, sharding)


def shard_state(state, mesh: Mesh):
    """Place a TrainState on the mesh: params/opt_state per the rules
    (model-sharded where divisible), everything else replicated."""
    pspecs = param_pspec_tree(state.params)

    def put_param(x, spec):
        return _put_sharded(x, spec, mesh)

    params = jax.tree_util.tree_map(put_param, state.params, pspecs)

    def put_repl(x):
        return _put_sharded(x, P(), mesh)

    # optimizer state mirrors the params' placement (opt_pspec_tree); leaves
    # without a param counterpart (counts) are replicated
    opt_specs = opt_pspec_tree(state.opt_state, state.params)

    new_state = state.replace(
        params=params,
        opt_state=jax.tree_util.tree_map(
            lambda x, spec: _put_sharded(x, spec, mesh),
            state.opt_state,
            opt_specs,
        ),
        batch_stats=jax.tree_util.tree_map(put_repl, state.batch_stats)
        if state.batch_stats is not None
        else None,
        constants=jax.tree_util.tree_map(put_repl, state.constants)
        if state.constants is not None
        else None,
        ema_params=jax.tree_util.tree_map(put_param, state.ema_params, pspecs)
        if getattr(state, "ema_params", None) is not None
        else None,
        step=_put_sharded(np.asarray(state.step), P(), mesh),
    )
    return new_state
