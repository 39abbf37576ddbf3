"""Flat-buffer ("fused") AdamW + global-norm clip.

Why: the reference hands optimization to torch.optim.AdamW, whose CUDA path
uses multi-tensor/foreach kernels precisely because per-tensor optimizer math
drowns in per-op overhead. The optax analogue —
`chain(clip_by_global_norm, adamw)` mapped over this model's **371** param
leaves — compiles to thousands of tiny elementwise/copy ops (profiling the
B=32/T=1024 train step showed ~8.7k op events/step averaging 5 µs,
tools/profile_kernels.py, v5e). This module was built to kill that soup;
the measurement below shows the soup was already nearly free.

The TPU-native fix is the same idea XLA can't do for us across leaf
boundaries: ravel grads/params into ONE flat vector (`ravel_pytree`), run
clip + Adam moments + bias correction + weight decay + Noam-scheduled update
as ~10 full-length vector ops, and unravel the single update vector back to
the tree. The per-leaf remainder is just the unravel slices and the final
`params + update` adds.

MEASURED RESULT (v5e, B=32/T=1024 flagship, /tmp-style chained harness with
forced fetches): shipped per-leaf step 41.3 ms, grads-only 40.75 ms, fused
41.8 ms. The whole per-leaf optimizer — clip, Adam, decay, 371 leaves —
costs ~0.6 ms; XLA's latency hiding already absorbs the tiny-op soup, and
the fused path's extra ravel/unravel HBM passes cost slightly more than the
soup they remove. So this stays OPT-IN (training.fused_optimizer, default
false): its real value is the ZeRO-1 data-axis sharding of the flat moments
(parallel/mesh.py `opt_pspec_tree`) when optimizer HBM binds, not step
time.

Numerically identical to `optax.chain(optax.clip_by_global_norm(c),
optax.adamw(...))` (same clip trigger, same post-increment bias correction,
eps_root=0, decoupled weight decay applied to every param — matching the
reference's torch AdamW without param groups, fs2/model.py:530-549); the
equivalence is asserted leaf-exactly in tests/test_training.py.

Not used under tensor parallelism: the flat concat would force model-sharded
params to be gathered every step, so `create_train_state(fused=...)` /
`Trainer(model_parallel>1)` fall back to the per-leaf chain whose moments
shard with their params (parallel/mesh.py `opt_pspec_tree`). Under pure data
parallelism the flat moments instead shard over the *data* axis (ZeRO-1
style) — see `opt_pspec_tree`'s FusedAdamWState case.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree


class FusedAdamWState(NamedTuple):
    count: chex.Array  # i32 scalar, post-increment like optax scale_by_adam
    mu: chex.Array  # flat first moment [n_params]
    nu: chex.Array  # flat second moment [n_params]


def fused_clip_adamw(
    learning_rate,
    b1: float,
    b2: float,
    eps: float,
    weight_decay: float,
    clip_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """One-buffer clip+AdamW. `learning_rate` is a float or schedule(count).

    update() returns the usual optax update tree (added to params by
    `optax.apply_updates`); internally everything runs on the raveled
    vector, so the per-leaf op count is O(leaves) slices instead of
    O(leaves x optimizer-ops).
    """

    def init_fn(params) -> FusedAdamWState:
        flat, _ = ravel_pytree(params)
        return FusedAdamWState(
            count=jnp.zeros((), jnp.int32),
            mu=jnp.zeros_like(flat),
            nu=jnp.zeros_like(flat),
        )

    def update_fn(updates, state: FusedAdamWState, params=None):
        if params is None:
            raise ValueError("fused_clip_adamw requires params")
        g, unravel = ravel_pytree(updates)
        p, _ = ravel_pytree(params)
        if clip_norm is not None:
            # optax.clip_by_global_norm semantics: scale only when the
            # global norm exceeds the threshold
            gnorm = jnp.sqrt(jnp.sum(g * g))
            scale = jnp.where(
                gnorm < clip_norm, 1.0, clip_norm / jnp.maximum(gnorm, 1e-30)
            )
            g = g * scale
        count = optax.safe_int32_increment(state.count)
        mu = b1 * state.mu + (1.0 - b1) * g
        nu = b2 * state.nu + (1.0 - b2) * (g * g)
        cf = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - b1**cf)
        nu_hat = nu / (1.0 - b2**cf)
        # optax.adamw evaluates the schedule at the PRE-increment count
        # (scale_by_schedule is 0-based) while Adam bias correction uses the
        # post-increment count; match both exactly
        lr = (
            learning_rate(state.count)
            if callable(learning_rate)
            else learning_rate
        )
        upd = -lr * (mu_hat / (jnp.sqrt(nu_hat) + eps) + weight_decay * p)
        return unravel(upd), FusedAdamWState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def find_fused_state(opt_state):
    """The FusedAdamWState inside an (possibly chained) optax state, or None."""
    found = []

    def visit(node):
        if isinstance(node, FusedAdamWState):
            found.append(node)
            return
        if isinstance(node, (tuple, list)):
            for c in node:
                visit(c)

    visit(opt_state)
    return found[0] if found else None


def opt_state_format(opt_state) -> str:
    """'fused' | 'per_leaf' — recorded in checkpoint meta for conversion."""
    return "fused" if find_fused_state(opt_state) is not None else "per_leaf"


def _find_adam_state(opt_state):
    """Locate optax's ScaleByAdamState (count/mu/nu trees) in a chain state."""
    found = []

    def visit(node):
        if isinstance(node, FusedAdamWState):
            return
        if hasattr(node, "_fields"):
            if {"count", "mu", "nu"} <= set(node._fields):
                found.append(node)
                return
            for f in node._fields:
                visit(getattr(node, f))
        elif isinstance(node, (tuple, list)):
            for c in node:
                visit(c)

    visit(opt_state)
    return found[0] if found else None


def convert_opt_state(restored, target_template, params):
    """Convert a restored opt_state between per-leaf and fused formats.

    `restored` is the on-disk opt_state (numpy pytree, restored with a
    template of its own format); `target_template` is the current run's
    opt_state structure. The Adam moments transfer exactly: ravel_pytree's
    leaf order is determined by the param tree structure, which both formats
    share."""
    src_fused = find_fused_state(restored)
    tgt_fused = find_fused_state(target_template)
    if (src_fused is None) == (tgt_fused is None):
        return restored  # same format, nothing to do

    flat_p, unravel = ravel_pytree(params)

    if src_fused is not None:
        # fused -> per-leaf: unravel the flat moments into param-shaped trees
        adam = _find_adam_state(target_template)
        if adam is None:
            raise ValueError(
                "cannot convert fused opt_state: target has no Adam state"
            )

        def replace_adam(node):
            if hasattr(node, "_fields"):
                if {"count", "mu", "nu"} <= set(node._fields):
                    return type(node)(
                        count=jnp.asarray(src_fused.count),
                        mu=unravel(jnp.asarray(src_fused.mu)),
                        nu=unravel(jnp.asarray(src_fused.nu)),
                    )
                if set(node._fields) == {"count"}:
                    # ScaleByScheduleState: the Noam LR schedule's step
                    # counter — without this a fused->per-leaf resume
                    # restarts LR warmup from 0 at full Adam moments
                    return type(node)(count=jnp.asarray(src_fused.count))
                return type(node)(
                    *[replace_adam(getattr(node, f)) for f in node._fields]
                )
            if isinstance(node, (tuple, list)):
                return type(node)(replace_adam(c) for c in node)
            return node

        return replace_adam(target_template)

    # per-leaf -> fused: ravel the moment trees into flat buffers
    adam = _find_adam_state(restored)
    if adam is None:
        raise ValueError(
            "cannot convert per-leaf opt_state: no Adam state found"
        )
    mu_flat, _ = ravel_pytree(adam.mu)
    nu_flat, _ = ravel_pytree(adam.nu)
    if mu_flat.shape != flat_p.shape:
        raise ValueError(
            f"opt_state moments ({mu_flat.shape}) do not match params "
            f"({flat_p.shape}); cannot convert"
        )
    new_fused = FusedAdamWState(
        count=jnp.asarray(adam.count), mu=mu_flat, nu=nu_flat
    )

    def replace_fused(node):
        if isinstance(node, FusedAdamWState):
            return new_fused
        if hasattr(node, "_fields"):
            return type(node)(
                *[replace_fused(getattr(node, f)) for f in node._fields]
            )
        if isinstance(node, (tuple, list)):
            return type(node)(replace_fused(c) for c in node)
        return node

    return replace_fused(target_template)
