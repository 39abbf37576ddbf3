"""Train state: params + optimizer + schedule.

Optimizer parity with the reference (fs2/model.py:530-549): AdamW with the
Noam LR schedule stepped per optimizer step (fs2/noam.py:20-26), and global
gradient-norm clipping at training.gradient_clip_val (the harness passes 1.0,
fs2/cli/train.py:38). Expressed as one optax chain inside a flax TrainState;
the whole update is jitted with donated arguments."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state

from ..config import FastSpeech2Config


def noam_schedule(base_lr: float, warmup_steps: int):
    """scale = warmup^0.5 * min(step^-0.5, step * warmup^-1.5), step >= 1."""

    def schedule(step):
        step = jnp.maximum(step.astype(jnp.float32), 1.0)
        scale = warmup_steps**0.5 * jnp.minimum(
            step**-0.5, step * warmup_steps**-1.5
        )
        return base_lr * scale

    return schedule


class TrainState(train_state.TrainState):
    """TrainState carrying mutable batch statistics (PostNet/GST batch norm)
    and an optional exponential-moving-average shadow of the params."""

    batch_stats: Any = None
    constants: Any = struct.field(pytree_node=True, default=None)
    ema_params: Any = None


def freeze_mask(params, frozen: list[str]):
    """Boolean pytree marking every leaf under a frozen top-level subtree.

    `frozen` names top-level keys of the param dict (module names like
    'encoder', 'text_input_layer'). Unknown names raise so a typo can't
    silently fine-tune what was meant to stay fixed."""
    frozen_set = set(frozen)
    unknown = frozen_set - set(params.keys())
    if unknown:
        raise ValueError(
            f"freeze_components {sorted(unknown)} not found among model "
            f"parameter subtrees {sorted(params.keys())}"
        )
    return {
        k: jax.tree_util.tree_map(lambda _: k in frozen_set, v)
        for k, v in params.items()
    }


def make_optimizer(
    config: FastSpeech2Config, fused: bool | None = None
) -> optax.GradientTransformation:
    """AdamW + Noam schedule + global-norm clip.

    fused=None defers to config.training.fused_optimizer. The fused path
    (training/fused_optim.py) runs clip+Adam on one raveled buffer — same
    numbers, ~10 big vector ops instead of thousands of per-leaf ones.
    Callers sharding params on the model axis (tensor parallelism) must pass
    fused=False so the moments can shard with their params."""
    opt = config.training.optimizer
    if fused is None:
        fused = config.training.fused_optimizer
    sched = noam_schedule(opt.learning_rate, opt.warmup_steps)
    if fused:
        from .fused_optim import fused_clip_adamw

        tx = fused_clip_adamw(
            learning_rate=sched,
            b1=opt.betas[0],
            b2=opt.betas[1],
            eps=opt.eps,
            weight_decay=opt.weight_decay,
            clip_norm=config.training.gradient_clip_val,
        )
    else:
        tx = optax.chain(
            optax.clip_by_global_norm(config.training.gradient_clip_val),
            optax.adamw(
                learning_rate=sched,
                b1=opt.betas[0],
                b2=opt.betas[1],
                eps=opt.eps,
                weight_decay=opt.weight_decay,
            ),
        )
    frozen = config.training.freeze_components
    if frozen:
        tx = optax.chain(
            tx,
            optax.masked(
                optax.set_to_zero(), lambda params: freeze_mask(params, frozen)
            ),
        )
    return tx


def create_train_state(
    config: FastSpeech2Config,
    model,
    rng: jax.Array,
    example_batch: dict,
    fused: bool | None = None,
) -> TrainState:
    # One jitted init program instead of eager op-by-op dispatch: identical
    # params (same traced ops/rng), but startup drops from minutes to
    # seconds under the multi-process distributed runtime, where every
    # eager op pays a distributed-client dispatch, and repeat runs hit the
    # persistent compile cache.
    variables = jax.jit(
        lambda rngs, batch: model.init(rngs, batch, deterministic=True)
    )(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        example_batch,
    )
    params = variables["params"]
    ema = None
    if config.training.ema_decay > 0:
        ema = jax.tree_util.tree_map(jnp.array, params)
    return TrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=make_optimizer(config, fused=fused),
        batch_stats=variables.get("batch_stats"),
        constants=variables.get("constants"),
        ema_params=ema,
    )
