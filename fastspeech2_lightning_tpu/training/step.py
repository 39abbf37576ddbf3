"""Jitted train/eval/predict steps.

One fused XLA program per step — forward, loss, backward, optimizer update —
with donated state (the reference's per-step Python orchestration through
Lightning hooks is replaced by a single compiled function)."""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

from ..config import FastSpeech2Config
from .loss import compute_loss
from .state import TrainState


def _variables(state: TrainState) -> Dict[str, Any]:
    v = {"params": state.params}
    if state.batch_stats is not None:
        v["batch_stats"] = state.batch_stats
    if state.constants is not None:
        v["constants"] = state.constants
    return v


def make_train_step(config: FastSpeech2Config, model):
    """(state, batch, rng, epoch) -> (state, losses) — jitted, state donated."""
    return jax.jit(_train_step_core(config, model), donate_argnums=(0,))


def make_multi_train_step(config: FastSpeech2Config, model):
    """k fused training steps per dispatch: (state, batches, rng, epoch) ->
    (state, stacked losses), batches a pytree with a leading [k, ...] axis.

    Why: every dispatch pays a host->device round trip; on a remote/tunneled
    TPU that RTT (~2.3 ms/step measured at B=32) does not overlap with the
    33 ms device step because the transport serializes execute calls. A
    lax.scan over k steps amortizes it k-fold. The body is the SAME
    train-step core as make_train_step — the per-step dropout stream still
    folds on state.step, so k scanned steps produce bit-identical math to k
    sequential dispatches (asserted in tests/test_training.py). Losses come
    back stacked [k] so the Trainer logs exact per-step values."""
    core = _train_step_core(config, model)

    def multi_train_step(state: TrainState, batches, rng, epoch):
        def body(st, batch):
            st, losses = core(st, batch, rng, epoch)
            return st, losses

        return jax.lax.scan(body, state, batches)

    return jax.jit(multi_train_step, donate_argnums=(0,))


def _train_step_core(config: FastSpeech2Config, model):
    def train_step(state: TrainState, batch, rng, epoch):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            variables = dict(_variables(state), params=params)
            mutable = ["batch_stats"] if state.batch_stats is not None else []
            out = model.apply(
                variables,
                batch,
                deterministic=False,
                rngs={"dropout": rng},
                mutable=mutable,
            )
            if mutable:
                out, updated = out
            else:
                updated = {}
            losses = compute_loss(config, out, batch, epoch)
            return losses["total"], (losses, updated)

        grads, (losses, updated) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        if state.batch_stats is not None:
            new_state = new_state.replace(batch_stats=updated["batch_stats"])
        if state.ema_params is not None:
            decay = config.training.ema_decay
            new_state = new_state.replace(
                ema_params=jax.tree_util.tree_map(
                    lambda e, p: decay * e + (1.0 - decay) * p,
                    state.ema_params,
                    new_state.params,
                )
            )
        if config.training.fused_optimizer:
            # raveled norm: one concat + one reduce — CSEs with the fused
            # optimizer's identical ravel of the same grads
            flat_g, _ = ravel_pytree(grads)
            losses["grad_norm"] = jnp.sqrt(jnp.sum(flat_g * flat_g))
        else:
            # per-leaf sum chain — CSEs with clip_by_global_norm's identical
            # computation inside the optax chain (a ravel here would add a
            # param-sized concatenate + per-leaf copies the optimizer never
            # needs; profiled at ~1 ms/step at B=32)
            losses["grad_norm"] = optax.global_norm(grads)
        return new_state, losses

    return train_step


def make_eval_step(config: FastSpeech2Config, model):
    """(state, batch, epoch) -> losses (+ model output) — deterministic."""

    def eval_step(state: TrainState, batch, epoch):
        out = model.apply(_variables(state), batch, deterministic=True)
        losses = compute_loss(config, out, batch, epoch)
        return losses, out

    return jax.jit(eval_step)


def make_predict_step(config: FastSpeech2Config, model, max_target_len: int):
    """Synthesis step: (state, batch, control, teacher_forcing) -> output dict."""

    @functools.partial(jax.jit, static_argnames=("teacher_forcing",))
    def predict_step(state: TrainState, batch, control, teacher_forcing=False):
        return model.apply(
            _variables(state),
            batch,
            control=control,
            inference=True,
            teacher_forcing=teacher_forcing,
            deterministic=True,
            max_target_len=max_target_len,
        )

    return predict_step
