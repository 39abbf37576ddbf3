"""FastSpeech2 training loss.

Behavioral parity with fs2/loss.py:19-126: masked MSE/MAE for pitch, energy,
log-duration (target = log(dur+1)), mel + postnet spec losses, CTC forward-sum
+ binarization attention losses with epoch-linear binarization warmup, and a
weighted total.

Note on masking semantics: the reference multiplies predictions/targets by the
mask but averages with `nn.MSELoss` over *all* elements including padding
(fs2/loss.py:54-58) — so the denominator is B×T_max. We reproduce that exactly
(jnp.mean over masked tensors) so loss curves are comparable; with static
bucket padding the scale factor is identical for identically padded batches."""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from ..config import FastSpeech2Config, VarianceLevelEnum, VarianceLossEnum
from ..ops.ctc import attention_binarization_loss, attention_ctc_loss


def _elem_loss(kind: VarianceLossEnum, pred, target, sample_weight=None):
    diff = (pred - target) ** 2 if kind == VarianceLossEnum.mse else jnp.abs(
        pred - target
    )
    if sample_weight is None:
        return jnp.mean(diff)
    # zero-weight rows are static-shape filler (BucketedLoader partial-batch
    # fill): exclude them from numerator AND denominator so the loss equals
    # the mean the reference would compute over a smaller final batch
    # (keeping the per-sample denominator = prod(shape[1:]), i.e. the
    # reference's padded-denominator quirk, intact)
    w = sample_weight.astype(jnp.float32)
    wb = w.reshape((-1,) + (1,) * (diff.ndim - 1))
    per_sample_elems = 1
    for d in diff.shape[1:]:
        per_sample_elems *= d
    return jnp.sum(diff * wb) / jnp.maximum(
        jnp.sum(w) * per_sample_elems, 1.0
    )


def compute_loss(
    config: FastSpeech2Config,
    output: Dict[str, Any],
    batch: Dict[str, Any],
    current_epoch: int | jnp.ndarray = 0,
) -> Dict[str, jnp.ndarray]:
    mcfg = config.model
    tcfg = config.training
    losses: Dict[str, jnp.ndarray] = {}

    src_mask = output["src_mask"].astype(jnp.float32)
    tgt_mask = output["tgt_mask"].astype(jnp.float32)
    sw = batch.get("sample_weight")
    if sw is not None:
        sw = jnp.asarray(sw, jnp.float32)

    # Pitch
    if output["pitch_target"] is not None:
        mask = (
            src_mask
            if mcfg.variance_predictors.pitch.level == VarianceLevelEnum.phone
            else tgt_mask
        )
        losses["pitch"] = (
            _elem_loss(
                mcfg.variance_predictors.pitch.loss,
                output["pitch_prediction"] * mask,
                output["pitch_target"] * mask,
                sw,
            )
            * tcfg.pitch_loss_weight
        )

    # Energy
    if output["energy_target"] is not None:
        mask = (
            src_mask
            if mcfg.variance_predictors.energy.level == VarianceLevelEnum.phone
            else tgt_mask
        )
        losses["energy"] = (
            _elem_loss(
                mcfg.variance_predictors.energy.loss,
                output["energy_prediction"] * mask,
                output["energy_target"] * mask,
                sw,
            )
            * tcfg.energy_loss_weight
        )

    # Duration (log domain, log(dur+1) target — fs2/loss.py:81-89)
    log_duration_target = (
        jnp.log(output["duration_target"].astype(jnp.float32) + 1.0) * src_mask
    )
    losses["duration"] = (
        _elem_loss(
            mcfg.variance_predictors.duration.loss,
            output["duration_prediction"] * src_mask,
            log_duration_target,
            sw,
        )
        * tcfg.duration_loss_weight
    )

    # Mel spectrogram
    m3 = tgt_mask[:, :, None]
    spec_target = batch["mel"].astype(jnp.float32) * m3
    losses["spec"] = (
        _elem_loss(mcfg.mel_loss, output["output"] * m3, spec_target, sw)
        * tcfg.mel_loss_weight
    )
    if mcfg.use_postnet:
        losses["postnet"] = (
            _elem_loss(mcfg.mel_loss, output["postnet_output"] * m3, spec_target, sw)
            * tcfg.postnet_loss_weight
        )

    # Attention losses (fs2/loss.py:109-122)
    if mcfg.learn_alignment:
        losses["attn_ctc"] = (
            attention_ctc_loss(
                output["attn_logprob"], batch["src_lens"], batch["mel_lens"],
                sample_weight=sw,
            )
            * tcfg.attn_ctc_loss_weight
        )
        bin_warmup = jnp.minimum(
            jnp.asarray(current_epoch, jnp.float32)
            / tcfg.attn_bin_loss_warmup_epochs,
            1.0,
        )
        losses["attn_bin"] = (
            attention_binarization_loss(
                output["attn_hard"], output["attn_soft"], sample_weight=sw
            )
            * bin_warmup
            * tcfg.attn_bin_loss_weight
        )

    losses["total"] = sum(losses.values())
    return losses
