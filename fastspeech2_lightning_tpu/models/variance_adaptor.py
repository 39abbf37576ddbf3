"""Variance adaptor: duration/pitch/energy predictors + alignment + expansion.

Behavioral parity with fs2/variance_adaptor.py:84-412, restructured around
static shapes:
 - alignment: ConvAttention + on-device scan MAS (ops.mas) instead of the
   reference's per-step CPU numba round-trip
 - LengthRegulator: one searchsorted+gather to a static frame budget
 - phone-level variance averaging and bucketized embeddings: cumsum/gather +
   searchsorted (ops.variance)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..config import FastSpeech2Config, VarianceLevelEnum
from ..type_definitions import Stats
from ..ops.length_regulator import length_regulate
from ..ops.mas import mas_width1_batched
from ..ops.variance import average_variance, bucketize
from .attention import ConvAttention
from .layers import VariancePredictor


class VarianceAdaptor(nn.Module):
    config: FastSpeech2Config
    stats: Stats

    def setup(self):
        mcfg = self.config.model
        dt = jnp.bfloat16 if mcfg.dtype == "bfloat16" else jnp.float32
        self.compute_dtype = dt
        vp = mcfg.variance_predictors
        self.duration_predictor = VariancePredictor(
            n_layers=vp.duration.n_layers,
            n_channels=vp.duration.input_dim,
            output_dim=1,
            kernel_size=vp.duration.kernel_size,
            dropout_rate=vp.duration.dropout,
            depthwise=vp.duration.depthwise,
            dtype=dt,
            name="duration_predictor",
        )
        self.pitch_predictor = VariancePredictor(
            n_layers=vp.pitch.n_layers,
            n_channels=vp.pitch.input_dim,
            output_dim=1,
            kernel_size=vp.pitch.kernel_size,
            dropout_rate=vp.pitch.dropout,
            depthwise=vp.pitch.depthwise,
            dtype=dt,
            name="pitch_predictor",
        )
        self.energy_predictor = VariancePredictor(
            n_layers=vp.energy.n_layers,
            n_channels=vp.energy.input_dim,
            output_dim=1,
            kernel_size=vp.energy.kernel_size,
            dropout_rate=vp.energy.dropout,
            depthwise=vp.energy.depthwise,
            dtype=dt,
            name="energy_predictor",
        )
        self.pitch_embedding = nn.Embed(
            vp.pitch.n_bins, vp.pitch.input_dim, name="pitch_embedding", dtype=dt
        )
        self.energy_embedding = nn.Embed(
            vp.energy.n_bins, vp.energy.input_dim, name="energy_embedding", dtype=dt
        )
        # bin boundaries are fixed buffers derived from corpus stats
        # (fs2/variance_adaptor.py:117-124); imported reference checkpoints
        # override them through the 'constants' collection because
        # torch.linspace's f32 rounding differs from jnp.linspace in the
        # last ulp, which flips torch.bucketize on boundary-exact targets
        self._default_pitch_bins = jnp.linspace(
            self.stats.pitch.norm_min, self.stats.pitch.norm_max, vp.pitch.n_bins - 1
        )
        self._default_energy_bins = jnp.linspace(
            self.stats.energy.norm_min, self.stats.energy.norm_max, vp.energy.n_bins - 1
        )
        if mcfg.learn_alignment:
            self.attention = ConvAttention(
                n_mel_channels=self.config.preprocessing.audio.n_mels,
                n_text_channels=mcfg.encoder.input_dim,
                n_att_channels=self.config.preprocessing.audio.n_mels,
                use_query_proj=True,
                align_query_enc_type="3xconv",
                name="attention",
            )

    @property
    def pitch_bins(self):
        if self.has_variable("constants", "pitch_bins"):
            return self.get_variable("constants", "pitch_bins")
        return self._default_pitch_bins

    @property
    def energy_bins(self):
        if self.has_variable("constants", "energy_bins"):
            return self.get_variable("constants", "energy_bins")
        return self._default_energy_bins

    def _variance_embedding(
        self,
        x,
        target,
        mask,
        predictor: VariancePredictor,
        embedding: nn.Embed,
        bins,
        control,
        inference: bool,
        deterministic: bool,
    ):
        """(prediction, embed) — fs2/variance_adaptor.py:183-205 semantics."""
        prediction = predictor(x, mask, deterministic=deterministic)
        if not inference:
            buckets = bucketize(target, bins)
            embed = embedding(buckets)
        else:
            prediction = prediction * control
            embed = embedding(bucketize(prediction, bins))
        return prediction, embed

    def __call__(
        self,
        text_emb: jnp.ndarray,  # [B, L, D] raw text embeddings (aligner keys)
        encoder_output: jnp.ndarray,  # [B, L, D]
        batch: Dict[str, Any],
        src_mask: jnp.ndarray,  # [B, L] bool
        control: Dict[str, jnp.ndarray],  # pitch/energy/duration multipliers
        inference: bool = False,
        teacher_forcing: bool = False,
        deterministic: bool = True,
        max_target_len: Optional[int] = None,
    ) -> Dict[str, Any]:
        mcfg = self.config.model
        x = encoder_output
        energy_target = None if inference else batch["energy"]
        pitch_target = None if inference else batch["pitch"]
        duration_target = batch.get("duration")
        if max_target_len is None:
            max_target_len = (
                batch["mel"].shape[1] if batch.get("mel") is not None
                else mcfg.max_mel_length
            )

        attn_logprob = attn_soft = attn_hard = None
        training_like = teacher_forcing or not inference

        if training_like and mcfg.learn_alignment:
            attn_soft, attn_logprob = self.attention(
                batch["mel"],
                text_emb,
                key_mask=src_mask,
                attn_prior=batch.get("attn_prior"),
            )
            attn_hard, durations = mas_width1_batched(
                jnp.log(jnp.clip(attn_soft, 1e-20, None)),
                batch["src_lens"],
                batch["mel_lens"],
            )
            duration_target = durations
            if (
                energy_target is not None
                and mcfg.variance_predictors.energy.level == VarianceLevelEnum.phone
            ):
                energy_target = average_variance(energy_target, duration_target)
            if (
                pitch_target is not None
                and mcfg.variance_predictors.pitch.level == VarianceLevelEnum.phone
            ):
                pitch_target = average_variance(pitch_target, duration_target)

        energy_prediction = pitch_prediction = None
        if mcfg.variance_predictors.energy.level == VarianceLevelEnum.phone:
            energy_prediction, energy_embedding = self._variance_embedding(
                x, energy_target, src_mask, self.energy_predictor,
                self.energy_embedding, self.energy_bins, control["energy"],
                inference, deterministic,
            )
            x = x + energy_embedding
        if mcfg.variance_predictors.pitch.level == VarianceLevelEnum.phone:
            pitch_prediction, pitch_embedding = self._variance_embedding(
                x, pitch_target, src_mask, self.pitch_predictor,
                self.pitch_embedding, self.pitch_bins, control["pitch"],
                inference, deterministic,
            )
            x = x + pitch_embedding

        log_duration_prediction = self.duration_predictor(
            x, mask=src_mask, deterministic=deterministic
        )

        if training_like:
            x, tgt_mask, mel_lens = length_regulate(
                x, duration_target, max_target_len
            )
            duration_rounded = duration_target
        else:
            duration_rounded = jnp.clip(
                jnp.round(jnp.exp(log_duration_prediction) - 1.0)
                * control["duration"],
                0,
                None,
            ).astype(jnp.int32)
            duration_rounded = duration_rounded * src_mask.astype(jnp.int32)
            x, tgt_mask, mel_lens = length_regulate(
                x, duration_rounded, max_target_len
            )

        if mcfg.variance_predictors.energy.level == VarianceLevelEnum.frame:
            energy_prediction, energy_embedding = self._variance_embedding(
                x, energy_target, tgt_mask, self.energy_predictor,
                self.energy_embedding, self.energy_bins, control["energy"],
                inference, deterministic,
            )
            x = x + energy_embedding
        if mcfg.variance_predictors.pitch.level == VarianceLevelEnum.frame:
            pitch_prediction, pitch_embedding = self._variance_embedding(
                x, pitch_target, tgt_mask, self.pitch_predictor,
                self.pitch_embedding, self.pitch_bins, control["pitch"],
                inference, deterministic,
            )
            x = x + pitch_embedding

        return {
            "output": x,
            "attn_logprob": attn_logprob,
            "attn_soft": attn_soft,
            "attn_hard": attn_hard,
            "duration_prediction": log_duration_prediction,
            "duration_target": duration_target,
            "pitch_prediction": pitch_prediction,
            "pitch_target": pitch_target,
            "energy_prediction": energy_prediction,
            "energy_target": energy_target,
            "duration_rounded": duration_rounded,
            "target_mask": tgt_mask,
            "mel_lens": mel_lens,
        }
