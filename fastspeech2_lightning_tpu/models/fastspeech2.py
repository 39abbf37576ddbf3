"""FastSpeech2 text-to-spec model.

Behavioral parity with fs2/model.py:41-268: text input layer (embedding, or
bias-free linear over phonological features), FastPitch positional embedding,
Conformer encoder, optional GST / speaker / language conditioning, variance
adaptor, Conformer decoder, mel linear, optional PostNet.

The module is a pure function of (params, batch, flags); training/inference
steps jit it with static shapes. The output dict carries the same 17 keys the
reference returns (fs2/model.py:251-268)."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..config import (
    FastSpeech2Config,
    TargetTrainingTextRepresentationLevel,
)
from ..type_definitions import Stats
from ..ops.masking import mask_from_lens
from .conformer import Conformer
from .gst import StyleEncoder
from .layers import PostNet, fastpitch_positional_embedding
from .variance_adaptor import VarianceAdaptor

FastSpeech2Output = Dict[str, Any]


class FastSpeech2(nn.Module):
    config: FastSpeech2Config
    stats: Optional[Stats]
    n_symbols: int
    n_speakers: int = 1
    n_languages: int = 1

    def setup(self):
        mcfg = self.config.model
        d = mcfg.encoder.input_dim
        dt = jnp.bfloat16 if mcfg.dtype == "bfloat16" else jnp.float32
        self.compute_dtype = dt
        if (
            mcfg.target_text_representation_level
            == TargetTrainingTextRepresentationLevel.phonological_features
        ):
            self.text_input_layer = nn.Dense(
                d, use_bias=False, name="text_input_layer", dtype=dt
            )
        else:
            self.text_input_layer = nn.Embed(
                self.n_symbols, d, name="text_input_layer", dtype=dt
            )
        if mcfg.use_global_style_token_module:
            # style embedding is added to encoder output, so its width must be
            # the encoder width (the reference's 256 default == its encoder dim)
            self.gst = StyleEncoder(
                idim=self.config.preprocessing.audio.n_mels,
                gst_token_dim=d,
                name="gst",
            )
        self.encoder = Conformer(
            num_layers=mcfg.encoder.layers,
            num_heads=mcfg.encoder.heads,
            ffn_dim=mcfg.encoder.feedforward_dim,
            conv_kernel_size=mcfg.encoder.conv_kernel_size,
            dropout=mcfg.encoder.dropout,
            attention_dropout=(
                -1.0 if mcfg.encoder.attention_dropout is None
                else mcfg.encoder.attention_dropout
            ),
            dtype=dt,
            name="encoder",
        )
        if self.stats is None:
            # Graceful degradation parity (fs2/model.py:103-108): a model
            # without corpus stats can still be constructed/inspected (e.g.
            # loading a checkpoint whose stats were stripped); any forward
            # pass fails with a clear error instead of an attribute crash.
            import logging

            logging.getLogger(__name__).error(
                "Model has no value for stats (missing stats.json or the "
                "checkpoint didn't save them); the variance adaptor cannot "
                "be initialized and forward passes will fail."
            )
            self.variance_adaptor = None
        else:
            self.variance_adaptor = VarianceAdaptor(
                self.config, self.stats, name="variance_adaptor"
            )
        self.decoder = Conformer(
            num_layers=mcfg.decoder.layers,
            num_heads=mcfg.decoder.heads,
            ffn_dim=mcfg.decoder.feedforward_dim,
            conv_kernel_size=mcfg.decoder.conv_kernel_size,
            dropout=mcfg.decoder.dropout,
            attention_dropout=(
                -1.0 if mcfg.decoder.attention_dropout is None
                else mcfg.decoder.attention_dropout
            ),
            dtype=dt,
            name="decoder",
        )
        self.mel_linear = nn.Dense(
            self.config.preprocessing.audio.n_mels, name="mel_linear", dtype=dt
        )
        if mcfg.use_postnet:
            self.postnet = PostNet(
                n_mel_channels=self.config.preprocessing.audio.n_mels,
                dtype=dt,
                name="postnet",
            )
        if mcfg.multispeaker:
            self.speaker_embedding = nn.Embed(
                self.n_speakers, d, name="speaker_embedding"
            )
        if mcfg.multilingual:
            self.language_embedding = nn.Embed(
                self.n_languages, d, name="language_embedding"
            )

    def __call__(
        self,
        batch: Dict[str, Any],
        control: Optional[Dict[str, jnp.ndarray]] = None,
        inference: bool = False,
        teacher_forcing: bool = False,
        deterministic: bool = True,
        max_target_len: Optional[int] = None,
    ) -> FastSpeech2Output:
        mcfg = self.config.model
        if control is None:
            control = {
                "pitch": jnp.float32(1.0),
                "energy": jnp.float32(1.0),
                "duration": jnp.float32(1.0),
            }

        src_lens = batch["src_lens"]
        if (
            mcfg.target_text_representation_level
            == TargetTrainingTextRepresentationLevel.phonological_features
        ):
            text_inputs = batch["pfs"]
            max_src_len = text_inputs.shape[1]
        else:
            text_inputs = batch["text"]
            max_src_len = text_inputs.shape[1]
        src_mask = mask_from_lens(src_lens, max_src_len)

        # Text embedding + FastPitch positional embedding (fs2/model.py:183-190)
        inputs = self.text_input_layer(text_inputs)
        positions = jnp.arange(max_src_len, dtype=jnp.float32)
        enc_pos = fastpitch_positional_embedding(
            positions, mcfg.encoder.input_dim, dtype=inputs.dtype
        )
        enc_pos = enc_pos[None, :, :] * src_mask[:, :, None].astype(inputs.dtype)

        x = self.encoder(inputs + enc_pos, src_mask, deterministic=deterministic)

        # Global style tokens (fs2/model.py:196-203)
        if mcfg.use_global_style_token_module:
            if inference and batch.get("mel_style_reference") is not None:
                style_embs = self.gst(
                    batch["mel_style_reference"], deterministic=deterministic
                )
            elif inference and not teacher_forcing:
                style_embs = self.gst.condition_on_gst_tokens(text_inputs.shape[0])
            else:
                style_embs = self.gst(batch["mel"], deterministic=deterministic)
            x = x + style_embs[:, None, :].astype(x.dtype)

        if mcfg.multispeaker:
            x = x + self.speaker_embedding(batch["speaker_id"])[:, None, :]
        if mcfg.multilingual:
            x = x + self.language_embedding(batch["language_id"])[:, None, :]

        if self.variance_adaptor is None:
            from ..exceptions import InvalidConfiguration

            raise InvalidConfiguration(
                "Cannot run the model forward: no variance adaptor because "
                "stats are missing (see fs2/model.py:103-108 semantics). "
                "Provide stats.json or a checkpoint that saved stats."
            )
        va = self.variance_adaptor(
            inputs,
            x,
            batch,
            src_mask,
            control,
            inference=inference,
            teacher_forcing=teacher_forcing,
            deterministic=deterministic,
            max_target_len=max_target_len,
        )

        mel_lens = va["mel_lens"] if (inference and not teacher_forcing) else batch["mel_lens"]
        tgt_mask = va["target_mask"]
        max_mel_len = va["output"].shape[1]

        dec_positions = jnp.arange(max_mel_len, dtype=jnp.float32)
        dec_pos = fastpitch_positional_embedding(
            dec_positions, mcfg.decoder.input_dim, dtype=x.dtype
        )
        dec_pos = dec_pos[None, :, :] * tgt_mask[:, :, None].astype(x.dtype)

        x = self.decoder(va["output"] + dec_pos, tgt_mask, deterministic=deterministic)
        # mel outputs in f32 (losses + vocoder handoff)
        output = self.mel_linear(x).astype(jnp.float32)

        postnet_output = None
        if mcfg.use_postnet:
            postnet_output = output + self.postnet(
                output, deterministic=deterministic
            ).astype(jnp.float32)

        return {
            "output": output,
            "postnet_output": postnet_output,
            "src_mask": src_mask,
            "src_lens": src_lens,
            "tgt_mask": tgt_mask,
            "tgt_lens": mel_lens,
            "attn_logprob": va["attn_logprob"],
            "attn_soft": va["attn_soft"],
            "attn_hard": va["attn_hard"],
            "duration_prediction": va["duration_prediction"],
            "duration_target": va["duration_target"],
            "duration_rounded": va["duration_rounded"],
            "energy_prediction": va["energy_prediction"],
            "energy_target": va["energy_target"],
            "pitch_prediction": va["pitch_prediction"],
            "pitch_target": va["pitch_target"],
            "text_input": text_inputs,
        }
