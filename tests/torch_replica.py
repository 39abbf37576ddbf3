"""Weight-compatible torch replica of the reference FastSpeech2 model.

Built from torch primitives to reproduce the reference's architecture AND its
state_dict key layout, so `models/torch_import.py` can consume this replica's
state_dict exactly as it would a real reference checkpoint. Used by
tests/test_full_model_parity.py to run the BASELINE.md acceptance gate
(teacher-forced full-forward mel agreement) entirely in-sandbox.

Semantics sources (all re-implemented, none copied):
 - model forward:        /root/reference/fs2/model.py:153-268
 - torchaudio Conformer: consumed at fs2/model.py:95-119; layer/param layout
   pinned in fastspeech2_lightning_tpu/models/torch_import.py:9-18
 - variance adaptor:     /root/reference/fs2/variance_adaptor.py:18-412
 - ConvAttention:        /root/reference/fs2/attn/attention.py:101-251
 - PositionalEmbedding / PostNet: /root/reference/fs2/layers.py:123-212
 - MAS binarization:     numpy golden (ops/mas.py:148), bit-exact vs the
   reference's numba kernel per tests/test_native.py

Scope: the TRAINING forward (inference=False) with learn_alignment — the path
the acceptance gate exercises. Dropout modules exist for state_dict parity
but the replica is used in eval() mode only.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn

from fastspeech2_lightning_tpu.ops.mas import mas_width1_numpy


# ---------------------------------------------------------------------------
# torchaudio-Conformer-compatible blocks
# ---------------------------------------------------------------------------


class _FeedForwardModule(nn.Module):
    def __init__(self, d, ffn_dim, dropout):
        super().__init__()
        self.sequential = nn.Sequential(
            nn.LayerNorm(d),
            nn.Linear(d, ffn_dim, bias=True),
            nn.SiLU(),
            nn.Dropout(dropout),
            nn.Linear(ffn_dim, d, bias=True),
            nn.Dropout(dropout),
        )

    def forward(self, x):
        return self.sequential(x)


class _ConvolutionModule(nn.Module):
    def __init__(self, d, kernel_size, dropout):
        super().__init__()
        self.layer_norm = nn.LayerNorm(d)
        self.sequential = nn.Sequential(
            nn.Conv1d(d, 2 * d, 1, bias=True),
            nn.GLU(dim=1),
            nn.Conv1d(
                d, d, kernel_size, padding=(kernel_size - 1) // 2, groups=d,
                bias=True,
            ),
            nn.BatchNorm1d(d),
            nn.SiLU(),
            nn.Conv1d(d, d, 1, bias=True),
            nn.Dropout(dropout),
        )

    def forward(self, x):  # [B, T, D]
        x = self.layer_norm(x)
        x = x.transpose(1, 2)
        x = self.sequential(x)
        return x.transpose(1, 2)


class _ConformerLayer(nn.Module):
    def __init__(self, d, ffn_dim, heads, kernel_size, dropout):
        super().__init__()
        self.ffn1 = _FeedForwardModule(d, ffn_dim, dropout)
        self.self_attn_layer_norm = nn.LayerNorm(d)
        self.self_attn = nn.MultiheadAttention(d, heads, dropout=dropout)
        self.self_attn_dropout = nn.Dropout(dropout)
        self.conv_module = _ConvolutionModule(d, kernel_size, dropout)
        self.ffn2 = _FeedForwardModule(d, ffn_dim, dropout)
        self.final_layer_norm = nn.LayerNorm(d)

    def forward(self, x, key_padding_mask):  # x: [T, B, D]
        residual = x
        x = self.ffn1(x)
        x = x * 0.5 + residual
        residual = x
        x = self.self_attn_layer_norm(x)
        x, _ = self.self_attn(
            x, x, x, key_padding_mask=key_padding_mask, need_weights=False
        )
        x = self.self_attn_dropout(x)
        x = x + residual
        residual = x
        x = x.transpose(0, 1)  # [B, T, D]
        x = self.conv_module(x)
        x = x.transpose(0, 1)
        x = residual + x
        residual = x
        x = self.ffn2(x)
        x = x * 0.5 + residual
        return self.final_layer_norm(x)


class Conformer(nn.Module):
    def __init__(self, d, heads, ffn_dim, n_layers, kernel_size, dropout):
        super().__init__()
        self.conformer_layers = nn.ModuleList(
            _ConformerLayer(d, ffn_dim, heads, kernel_size, dropout)
            for _ in range(n_layers)
        )

    def forward(self, x, lengths):  # x: [B, T, D]
        T = x.shape[1]
        pad_mask = (
            torch.arange(T, device=x.device)[None, :] >= lengths[:, None]
        )
        x = x.transpose(0, 1)
        for layer in self.conformer_layers:
            x = layer(x, pad_mask)
        return x.transpose(0, 1), lengths


# ---------------------------------------------------------------------------
# Variance adaptor blocks (reference names)
# ---------------------------------------------------------------------------


class _Transpose(nn.Module):
    def __init__(self, module):
        super().__init__()
        self.module = module

    def forward(self, x):
        return self.module(x.transpose(1, 2)).transpose(1, 2)


class _DepthwiseSeparableConv1d(nn.Module):
    def __init__(self, in_ch, out_ch, kernel_size):
        super().__init__()
        self.model = nn.Sequential(
            nn.Conv1d(
                in_ch, in_ch, kernel_size, padding=(kernel_size - 1) // 2,
                groups=in_ch,
            ),
            nn.Conv1d(in_ch, out_ch, 1),
        )

    def forward(self, x):
        return self.model(x)


class _VarianceConvolutionLayer(nn.Module):
    def __init__(self, in_ch, out_ch, kernel_size, dropout, depthwise):
        super().__init__()
        conv = _Transpose(
            _DepthwiseSeparableConv1d(in_ch, out_ch, kernel_size)
            if depthwise
            else nn.Conv1d(
                in_ch, out_ch, kernel_size, padding=(kernel_size - 1) // 2
            )
        )
        self.layers = nn.Sequential(
            conv, nn.ReLU(), nn.LayerNorm(out_ch), nn.Dropout(dropout)
        )

    def forward(self, x):
        return self.layers(x)


class _VariancePredictor(nn.Module):
    def __init__(self, input_dim, n_layers, n_channels, kernel_size, dropout,
                 depthwise):
        super().__init__()
        self.conv = nn.ModuleList()
        for i in range(n_layers):
            in_ch = input_dim if i == 0 else n_channels
            self.conv.append(
                _VarianceConvolutionLayer(
                    in_ch, n_channels, kernel_size, dropout, depthwise
                )
            )
        self.linear = nn.Linear(n_channels, 1)

    def forward(self, x, mask=None):
        for m in self.conv:
            x = m(x)
        out = self.linear(x).squeeze(-1)
        if mask is not None:
            out = out * mask
        return out


class _ConvNorm(nn.Module):
    def __init__(self, in_ch, out_ch, kernel_size=1):
        super().__init__()
        self.conv = nn.Conv1d(
            in_ch, out_ch, kernel_size, padding=(kernel_size - 1) // 2
        )

    def forward(self, x):
        return self.conv(x)


class _ConvAttention(nn.Module):
    """3xconv query encoder variant (the model's default path)."""

    def __init__(self, n_mel_channels, n_text_channels, n_att_channels=80):
        super().__init__()
        self.key_proj = nn.Sequential(
            _ConvNorm(n_text_channels, n_text_channels * 2, 3),
            nn.ReLU(),
            _ConvNorm(n_text_channels * 2, n_att_channels, 1),
        )
        self.query_proj = nn.Sequential(
            _ConvNorm(n_mel_channels, n_mel_channels * 2, 3),
            nn.ReLU(),
            _ConvNorm(n_mel_channels * 2, n_mel_channels, 1),
            nn.ReLU(),
            _ConvNorm(n_mel_channels, n_att_channels, 1),
        )

    def forward(self, queries, keys, mask=None, attn_prior=None):
        # queries: [B, n_mels, T_mel], keys: [B, C, T_text],
        # mask: [B, T_text, 1] True where INVALID
        keys_enc = self.key_proj(keys)
        queries_enc = self.query_proj(queries)
        attn = (queries_enc[:, :, :, None] - keys_enc[:, :, None]) ** 2
        attn = -0.0005 * attn.sum(1, keepdim=True)  # [B, 1, T_mel, T_text]
        if attn_prior is not None:
            attn = F.log_softmax(attn, dim=3) + torch.log(
                attn_prior[:, None] + 1e-8
            )
        attn_logprob = attn.clone()
        if mask is not None:
            attn.data.masked_fill_(
                mask.permute(0, 2, 1).unsqueeze(2), -float("inf")
            )
        attn = F.softmax(attn, dim=3)
        return attn, attn_logprob


class _LengthRegulator(nn.Module):
    def forward(self, x, durations, max_length):
        repeated = [
            torch.repeat_interleave(x[i], durations[i], dim=0)
            for i in range(x.shape[0])
        ]
        lengths = torch.IntTensor([t.shape[0] for t in repeated])
        max_length = min(int(lengths.max()), int(max_length))
        mask = (
            torch.arange(max_length)[None, :].expand(len(lengths), max_length)
            < lengths[:, None]
        )
        out = nn.utils.rnn.pad_sequence(repeated, batch_first=True)
        return out[:, :max_length], mask


class _VarianceAdaptor(nn.Module):
    def __init__(self, cfg, stats, n_mels):
        super().__init__()
        vp = cfg.model.variance_predictors
        d = cfg.model.encoder.input_dim

        def predictor(v):
            return _VariancePredictor(
                d, v.n_layers, v.input_dim, v.kernel_size, v.dropout,
                v.depthwise,
            )

        self.duration_predictor = predictor(vp.duration)
        self.length_regulator = _LengthRegulator()
        self.pitch_predictor = predictor(vp.pitch)
        self.pitch_embedding = nn.Embedding(vp.pitch.n_bins, vp.pitch.input_dim)
        self.pitch_bins = nn.Parameter(
            torch.linspace(
                stats.pitch.norm_min, stats.pitch.norm_max, vp.pitch.n_bins - 1
            ),
            requires_grad=False,
        )
        self.energy_predictor = predictor(vp.energy)
        self.energy_embedding = nn.Embedding(
            vp.energy.n_bins, vp.energy.input_dim
        )
        self.energy_bins = nn.Parameter(
            torch.linspace(
                stats.energy.norm_min, stats.energy.norm_max,
                vp.energy.n_bins - 1,
            ),
            requires_grad=False,
        )
        if cfg.model.learn_alignment:
            # the reference leaves n_att_channels at its default of 80
            # regardless of n_mels (fs2/variance_adaptor.py:151-158)
            self.attention = _ConvAttention(n_mels, d, n_att_channels=80)
        self.cfg = cfg

    def binarize_attention(self, attn, in_lens, out_lens):
        B = attn.shape[0]
        out = np.zeros(attn.shape, dtype=np.float32)
        log_attn = torch.log(attn.data).cpu().float().numpy()
        for i in range(B):
            T, L = int(out_lens[i]), int(in_lens[i])
            out[i, 0, :T, :L] = mas_width1_numpy(log_attn[i, 0, :T, :L])
        return torch.tensor(out, dtype=attn.dtype)

    @staticmethod
    def average_variance(var, durs):
        ends = torch.cumsum(durs, dim=1).long()
        starts = F.pad(ends[:, :-1], (1, 0))
        nz_cums = F.pad(torch.cumsum(var != 0.0, dim=1), (1, 0))
        cums = F.pad(torch.cumsum(var, dim=1), (1, 0))
        sums = (
            torch.gather(cums, 1, ends) - torch.gather(cums, 1, starts)
        ).float()
        nelems = (
            torch.gather(nz_cums, 1, ends) - torch.gather(nz_cums, 1, starts)
        ).float()
        return torch.where(nelems == 0.0, nelems, sums / nelems)

    def _variance_embedding(self, x, target, mask, predictor, embedding, bins):
        prediction = predictor(x, mask)
        buckets = torch.bucketize(target, bins)
        return prediction, embedding(buckets)

    def forward(self, text_emb, encoder_output, batch, src_mask):
        """Training path (inference=False), learn_alignment on."""
        cfg = self.cfg
        x = encoder_output.clone()
        energy_target = batch["energy"]
        pitch_target = batch["pitch"]
        max_target_len = batch["max_mel_len"]

        attn_mask = src_mask[..., None] == 0
        attn_soft, attn_logprob = self.attention(
            batch["mel"].transpose(1, 2),
            text_emb.transpose(1, 2),
            mask=attn_mask,
            attn_prior=batch["duration"],  # the prior rides the duration key
        )
        attn_hard = self.binarize_attention(
            attn_soft, batch["src_lens"], batch["mel_lens"]
        )
        duration_target = attn_hard.sum(2)[:, 0, :].int()
        if cfg.model.variance_predictors.energy.level.value == "phone":
            energy_target = self.average_variance(energy_target, duration_target)
        if cfg.model.variance_predictors.pitch.level.value == "phone":
            pitch_target = self.average_variance(pitch_target, duration_target)

        energy_prediction = pitch_prediction = None
        if cfg.model.variance_predictors.energy.level.value == "phone":
            energy_prediction, emb = self._variance_embedding(
                x, energy_target, src_mask, self.energy_predictor,
                self.energy_embedding, self.energy_bins,
            )
            x = x + emb
        if cfg.model.variance_predictors.pitch.level.value == "phone":
            pitch_prediction, emb = self._variance_embedding(
                x, pitch_target, src_mask, self.pitch_predictor,
                self.pitch_embedding, self.pitch_bins,
            )
            x = x + emb

        log_duration_prediction = self.duration_predictor(x, mask=src_mask)
        x, tgt_mask = self.length_regulator(
            x, duration_target, max_length=max_target_len
        )

        if cfg.model.variance_predictors.energy.level.value == "frame":
            energy_prediction, emb = self._variance_embedding(
                x, energy_target, tgt_mask, self.energy_predictor,
                self.energy_embedding, self.energy_bins,
            )
            x = x + emb
        if cfg.model.variance_predictors.pitch.level.value == "frame":
            pitch_prediction, emb = self._variance_embedding(
                x, pitch_target, tgt_mask, self.pitch_predictor,
                self.pitch_embedding, self.pitch_bins,
            )
            x = x + emb

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
            "target_mask": tgt_mask,
        }


class _PositionalEmbedding(nn.Module):
    def __init__(self, dim):
        super().__init__()
        inv_freq = 1.0 / (10000 ** (torch.arange(0.0, dim, 2.0) / dim))
        self.register_buffer("inv_freq", inv_freq)

    def forward(self, pos_seq):
        sinusoid = torch.matmul(pos_seq[:, None], self.inv_freq[None, :])
        return torch.cat([sinusoid.sin(), sinusoid.cos()], dim=1)[None]


class _PostNet(nn.Module):
    def __init__(self, n_mels, dim=512, kernel=5, n_convs=5):
        super().__init__()
        self.convolutions = nn.ModuleList()
        for i in range(n_convs):
            in_ch = n_mels if i == 0 else dim
            out_ch = n_mels if i == n_convs - 1 else dim
            self.convolutions.append(
                nn.Sequential(
                    _ConvNorm(in_ch, out_ch, kernel),
                    nn.BatchNorm1d(out_ch),
                )
            )

    def forward(self, x):
        x = x.transpose(1, 2)
        for conv in self.convolutions[:-1]:
            x = F.dropout(torch.tanh(conv(x)), 0.5, self.training)
        x = F.dropout(self.convolutions[-1](x), 0.5, self.training)
        return x.transpose(1, 2)


class TorchReferenceFastSpeech2(nn.Module):
    """The full reference model, training-path forward, reference names."""

    def __init__(self, cfg, stats, n_symbols, n_speakers=1, n_languages=1):
        super().__init__()
        d = cfg.model.encoder.input_dim
        n_mels = cfg.preprocessing.audio.n_mels
        self.cfg = cfg
        self.text_input_layer = nn.Embedding(n_symbols, d, padding_idx=0)
        self.position_embedding = _PositionalEmbedding(d)
        self.encoder = Conformer(
            d, cfg.model.encoder.heads, cfg.model.encoder.feedforward_dim,
            cfg.model.encoder.layers, cfg.model.encoder.conv_kernel_size,
            cfg.model.encoder.dropout,
        )
        self.variance_adaptor = _VarianceAdaptor(cfg, stats, n_mels)
        self.decoder = Conformer(
            cfg.model.decoder.input_dim, cfg.model.decoder.heads,
            cfg.model.decoder.feedforward_dim, cfg.model.decoder.layers,
            cfg.model.decoder.conv_kernel_size, cfg.model.decoder.dropout,
        )
        self.mel_linear = nn.Linear(cfg.model.decoder.input_dim, n_mels)
        if cfg.model.use_postnet:
            self.postnet = _PostNet(n_mels)
        if cfg.model.multispeaker:
            self.speaker_embedding = nn.Embedding(n_speakers, d)
        if cfg.model.multilingual:
            self.language_embedding = nn.Embedding(n_languages, d)

    def forward(self, batch):
        cfg = self.cfg
        src_lens = batch["src_lens"]
        max_src_len = batch["max_src_len"]
        src_mask = (
            torch.arange(max_src_len)[None, :] < src_lens[:, None]
        )  # bool [B, L]
        inputs = self.text_input_layer(batch["text"])
        pos_seq = torch.arange(max_src_len, dtype=inputs.dtype)
        pos_emb = self.position_embedding(pos_seq) * src_mask.unsqueeze(2)
        x, _ = self.encoder(inputs + pos_emb, src_lens)
        if cfg.model.multispeaker:
            x = x + self.speaker_embedding(batch["speaker_id"]).unsqueeze(1)
        if cfg.model.multilingual:
            x = x + self.language_embedding(batch["language_id"]).unsqueeze(1)
        va = self.variance_adaptor(inputs, x, batch, src_mask)

        mel_lens = batch["mel_lens"]
        max_mel_len = batch["max_mel_len"]
        dec_pos_seq = torch.arange(max_mel_len).to(batch["mel"].dtype)
        dec_pos = self.position_embedding(dec_pos_seq) * va[
            "target_mask"
        ].unsqueeze(2)
        x, _ = self.decoder(va["output"] + dec_pos, mel_lens)
        output = self.mel_linear(x)
        postnet_output = None
        if cfg.model.use_postnet:
            postnet_output = output + self.postnet(output)
        return dict(
            va,
            output=output,
            postnet_output=postnet_output,
            src_mask=src_mask,
        )
