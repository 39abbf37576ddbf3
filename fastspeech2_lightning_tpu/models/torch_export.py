"""Export checkpoints trained here back to reference Lightning .ckpt files.

The exact inverse of models/torch_import.py: maps our flax parameter pytree
onto the reference FastSpeech2 state_dict layout (fs2/model.py module tree,
torchaudio Conformer layer names) and assembles a full PyTorch Lightning
checkpoint dict — ``state_dict`` + ``hyper_parameters{config, stats, lang2id,
speaker2id}`` + ``model_info`` + ``global_step`` (what the reference's
``save_hyperparameters``/``on_save_checkpoint`` persist, fs2/model.py:369-378).
A model trained on TPU here can then be served by the reference/EveryVoice
stack unchanged.

Weight-layout inverses (see torch_import.py for the forward direction):
 - flax Dense kernel [in, out]   -> torch Linear weight [out, in]
 - flax Conv kernel [k, in, out] -> torch Conv1d weight [out, in, k]
 - fused qkv kernel [d, 3d]      -> torch MHA in_proj_weight [3d, d]
 - flax GRUCell gates            -> torch GRU l0 weights; the import folds
   torch's always-added (bias_ih + bias_hh) r/z biases into the flax i-side
   bias, so the export puts the whole sum back into bias_ih and zeros the
   r/z rows of bias_hh — numerically identical for torch's GRU.

BatchNorm ``num_batches_tracked`` buffers are emitted as 0 (they only drive
torch's momentum=None averaging mode, which the reference does not use).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from .torch_import import TorchImportError


def _f32(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _lin(out: dict, prefix: str, p: dict) -> None:
    out[f"{prefix}.weight"] = _f32(p["kernel"]).T
    if "bias" in p:
        out[f"{prefix}.bias"] = _f32(p["bias"])


def _ln(out: dict, prefix: str, p: dict) -> None:
    out[f"{prefix}.weight"] = _f32(p["scale"])
    out[f"{prefix}.bias"] = _f32(p["bias"])


def _conv1d(out: dict, prefix: str, p: dict) -> None:
    out[f"{prefix}.weight"] = np.transpose(_f32(p["kernel"]), (2, 1, 0))
    if "bias" in p:
        out[f"{prefix}.bias"] = _f32(p["bias"])


def _bn(out: dict, prefix: str, p: dict, s: Optional[dict]) -> None:
    out[f"{prefix}.weight"] = _f32(p["scale"])
    out[f"{prefix}.bias"] = _f32(p["bias"])
    n = _f32(p["scale"]).shape[0]
    mean = s["mean"] if s else np.zeros(n, np.float32)
    var = s["var"] if s else np.ones(n, np.float32)
    out[f"{prefix}.running_mean"] = _f32(mean)
    out[f"{prefix}.running_var"] = _f32(var)
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def _conformer_layer(out: dict, prefix: str, p: dict, s: dict) -> None:
    def ffn(tp, fp):
        _ln(out, f"{tp}.sequential.0", fp["norm"])
        _lin(out, f"{tp}.sequential.1", fp["linear1"])
        _lin(out, f"{tp}.sequential.4", fp["linear2"])

    ffn(f"{prefix}.ffn1", p["ffn1"])
    _ln(out, f"{prefix}.self_attn_layer_norm", p["attn"]["norm"])
    out[f"{prefix}.self_attn.in_proj_weight"] = _f32(p["attn"]["qkv"]["kernel"]).T
    out[f"{prefix}.self_attn.in_proj_bias"] = _f32(p["attn"]["qkv"]["bias"])
    _lin(out, f"{prefix}.self_attn.out_proj", p["attn"]["out"])
    cm = f"{prefix}.conv_module"
    conv = p["conv"]
    _ln(out, f"{cm}.layer_norm", conv["norm"])
    # pointwise convs travel as Dense in our tree: kernel [in, out] -> [out, in, 1]
    out[f"{cm}.sequential.0.weight"] = _f32(conv["pointwise1"]["kernel"]).T[:, :, None]
    out[f"{cm}.sequential.0.bias"] = _f32(conv["pointwise1"]["bias"])
    out[f"{cm}.sequential.2.weight"] = np.transpose(
        _f32(conv["depthwise"]["kernel"]), (2, 1, 0)
    )
    out[f"{cm}.sequential.2.bias"] = _f32(conv["depthwise"]["bias"])
    _bn(out, f"{cm}.sequential.3", conv["bn"], s.get("conv", {}).get("bn"))
    out[f"{cm}.sequential.5.weight"] = _f32(conv["pointwise2"]["kernel"]).T[:, :, None]
    out[f"{cm}.sequential.5.bias"] = _f32(conv["pointwise2"]["bias"])
    ffn(f"{prefix}.ffn2", p["ffn2"])
    _ln(out, f"{prefix}.final_layer_norm", p["final_norm"])


def _variance_predictor(out: dict, prefix: str, p: dict, depthwise: bool) -> None:
    i = 0
    while f"conv_{i}" in p:
        layer = p[f"conv_{i}"]
        lp = f"{prefix}.conv.{i}.layers"
        if depthwise:
            dsc = layer["DepthwiseSeparableConv1d_0"]
            _conv1d(out, f"{lp}.0.module.model.0", dsc["depthwise"])
            _conv1d(out, f"{lp}.0.module.model.1", dsc["pointwise"])
        else:
            _conv1d(out, f"{lp}.0.module", layer["Conv_0"])
        _ln(out, f"{lp}.2", layer["LayerNorm_0"])
        i += 1
    _lin(out, f"{prefix}.linear", p["linear"])


def _conv_attention(out: dict, prefix: str, p: dict) -> None:
    _conv1d(out, f"{prefix}.key_proj.0.conv", p["key_proj_0"]["Conv_0"])
    _conv1d(out, f"{prefix}.key_proj.2.conv", p["key_proj_1"]["Conv_0"])
    _conv1d(out, f"{prefix}.query_proj.0.conv", p["query_proj_0"]["Conv_0"])
    _conv1d(out, f"{prefix}.query_proj.2.conv", p["query_proj_1"]["Conv_0"])
    _conv1d(out, f"{prefix}.query_proj.4.conv", p["query_proj_2"]["Conv_0"])


def _gru(out: dict, prefix: str, p: dict) -> None:
    w_ih = np.concatenate(
        [_f32(p["ir"]["kernel"]).T, _f32(p["iz"]["kernel"]).T, _f32(p["in"]["kernel"]).T]
    )
    w_hh = np.concatenate(
        [_f32(p["hr"]["kernel"]).T, _f32(p["hz"]["kernel"]).T, _f32(p["hn"]["kernel"]).T]
    )
    H = _f32(p["hr"]["kernel"]).shape[0]
    out[f"{prefix}.weight_ih_l0"] = w_ih
    out[f"{prefix}.weight_hh_l0"] = w_hh
    out[f"{prefix}.bias_ih_l0"] = np.concatenate(
        [_f32(p["ir"]["bias"]), _f32(p["iz"]["bias"]), _f32(p["in"]["bias"])]
    )
    out[f"{prefix}.bias_hh_l0"] = np.concatenate(
        [np.zeros(H, np.float32), np.zeros(H, np.float32), _f32(p["hn"]["bias"])]
    )


def _gst(out: dict, prefix: str, p: dict, s: dict) -> None:
    ref_p, ref_s = p["ref_enc"], s.get("ref_enc", {})
    for i in range(6):
        out[f"{prefix}.ref_enc.convs.{3 * i}.weight"] = np.transpose(
            _f32(ref_p[f"conv_{i}"]["kernel"]), (3, 2, 0, 1)
        )
        _bn(out, f"{prefix}.ref_enc.convs.{3 * i + 1}", ref_p[f"bn_{i}"],
            ref_s.get(f"bn_{i}"))
    _gru(out, f"{prefix}.ref_enc.gru", ref_p["gru"])
    stl = p["stl"]
    out[f"{prefix}.stl.gst_embs"] = _f32(stl["gst_embs"])
    for name in ("linear_q", "linear_k", "linear_v", "linear_out"):
        _lin(out, f"{prefix}.stl.mha.{name}", stl[name])


def export_torch_fastspeech2(
    params: dict,
    batch_stats: Optional[dict],
    config,
    constants: Optional[dict] = None,
    stats=None,
) -> Dict[str, np.ndarray]:
    """Our (params, batch_stats, constants) -> reference state_dict (numpy).

    The exact inverse of import_torch_fastspeech2: round-tripping is
    bit-exact (transposes only). pitch/energy bins come from the 'constants'
    collection when present (bit-exact torch.linspace values from an imported
    checkpoint) and are recomputed from stats otherwise (np.linspace — equal
    to torch.linspace up to the last ulp)."""
    mcfg = config.model
    batch_stats = batch_stats or {}
    sd: Dict[str, np.ndarray] = {}

    if getattr(mcfg, "align_query_enc_type", "3xconv") == "inv_conv":
        raise TorchImportError(
            "export of the inv_conv aligner query encoder is not supported "
            "(the reference's LU-parameterized variant has no stable "
            "state_dict mapping here); retrain with the default 3xconv."
        )

    tl = params["text_input_layer"]
    if "embedding" in tl:
        sd["text_input_layer.weight"] = _f32(tl["embedding"])
    else:  # pfs mode: bias-free Linear (fs2/model.py:72-89)
        sd["text_input_layer.weight"] = _f32(tl["kernel"]).T

    d = mcfg.encoder.input_dim
    sd["position_embedding.inv_freq"] = (
        1.0 / (10000.0 ** (np.arange(0.0, d, 2.0, dtype=np.float32) / d))
    ).astype(np.float32)

    for name, n_layers in (("encoder", mcfg.encoder.layers),
                           ("decoder", mcfg.decoder.layers)):
        for i in range(n_layers):
            _conformer_layer(
                sd,
                f"{name}.conformer_layers.{i}",
                params[name][f"layer_{i}"],
                (batch_stats.get(name) or {}).get(f"layer_{i}", {}),
            )

    va = params["variance_adaptor"]
    vp = mcfg.variance_predictors
    for name, cfgv in (("duration", vp.duration), ("pitch", vp.pitch),
                       ("energy", vp.energy)):
        _variance_predictor(
            sd, f"variance_adaptor.{name}_predictor",
            va[f"{name}_predictor"], cfgv.depthwise,
        )
    sd["variance_adaptor.pitch_embedding.weight"] = _f32(
        va["pitch_embedding"]["embedding"]
    )
    sd["variance_adaptor.energy_embedding.weight"] = _f32(
        va["energy_embedding"]["embedding"]
    )
    cva = (constants or {}).get("variance_adaptor", {})
    for name, cfgv, st in (("pitch", vp.pitch, getattr(stats, "pitch", None)),
                           ("energy", vp.energy, getattr(stats, "energy", None))):
        if f"{name}_bins" in cva:
            sd[f"variance_adaptor.{name}_bins"] = _f32(cva[f"{name}_bins"])
        elif st is not None:
            sd[f"variance_adaptor.{name}_bins"] = np.linspace(
                st.norm_min, st.norm_max, cfgv.n_bins - 1, dtype=np.float32
            )
    if mcfg.learn_alignment:
        _conv_attention(sd, "variance_adaptor.attention", va["attention"])

    _lin(sd, "mel_linear", params["mel_linear"])

    if mcfg.use_postnet:
        pn = params["postnet"]
        pn_s = batch_stats.get("postnet", {})
        for i in range(5):
            _conv1d(sd, f"postnet.convolutions.{i}.0.conv", pn[f"conv_{i}"])
            _bn(sd, f"postnet.convolutions.{i}.1", pn[f"bn_{i}"],
                pn_s.get(f"bn_{i}"))

    if mcfg.multispeaker and "speaker_embedding" in params:
        sd["speaker_embedding.weight"] = _f32(
            params["speaker_embedding"]["embedding"]
        )
    if mcfg.multilingual and "language_embedding" in params:
        sd["language_embedding.weight"] = _f32(
            params["language_embedding"]["embedding"]
        )
    if mcfg.use_global_style_token_module and "gst" in params:
        _gst(sd, "gst", params["gst"], batch_stats.get("gst", {}))
    return sd


def export_reference_lightning_checkpoint(ckpt_path, out_path):
    """Orbax checkpoint directory (step=N/) -> reference Lightning .ckpt.

    Assembles hyper_parameters{config, stats, lang2id, speaker2id},
    model_info{name, version}, global_step, and the converted state_dict,
    saved with torch.save — loadable by the reference's
    FastSpeech2.load_from_checkpoint."""
    from pathlib import Path

    import torch

    from ..training.checkpoint import load_checkpoint

    meta, arrays = load_checkpoint(Path(ckpt_path))
    from ..config import FastSpeech2Config
    from ..type_definitions import Stats

    config = FastSpeech2Config.model_validate(meta["config"])
    stats = Stats(**meta["stats"]) if meta.get("stats") else None
    sd = export_torch_fastspeech2(
        arrays["params"],
        arrays.get("batch_stats"),
        config,
        constants=arrays.get("constants"),
        stats=stats,
    )
    ckpt = {
        "state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                       for k, v in sd.items()},
        "hyper_parameters": {
            "config": meta["config"],
            "stats": meta.get("stats"),
            "lang2id": meta.get("lang2id", {}),
            "speaker2id": meta.get("speaker2id", {}),
        },
        "model_info": meta.get(
            "model_info", {"name": "FastSpeech2", "version": "1.2"}
        ),
        "global_step": int(meta.get("global_step", 0)),
    }
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    torch.save(ckpt, out_path)
    return out_path
