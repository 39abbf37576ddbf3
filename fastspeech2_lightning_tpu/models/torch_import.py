"""Import reference PyTorch Lightning checkpoints into this framework.

Maps the reference FastSpeech2 state_dict (fs2/model.py module tree:
text_input_layer / torchaudio Conformer encoder+decoder / variance_adaptor /
mel_linear / postnet / speaker+language embeddings) onto our flax parameter
pytree, so teacher-forced numerical-parity evaluation and checkpoint
continuity are possible without retraining.

Weight-layout conventions:
 - torch Linear weight [out, in]    -> flax Dense kernel [in, out] (transpose)
 - torch Conv1d weight [out, in, k] -> flax Conv kernel [k, in, out]
 - torch depthwise Conv1d [C, 1, k] -> flax kernel [k, 1, C]
 - torch MHA in_proj_weight [3d, d] -> fused qkv kernel [d, 3d]
 - torchaudio layer names: conformer_layers.{i}.{ffn1,self_attn_layer_norm,
   self_attn,conv_module,ffn2,final_layer_norm}, with _FeedForwardModule
   .sequential indices (0 LN, 1 Linear, 4 Linear) and _ConvolutionModule
   .layer_norm + .sequential indices (0 pw, 2 dw, 3 BN, 5 pw).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


class TorchImportError(Exception):
    pass


def _t(sd: dict, key: str) -> np.ndarray:
    if key not in sd:
        raise TorchImportError(f"missing key in torch state_dict: {key}")
    v = sd[key]
    return np.asarray(v.numpy() if hasattr(v, "numpy") else v)


def _linear(sd, prefix):
    return {
        "kernel": _t(sd, f"{prefix}.weight").T,
        "bias": _t(sd, f"{prefix}.bias"),
    }


def _layernorm(sd, prefix):
    return {
        "scale": _t(sd, f"{prefix}.weight"),
        "bias": _t(sd, f"{prefix}.bias"),
    }


def _conv1d(sd, prefix, depthwise=False):
    w = _t(sd, f"{prefix}.weight")  # [out, in, k]
    kernel = np.transpose(w, (2, 1, 0))  # [k, in, out]
    out = {"kernel": kernel}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd, f"{prefix}.bias")
    return out


def _conformer_layer(sd, prefix) -> Tuple[dict, dict]:
    """(params, batch_stats) for one torchaudio _ConformerLayer."""

    def ffn(p):
        return {
            "norm": _layernorm(sd, f"{p}.sequential.0"),
            "linear1": _linear(sd, f"{p}.sequential.1"),
            "linear2": _linear(sd, f"{p}.sequential.4"),
        }

    in_w = _t(sd, f"{prefix}.self_attn.in_proj_weight")  # [3d, d]
    in_b = _t(sd, f"{prefix}.self_attn.in_proj_bias")
    attn = {
        "norm": _layernorm(sd, f"{prefix}.self_attn_layer_norm"),
        "qkv": {"kernel": in_w.T, "bias": in_b},
        "out": _linear(sd, f"{prefix}.self_attn.out_proj"),
    }
    cm = f"{prefix}.conv_module"
    conv = {
        "norm": _layernorm(sd, f"{cm}.layer_norm"),
        "pointwise1": {
            # torch Conv1d(d, 2d, 1) -> Dense
            "kernel": _t(sd, f"{cm}.sequential.0.weight")[:, :, 0].T,
            "bias": _t(sd, f"{cm}.sequential.0.bias"),
        },
        "depthwise": {
            # [C, 1, k] -> [k, 1, C]
            "kernel": np.transpose(_t(sd, f"{cm}.sequential.2.weight"), (2, 1, 0)),
            "bias": _t(sd, f"{cm}.sequential.2.bias"),
        },
        "bn": {
            "scale": _t(sd, f"{cm}.sequential.3.weight"),
            "bias": _t(sd, f"{cm}.sequential.3.bias"),
        },
        "pointwise2": {
            "kernel": _t(sd, f"{cm}.sequential.5.weight")[:, :, 0].T,
            "bias": _t(sd, f"{cm}.sequential.5.bias"),
        },
    }
    params = {
        "ffn1": ffn(f"{prefix}.ffn1"),
        "attn": attn,
        "conv": conv,
        "ffn2": ffn(f"{prefix}.ffn2"),
        "final_norm": _layernorm(sd, f"{prefix}.final_layer_norm"),
    }
    stats = {
        "conv": {
            "bn": {
                "mean": _t(sd, f"{cm}.sequential.3.running_mean"),
                "var": _t(sd, f"{cm}.sequential.3.running_var"),
            }
        }
    }
    return params, stats


def _conformer(sd, prefix, n_layers) -> Tuple[dict, dict]:
    params, stats = {}, {}
    for i in range(n_layers):
        p, s = _conformer_layer(sd, f"{prefix}.conformer_layers.{i}")
        params[f"layer_{i}"] = p
        stats[f"layer_{i}"] = s
    return params, stats


def _variance_predictor(sd, prefix, n_layers, depthwise=True) -> dict:
    """Reference VariancePredictor: conv.{i}.layers = Sequential(
    Transpose(conv), ReLU, LayerNorm, Dropout); then .linear
    (fs2/variance_adaptor.py:18-62, fs2/layers.py:20-48)."""
    out = {}
    for i in range(n_layers):
        lp = f"{prefix}.conv.{i}.layers"
        layer = {}
        if depthwise:
            layer["DepthwiseSeparableConv1d_0"] = {
                "depthwise": _conv1d(sd, f"{lp}.0.module.model.0"),
                "pointwise": _conv1d(sd, f"{lp}.0.module.model.1"),
            }
        else:
            layer["Conv_0"] = _conv1d(sd, f"{lp}.0.module")
        layer["LayerNorm_0"] = _layernorm(sd, f"{lp}.2")
        out[f"conv_{i}"] = layer
    out["linear"] = _linear(sd, f"{prefix}.linear")
    return out


def _conv_attention(sd, prefix) -> dict:
    """Reference ConvAttention 3xconv query encoder + 2-conv key encoder
    (fs2/attn/attention.py:122-151); ConvNorm wraps .conv."""
    return {
        "key_proj_0": {"Conv_0": _conv1d(sd, f"{prefix}.key_proj.0.conv")},
        "key_proj_1": {"Conv_0": _conv1d(sd, f"{prefix}.key_proj.2.conv")},
        "query_proj_0": {"Conv_0": _conv1d(sd, f"{prefix}.query_proj.0.conv")},
        "query_proj_1": {"Conv_0": _conv1d(sd, f"{prefix}.query_proj.2.conv")},
        "query_proj_2": {"Conv_0": _conv1d(sd, f"{prefix}.query_proj.4.conv")},
    }


def _gru_cell(sd, prefix) -> dict:
    """torch GRU layer 0 -> flax GRUCell params.

    torch: weight_ih_l0 [3H, in] rows ordered (r, z, n); weight_hh_l0 [3H, H];
    bias_ih/bias_hh [3H]. flax: ir/iz/in Dense [in, H] (+bias), hr/hz Dense
    [H, H] (no bias), hn Dense [H, H] (+bias). torch keeps separate b_ir/b_hr
    for r,z — they always add, so they fold into the flax i-side bias."""
    w_ih = _t(sd, f"{prefix}.weight_ih_l0")
    w_hh = _t(sd, f"{prefix}.weight_hh_l0")
    b_ih = _t(sd, f"{prefix}.bias_ih_l0")
    b_hh = _t(sd, f"{prefix}.bias_hh_l0")
    H = w_hh.shape[1]
    wir, wiz, win = w_ih[:H], w_ih[H : 2 * H], w_ih[2 * H :]
    whr, whz, whn = w_hh[:H], w_hh[H : 2 * H], w_hh[2 * H :]
    bir, biz, bin_ = b_ih[:H], b_ih[H : 2 * H], b_ih[2 * H :]
    bhr, bhz, bhn = b_hh[:H], b_hh[H : 2 * H], b_hh[2 * H :]
    return {
        "ir": {"kernel": wir.T, "bias": bir + bhr},
        "iz": {"kernel": wiz.T, "bias": biz + bhz},
        "in": {"kernel": win.T, "bias": bin_},
        "hr": {"kernel": whr.T},
        "hz": {"kernel": whz.T},
        "hn": {"kernel": whn.T, "bias": bhn},
    }


def _gst(sd, prefix) -> Tuple[dict, dict]:
    """ESPnet StyleEncoder -> our gst module (fs2/gst/model.py)."""
    ref_p: Dict = {}
    ref_s: Dict = {}
    for i in range(6):
        w = _t(sd, f"{prefix}.ref_enc.convs.{3 * i}.weight")  # [out,in,kh,kw]
        ref_p[f"conv_{i}"] = {"kernel": np.transpose(w, (2, 3, 1, 0))}
        bnp = f"{prefix}.ref_enc.convs.{3 * i + 1}"
        ref_p[f"bn_{i}"] = {
            "scale": _t(sd, f"{bnp}.weight"),
            "bias": _t(sd, f"{bnp}.bias"),
        }
        ref_s[f"bn_{i}"] = {
            "mean": _t(sd, f"{bnp}.running_mean"),
            "var": _t(sd, f"{bnp}.running_var"),
        }
    ref_p["gru"] = _gru_cell(sd, f"{prefix}.ref_enc.gru")
    stl = {
        "gst_embs": _t(sd, f"{prefix}.stl.gst_embs"),
        "linear_q": _linear(sd, f"{prefix}.stl.mha.linear_q"),
        "linear_k": _linear(sd, f"{prefix}.stl.mha.linear_k"),
        "linear_v": _linear(sd, f"{prefix}.stl.mha.linear_v"),
        "linear_out": _linear(sd, f"{prefix}.stl.mha.linear_out"),
    }
    return {"ref_enc": ref_p, "stl": stl}, {"ref_enc": ref_s}


def import_torch_fastspeech2(
    state_dict: dict,
    config,
) -> Tuple[dict, dict, List[str]]:
    """(params, batch_stats, warnings) from a reference state_dict.

    config: our FastSpeech2Config describing the same architecture."""
    sd = state_dict
    warnings: List[str] = []
    mcfg = config.model
    params: Dict = {}
    batch_stats: Dict = {}

    # text input layer
    if "text_input_layer.weight" in sd:
        w = _t(sd, "text_input_layer.weight")
        if (
            mcfg.target_text_representation_level.value == "phonological_features"
        ):
            params["text_input_layer"] = {"kernel": w.T}
        else:
            params["text_input_layer"] = {"embedding": w}

    enc_p, enc_s = _conformer(sd, "encoder", mcfg.encoder.layers)
    dec_p, dec_s = _conformer(sd, "decoder", mcfg.decoder.layers)
    params["encoder"], batch_stats["encoder"] = enc_p, enc_s
    params["decoder"], batch_stats["decoder"] = dec_p, dec_s

    va: Dict = {}
    vp = mcfg.variance_predictors
    for name, cfgv in (
        ("duration", vp.duration), ("pitch", vp.pitch), ("energy", vp.energy)
    ):
        va[f"{name}_predictor"] = _variance_predictor(
            sd, f"variance_adaptor.{name}_predictor", cfgv.n_layers, cfgv.depthwise
        )
    va["pitch_embedding"] = {
        "embedding": _t(sd, "variance_adaptor.pitch_embedding.weight")
    }
    va["energy_embedding"] = {
        "embedding": _t(sd, "variance_adaptor.energy_embedding.weight")
    }
    if mcfg.learn_alignment:
        va["attention"] = _conv_attention(sd, "variance_adaptor.attention")
    params["variance_adaptor"] = va

    params["mel_linear"] = _linear(sd, "mel_linear")

    if mcfg.use_postnet:
        pn: Dict = {}
        pn_stats: Dict = {}
        for i in range(5):
            pn[f"conv_{i}"] = _conv1d(sd, f"postnet.convolutions.{i}.0.conv")
            pn[f"bn_{i}"] = {
                "scale": _t(sd, f"postnet.convolutions.{i}.1.weight"),
                "bias": _t(sd, f"postnet.convolutions.{i}.1.bias"),
            }
            pn_stats[f"bn_{i}"] = {
                "mean": _t(sd, f"postnet.convolutions.{i}.1.running_mean"),
                "var": _t(sd, f"postnet.convolutions.{i}.1.running_var"),
            }
        params["postnet"] = pn
        batch_stats["postnet"] = pn_stats

    if mcfg.multispeaker and "speaker_embedding.weight" in sd:
        params["speaker_embedding"] = {
            "embedding": _t(sd, "speaker_embedding.weight")
        }
    if mcfg.multilingual and "language_embedding.weight" in sd:
        params["language_embedding"] = {
            "embedding": _t(sd, "language_embedding.weight")
        }
    if mcfg.use_global_style_token_module:
        gst_p, gst_s = _gst(sd, "gst")
        params["gst"] = gst_p
        batch_stats["gst"] = gst_s

    # account for unused reference keys (buffers we recompute, etc.)
    known_unused = [
        "position_embedding.inv_freq",
    ]
    for k in known_unused:
        if k not in sd:
            warnings.append(f"expected reference buffer not present: {k}")
    return params, batch_stats, warnings


def extract_constants(state_dict: dict) -> dict:
    """Bit-exact buffers for the 'constants' variable collection.

    The reference stores pitch_bins/energy_bins as (frozen) nn.Parameters
    (fs2/variance_adaptor.py:117-148); torch.linspace's f32 rounding differs
    from jnp.linspace in the last ulp, which flips torch.bucketize on
    boundary-exact variance targets — so imported checkpoints must carry
    their own bins rather than recompute them."""
    out: Dict = {}
    va: Dict = {}
    for name in ("pitch_bins", "energy_bins"):
        key = f"variance_adaptor.{name}"
        if key in state_dict:
            va[name] = _t(state_dict, key)
    if va:
        out["variance_adaptor"] = va
    return out


def import_torch_checkpoint(ckpt_path, config):
    """Load a reference Lightning .ckpt and convert its weights."""
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return import_torch_fastspeech2(sd, config)


def load_reference_lightning_checkpoint(ckpt_path):
    """Load a reference PyTorch Lightning ``.ckpt`` end to end.

    The reference embeds everything needed to reconstruct the model in the
    checkpoint itself: ``hyper_parameters`` carries the checkpoint-safe config
    dump, corpus stats, and the lang/speaker lookup tables (fs2/model.py:
    369-378 via ``save_hyperparameters``), ``model_info`` carries the
    name/version gate (fs2/model.py:270-351), and ``global_step`` the step
    baked into output filenames. This parses all of it, applies the same
    version gate + <1.2 symbol-table migration as the orbax load path, and
    converts the weights — so ``synthesize``/``Synthesizer`` accept a
    reference ``.ckpt`` file directly, no conversion step.

    Returns ``(config, stats, lang2id, speaker2id, variables, n_symbols,
    global_step, warnings)`` where ``variables`` holds params / batch_stats /
    constants (bit-exact pitch/energy bins from the checkpoint).
    """
    import torch

    from ..config import FastSpeech2Config
    from ..text.processor import (
        TextProcessor,
        get_symbols_from_symbol_dict,
        symbol_sorter,
    )
    from ..training.checkpoint import check_and_upgrade_checkpoint
    from ..type_definitions import Stats

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if not isinstance(ckpt, dict) or "state_dict" not in ckpt:
        raise TorchImportError(
            f"{ckpt_path} is not a Lightning checkpoint (no state_dict)"
        )
    hp = ckpt.get("hyper_parameters") or {}
    if "config" not in hp:
        raise TorchImportError(
            f"{ckpt_path} has no embedded config (hyper_parameters.config); "
            "pass weights through import_torch_checkpoint(path, config) instead"
        )
    config = FastSpeech2Config.model_validate(hp["config"])
    stats = Stats(**hp["stats"]) if hp.get("stats") else None
    lang2id = dict(hp.get("lang2id") or {})
    speaker2id = dict(hp.get("speaker2id") or {})

    sd = ckpt["state_dict"]
    params, batch_stats, warnings = import_torch_fastspeech2(sd, config)

    # version gate + migrations, shared with the orbax path
    ckpt_symbols = symbol_sorter(
        get_symbols_from_symbol_dict(
            (hp["config"].get("text") or {}).get("symbols") or {}
        )
    )
    current_symbols = TextProcessor(config.text).symbols
    meta = {
        "model_info": ckpt.get("model_info")
        or {"name": "FastSpeech2", "version": "1.0"},
        "config": hp["config"],
        "symbols": ckpt_symbols,
    }
    arrays = {"params": params}
    meta, arrays = check_and_upgrade_checkpoint(meta, arrays, current_symbols)
    params = arrays["params"]

    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    constants = extract_constants(sd)
    if constants:
        variables["constants"] = constants

    emb = params.get("text_input_layer", {}).get("embedding")
    n_symbols = int(emb.shape[0]) if emb is not None else len(current_symbols)
    return (
        config,
        stats,
        lang2id,
        speaker2id,
        variables,
        n_symbols,
        int(ckpt.get("global_step", 0)),
        warnings,
    )
