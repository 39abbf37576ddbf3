"""HiFiGAN generator (inference-only vocoder handoff).

The reference hands predicted mels to the everyvoice HiFiGAN
(`load_hifigan_from_checkpoint` + `synthesize_data`, fs2/model.py:11-14,
fs2/prediction_writing_callback.py:656-681). Here the V1 generator runs as a
pure JAX function; `load_torch_hifigan` converts a canonical HiFiGAN torch
state_dict (conv_pre / ups.N / resblocks.N.convsM.K / conv_post, with
weight-norm g/v pairs folded) into the parameter pytree.

All convs are NWC; transposed convs are expressed as input-dilated convs
(`lax.conv_general_dilated` with lhs_dilation=stride), matching torch's
ConvTranspose1d(k, stride=u, padding=(k-u)//2) output length T*u exactly."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1


@dataclasses.dataclass
class HiFiGANConfig:
    resblock: str = "1"
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5),
        (1, 3, 5),
        (1, 3, 5),
    )
    n_mels: int = 80
    sampling_rate: int = 22050
    hop_size: int = 256

    @property
    def total_upsampling(self) -> int:
        out = 1
        for u in self.upsample_rates:
            out *= u
        return out

    @property
    def receptive_margin_frames(self) -> int:
        """One-sided receptive field of the generator, in mel frames
        (ceil). A mel slice with this much context on each side produces
        output identical to vocoding the full signal in the interior
        region — the contract the windowed/streaming vocoder
        (synthesis/streaming.py) is built on."""
        import math

        rate = 1.0  # output samples per mel frame at the current depth
        margin = 3.0  # conv_pre k=7 -> (7-1)/2 frames
        for u, k in zip(self.upsample_rates, self.upsample_kernel_sizes):
            # ConvTranspose1d(k, stride=u, padding=p): output o draws on
            # inputs i with o = i*u + j - p, j in [0, k) -> reach is
            # max(p, k-1-p)/u input units on a side
            p = (k - u) // 2
            margin += math.ceil(max(p, k - 1 - p) / u) / rate
            rate *= u
            # widest of the parallel resblocks at the upsampled rate;
            # sequential convs inside a block accumulate reach
            reach = 0
            for rk, dils in zip(
                self.resblock_kernel_sizes, self.resblock_dilation_sizes
            ):
                half = (rk - 1) // 2
                if self.resblock == "1":
                    r = sum(half * d + half for d in dils)
                else:
                    r = sum(half * d for d in dils)
                reach = max(reach, r)
            margin += reach / rate
        margin += 3.0 / rate  # conv_post k=7
        return int(math.ceil(margin))


def _conv1d(x, w, b, dilation: int = 1):
    """x [B, T, Cin], w [K, Cin, Cout] -> [B, T, Cout], SAME padding."""
    K = w.shape[0]
    pad = (K - 1) * dilation // 2
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1,),
        padding=[(pad, (K - 1) * dilation - pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + b


def _conv_transpose1d_dilated(x, w, b, stride: int):
    """torch ConvTranspose1d(k, stride=u, padding=(k-u)//2) parity via an
    input-dilated conv. x [B, T, Cin], w [K, Cin, Cout] -> [B, T*stride,
    Cout]. Kept as the golden/fallback implementation: XLA executes the
    dilated input literally, so (stride-1)/stride of the MACs multiply
    zeros — the polyphase form below does the same math without them."""
    K = w.shape[0]
    p = (K - stride) // 2
    # conv_transpose == conv(dilate(x, s), flip(w)) padded by k-1-p per side:
    # out = (T-1)s + 1 + 2(k-1-p) - (k-1) = T*s when k-s is even
    pad = K - 1 - p
    out = jax.lax.conv_general_dilated(
        x,
        jnp.flip(w, axis=0),
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + b


def _polyphase_taps(K: int, stride: int):
    """Tap placement for the polyphase form of ConvTranspose1d(K, stride,
    padding=(K-stride)//2).

    out[n*s + r] = sum_t x[n + q_r - t] * w[j0_r + t*s]  with
    j0_r = (r + p) mod s, q_r = (r + p - j0_r) // s — each output phase r is
    an ordinary stride-1 conv of x with the ~ceil(K/s) kernel taps congruent
    to (r+p) mod s. Returns (lo, hi, placements) where placements is a list
    of (window_index, j, r): original tap j contributes to phase r at window
    offset (q_r - t) - lo."""
    p = (K - stride) // 2
    placements = []
    offsets = []
    for r in range(stride):
        j0 = (r + p) % stride
        q = (r + p - j0) // stride
        t = 0
        j = j0
        while j < K:
            d = q - t  # input offset relative to n
            offsets.append(d)
            placements.append((d, j, r))
            t += 1
            j += stride
    lo, hi = min(offsets), max(offsets)
    return lo, hi, placements


def _conv_transpose1d_polyphase(x, w, b, stride: int):
    """torch ConvTranspose1d(k, stride=u, padding=(k-u)//2) parity, computed
    in polyphase form: one stride-1 conv with a [Wk, Cin, stride*Cout]
    rearranged kernel followed by a reshape interleave. Identical output to
    the input-dilated form (tested incl. grads), with ~K/stride taps of real
    work per output instead of K taps over a mostly-zero dilated input.

    MEASURED NEGATIVE RESULT on v5e (2026-08-18, B=8, 256 mel frames, bf16):
    the full V1 generator runs 20.6 ms/call with the dilated form vs
    22.3 ms with polyphase gated to its best stages (23.6 ms everywhere) —
    XLA's TPU conv emitter already skips the dilation zeros, and the
    [B,T,s*Cout]->[B,T*s,Cout] interleave costs a real relayout because
    conv activations live T-minor. Kept as the exact, tested alternative
    (and the form a future Pallas fusion would build on); the dilated
    implementation stays the default."""
    if stride == 1:
        return _conv_transpose1d_dilated(x, w, b, stride)
    K, Cin, Cout = w.shape
    lo, hi, placements = _polyphase_taps(K, stride)
    if lo > 0 or hi < 0:  # degenerate padding geometry: keep the golden path
        return _conv_transpose1d_dilated(x, w, b, stride)
    Wk = hi - lo + 1
    # Rearrange [K, Cin, Cout] -> [Wk, Cin, stride, Cout] at trace time.
    # Every (window slot, phase) receives at most one original tap, so the
    # scatter is a plain one-hot matmul over the tap axis — differentiable
    # and constant-folded when w is a literal.
    onehot = np.zeros((K, Wk * stride), np.float32)
    for d, j, r in placements:
        onehot[j, (d - lo) * stride + r] = 1.0
    w_poly = jnp.einsum(
        "kio,kw->wio", w, jnp.asarray(onehot, dtype=w.dtype)
    )  # [Wk*stride, Cin, Cout]
    w_poly = (
        w_poly.reshape(Wk, stride, Cin, Cout)
        .transpose(0, 2, 1, 3)
        .reshape(Wk, Cin, stride * Cout)
    )
    out = jax.lax.conv_general_dilated(
        x,
        w_poly,
        window_strides=(1,),
        padding=[(-lo, hi)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )  # [B, T, stride*Cout]
    B, T = x.shape[0], x.shape[1]
    out = out.reshape(B, T * stride, Cout)
    return out + b


# Default: the input-dilated form (see the polyphase docstring for the
# measured comparison).
_conv_transpose1d = _conv_transpose1d_dilated


def _resblock1(x, params, kernel_size: int, dilations):
    for i, d in enumerate(dilations):
        xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
        xt = _conv1d(xt, params[f"convs1_{i}_w"], params[f"convs1_{i}_b"], d)
        xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
        xt = _conv1d(xt, params[f"convs2_{i}_w"], params[f"convs2_{i}_b"], 1)
        x = x + xt
    return x


def _resblock2(x, params, kernel_size: int, dilations):
    for i, d in enumerate(dilations):
        xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
        xt = _conv1d(xt, params[f"convs_{i}_w"], params[f"convs_{i}_b"], d)
        x = x + xt
    return x


def hifigan_generator(
    params: Dict[str, Any],
    mel: jnp.ndarray,
    config: HiFiGANConfig,
    fused: bool = False,
) -> jnp.ndarray:
    """mel [B, T, n_mels] -> wav [B, T * total_upsampling].

    With fused=True the low-channel upsample stages' resblock groups run as
    one Pallas VMEM kernel each (ops/vocoder_resblocks.py) — TPU only,
    opt-in: measured SLOWER than XLA's op-by-op path (see the kernel
    module docstring), kept as the documented negative result."""
    from ..ops.vocoder_resblocks import (
        fused_mrf_stage,
        mrf_stage_supported,
        prepare_stage_weights,
    )

    x = _conv1d(mel, params["conv_pre_w"], params["conv_pre_b"])
    n_kernels = len(config.resblock_kernel_sizes)
    resblock_fn = _resblock1 if config.resblock == "1" else _resblock2
    ks = tuple(config.resblock_kernel_sizes)
    dils = tuple(tuple(d) for d in config.resblock_dilation_sizes)
    for i, (u, k) in enumerate(
        zip(config.upsample_rates, config.upsample_kernel_sizes)
    ):
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        x = _conv_transpose1d(x, params[f"up_{i}_w"], params[f"up_{i}_b"], u)
        c_out = x.shape[-1]
        if (
            fused
            and config.resblock == "1"
            and mrf_stage_supported(c_out, ks, dils)
            and x.shape[1] >= 256
        ):
            flat = prepare_stage_weights(
                [params[f"res_{i}_{j}"] for j in range(n_kernels)],
                ks, dils, x.dtype,
            )
            # f32 doubles every VMEM buffer; halve the block to stay under
            # the ~16 MB budget at C=128
            bt = 512 if x.dtype == jnp.bfloat16 or c_out <= 64 else 256
            x = fused_mrf_stage(x, flat, ks, dils, block_t=bt)
        else:
            acc = None
            for j, (rk, dil) in enumerate(
                zip(config.resblock_kernel_sizes, config.resblock_dilation_sizes)
            ):
                out = resblock_fn(x, params[f"res_{i}_{j}"], rk, dil)
                acc = out if acc is None else acc + out
            x = acc / n_kernels
    x = jax.nn.leaky_relu(x, LRELU_SLOPE)
    x = _conv1d(x, params["conv_post_w"], params["conv_post_b"])
    return jnp.tanh(x)[..., 0]


def init_random_hifigan(
    config: HiFiGANConfig, seed: int = 0
) -> Dict[str, Any]:
    """Random-weight generator params (for tests / stubbed vocoders — the
    everyvoice test kit's get_stubbed_vocoder role)."""
    rng = np.random.default_rng(seed)

    def w(k, cin, cout, scale=0.02):
        return jnp.asarray(
            rng.standard_normal((k, cin, cout)).astype(np.float32) * scale
        )

    params: Dict[str, Any] = {}
    ch = config.upsample_initial_channel
    params["conv_pre_w"] = w(7, config.n_mels, ch)
    params["conv_pre_b"] = jnp.zeros(ch)
    for i, (u, k) in enumerate(
        zip(config.upsample_rates, config.upsample_kernel_sizes)
    ):
        cout = ch // 2
        params[f"up_{i}_w"] = w(k, ch, cout)
        params[f"up_{i}_b"] = jnp.zeros(cout)
        for j, (rk, dil) in enumerate(
            zip(config.resblock_kernel_sizes, config.resblock_dilation_sizes)
        ):
            block: Dict[str, Any] = {}
            for di in range(len(dil)):
                block[f"convs1_{di}_w"] = w(rk, cout, cout)
                block[f"convs1_{di}_b"] = jnp.zeros(cout)
                block[f"convs2_{di}_w"] = w(rk, cout, cout)
                block[f"convs2_{di}_b"] = jnp.zeros(cout)
            params[f"res_{i}_{j}"] = block
        ch = cout
    params["conv_post_w"] = w(7, ch, 1)
    params["conv_post_b"] = jnp.zeros(1)
    return params


def _fold_weight_norm(sd: dict, prefix: str) -> Optional[np.ndarray]:
    """Return the folded conv weight for `prefix` from a torch state_dict
    (handles plain .weight and weight-norm .weight_g/.weight_v pairs)."""
    if f"{prefix}.weight" in sd:
        return np.asarray(sd[f"{prefix}.weight"])
    if f"{prefix}.weight_v" in sd:
        v = np.asarray(sd[f"{prefix}.weight_v"])
        g = np.asarray(sd[f"{prefix}.weight_g"])
        norm = np.sqrt((v**2).sum(axis=(1, 2), keepdims=True))
        return g * v / np.maximum(norm, 1e-12)
    # torch >= 2.1 parametrized weight norm
    if f"{prefix}.parametrizations.weight.original1" in sd:
        v = np.asarray(sd[f"{prefix}.parametrizations.weight.original1"])
        g = np.asarray(sd[f"{prefix}.parametrizations.weight.original0"])
        norm = np.sqrt((v**2).sum(axis=(1, 2), keepdims=True))
        return g * v / np.maximum(norm, 1e-12)
    return None


def load_torch_hifigan(
    state_dict: dict, config: Optional[HiFiGANConfig] = None, prefix: str = ""
) -> Tuple[Dict[str, Any], HiFiGANConfig]:
    """Convert a canonical HiFiGAN generator torch state_dict to our pytree.

    Accepts raw generator dicts or Lightning checkpoints whose keys carry a
    'generator.' prefix. torch Conv1d weight [Cout, Cin, K] -> ours [K, Cin,
    Cout]; ConvTranspose1d weight [Cin, Cout, K] -> ours [K, Cout→? same WIO]."""
    sd = {
        (k[len(prefix):] if prefix and k.startswith(prefix) else k): v
        for k, v in state_dict.items()
    }
    if not any(k.startswith("conv_pre") for k in sd):
        # try to find the generator submodule prefix automatically
        for cand in ("generator.", "model.generator.", "g."):
            if any(k.startswith(cand + "conv_pre") for k in sd):
                sd = {k[len(cand):]: v for k, v in sd.items() if k.startswith(cand)}
                break
    if config is None:
        config = HiFiGANConfig()

    def conv(prefix):
        w = _fold_weight_norm(sd, prefix)
        if w is None:
            raise KeyError(f"missing conv weights for {prefix}")
        b = np.asarray(sd.get(f"{prefix}.bias", np.zeros(w.shape[0])))
        # torch conv: [Cout, Cin, K] -> [K, Cin, Cout]
        return jnp.asarray(np.transpose(w, (2, 1, 0))), jnp.asarray(b)

    def convT(prefix):
        w = _fold_weight_norm(sd, prefix)
        if w is None:
            raise KeyError(f"missing convT weights for {prefix}")
        b = np.asarray(sd.get(f"{prefix}.bias", np.zeros(w.shape[1])))
        # torch convtranspose: [Cin, Cout, K] -> WIO [K, Cin→?]; our
        # _conv_transpose1d convolves dilated input with flipped kernel,
        # needing [K, Cin, Cout]
        return jnp.asarray(np.transpose(w, (2, 0, 1))), jnp.asarray(b)

    params: Dict[str, Any] = {}
    params["conv_pre_w"], params["conv_pre_b"] = conv("conv_pre")
    n_blocks = len(config.resblock_kernel_sizes)
    for i in range(len(config.upsample_rates)):
        params[f"up_{i}_w"], params[f"up_{i}_b"] = convT(f"ups.{i}")
        for j in range(n_blocks):
            r = i * n_blocks + j
            block: Dict[str, Any] = {}
            dil = config.resblock_dilation_sizes[j]
            for di in range(len(dil)):
                if config.resblock == "1":
                    block[f"convs1_{di}_w"], block[f"convs1_{di}_b"] = conv(
                        f"resblocks.{r}.convs1.{di}"
                    )
                    block[f"convs2_{di}_w"], block[f"convs2_{di}_b"] = conv(
                        f"resblocks.{r}.convs2.{di}"
                    )
                else:
                    block[f"convs_{di}_w"], block[f"convs_{di}_b"] = conv(
                        f"resblocks.{r}.convs.{di}"
                    )
            params[f"res_{i}_{j}"] = block
    params["conv_post_w"], params["conv_post_b"] = conv("conv_post")
    return params, config


def load_vocoder_checkpoint(path, precision: str = "float32"):
    """Load a vocoder from disk -> (vocoder_fn, global_step, output_hop_size).

    Accepts a torch/Lightning HiFiGAN checkpoint (.ckpt/.pt — the reference's
    handoff format, fs2/cli/synthesize.py:656-667) or an .npz of our own
    parameter pytree. precision="bfloat16" runs the generator's convs in
    bf16 (~1.3x faster on TPU v5e; measured ~39 dB SNR vs the f32
    waveform — below HiFiGAN's own artifact floor)."""
    params, config, global_step = load_vocoder_params(path)
    output_hop = config.total_upsampling
    return (
        make_vocoder_fn(params, config, precision=precision),
        global_step,
        output_hop,
    )


def load_vocoder_params(path):
    """Parse a vocoder checkpoint (.ckpt/.pt torch or .npz ours) into
    (generator params pytree, HiFiGANConfig, global_step) — the raw form
    used both by serving (make_vocoder_fn) and by train-vocoder
    --finetune-from initialization."""
    from pathlib import Path as _P

    path = _P(path)
    global_step = 0
    config = HiFiGANConfig()
    if path.suffix in (".ckpt", ".pt", ".pth"):
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(ckpt, dict) and "state_dict" in ckpt:
            sd = ckpt["state_dict"]
            global_step = int(ckpt.get("global_step", 0))
            hp = ckpt.get("hyper_parameters", {})
            cfg_dict = hp.get("config", {}) if isinstance(hp, dict) else {}
            if isinstance(cfg_dict, dict):
                mdl = cfg_dict.get("model", {})
                audio = cfg_dict.get("preprocessing", {}).get("audio", {})
                config = HiFiGANConfig(
                    resblock=str(mdl.get("resblock", "1")),
                    upsample_rates=tuple(mdl.get("upsample_rates", (8, 8, 2, 2))),
                    upsample_kernel_sizes=tuple(
                        mdl.get("upsample_kernel_sizes", (16, 16, 4, 4))
                    ),
                    upsample_initial_channel=mdl.get(
                        "upsample_initial_channel", 512
                    ),
                    resblock_kernel_sizes=tuple(
                        mdl.get("resblock_kernel_sizes", (3, 7, 11))
                    ),
                    resblock_dilation_sizes=tuple(
                        tuple(d) for d in mdl.get(
                            "resblock_dilation_sizes",
                            ((1, 3, 5), (1, 3, 5), (1, 3, 5)),
                        )
                    ),
                    n_mels=audio.get("n_mels", 80),
                    sampling_rate=audio.get("output_sampling_rate", 22050),
                    hop_size=audio.get("fft_hop_size", 256),
                )
        else:
            sd = ckpt.get("generator", ckpt) if isinstance(ckpt, dict) else ckpt
        sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
        params, config = load_torch_hifigan(sd, config)
    elif path.suffix == ".npz":
        loaded = np.load(path, allow_pickle=True)
        params = loaded["params"].item()
        if "config" in loaded:
            config = HiFiGANConfig(**loaded["config"].item())
        global_step = int(loaded.get("global_step", 0))
    else:
        raise ValueError(f"Unsupported vocoder checkpoint format: {path}")
    return params, config, global_step


def make_vocoder_fn(
    params: Dict[str, Any],
    config: HiFiGANConfig,
    precision: str = "float32",
    fused: Optional[bool] = None,
):
    """Callable (mel [B, T, K]) -> (wav [B, samples], sr) for the wav writer;
    jitted once. precision: "float32" (default) or "bfloat16".

    fused=True swaps the low-channel resblock groups for the Pallas MRF
    kernel (ops/vocoder_resblocks.py). Measured on v5e it is a NEGATIVE
    result — device times 4.2/6.2/10.6 ms vs XLA's 3.9/4.2/9.5 ms for the
    C=128/64/32 stages at B=8, 256 mel frames — so it stays opt-in
    (default off); see the kernel module docstring for the analysis."""
    if precision == "bfloat16":
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if hasattr(x, "astype") else x,
            params,
        )
        in_dt = jnp.bfloat16
    else:
        in_dt = jnp.float32
    fused = bool(fused)
    gen = jax.jit(lambda p, m: hifigan_generator(p, m, config, fused=fused))

    def vocoder(mel: np.ndarray):
        wav = np.asarray(
            gen(params, jnp.asarray(mel).astype(in_dt)).astype(jnp.float32)
        )
        return wav, config.sampling_rate

    # device-to-device entry point: callers holding the mel on-device (the
    # Synthesizer) skip the host round-trip between model and vocoder
    vocoder.device_fn = lambda mel_dev: gen(params, mel_dev.astype(in_dt))
    vocoder.sample_rate = config.sampling_rate
    vocoder.hop = config.total_upsampling
    vocoder.receptive_margin_frames = config.receptive_margin_frames
    return vocoder


def make_parallel_vocoder_fn(
    params: Dict[str, Any],
    config: HiFiGANConfig,
    mesh,
    precision: str = "float32",
):
    """Sequence-parallel vocoder: callable (mel [B, T, K]) -> (wav, sr).

    The frame axis is split into per-device windows padded with the
    generator's exact one-sided receptive field (the `windowed_vocode`
    contract, synthesis/streaming.py) and all windows run as ONE sharded
    batch — sequence parallelism expressed as data parallelism over
    windows, so XLA needs no halo exchanges: the only communication is the
    initial window scatter. Output is identical to single-device vocoding;
    device time scales ~1/n_devices for long mels, with a
    2*margin*n/T recompute overhead (~6% at T=4096, n=8, V1 margin 15).

    The reference has no long-form scaling story beyond text chunking
    (fs2/cli/synthesize.py:75-128); this parallelizes the dominant
    (vocoder) stage of a single long utterance across the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if precision == "bfloat16":
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if hasattr(x, "astype") else x,
            params,
        )
        in_dt = jnp.bfloat16
    else:
        in_dt = jnp.float32
    n_dev = int(np.prod(list(mesh.shape.values())))
    axes = tuple(mesh.axis_names)
    margin = config.receptive_margin_frames
    hop = config.total_upsampling
    plain = jax.jit(lambda p, m: hifigan_generator(p, m, config))
    _cache: Dict[tuple, Any] = {}

    def _windowed(B: int, T: int):
        """Build the jitted window-parallel program for one (B, T) shape.
        All slice offsets are Python ints — one compile per shape."""
        w = -(-T // n_dev)  # ceil
        n_eff = -(-T // w)
        W = w + 2 * margin
        if T <= W or n_eff < 2:
            return None  # too short to split: plain call
        # window i emits frames [i*w, (i+1)*w); the LAST window emits
        # [T-w, T) so its fixed-size slice stays inside the signal when T
        # is not a multiple of w (the overlap region is equally valid from
        # either window — the receptive-field contract holds anywhere
        # inside a slice), and reassembly trims the head to T-w frames.
        starts = [i * w for i in range(n_eff - 1)] + [T - w]
        spans = []
        for start in starts:
            lo = min(max(start - margin, 0), T - W)
            spans.append((start, lo))

        def fn(p, mel):
            windows = jnp.stack(
                [mel[:, lo : lo + W] for (_s, lo) in spans]
                + [jnp.zeros_like(mel[:, :W])] * (n_dev - n_eff)
            )  # [n_dev, B, W, K]: window-major so each device owns one window
            windows = jax.lax.with_sharding_constraint(
                windows.reshape(n_dev * B, W, mel.shape[-1]),
                NamedSharding(mesh, P(axes)),
            )
            wav = hifigan_generator(p, windows, config)  # [n_dev*B, W*hop]
            wav = wav.reshape(n_dev, B, W * hop)
            segs = [
                jax.lax.slice_in_dim(
                    wav[i], (start - lo) * hop, (start - lo + w) * hop, axis=1
                )
                for i, (start, lo) in enumerate(spans)
            ]
            head = (
                jnp.stack(segs[:-1])
                .transpose(1, 0, 2)
                .reshape(B, (n_eff - 1) * w * hop)[:, : (T - w) * hop]
            )
            return jnp.concatenate([head, segs[-1]], axis=1)

        return jax.jit(fn)

    def device_fn(mel_dev, n_real: Optional[int] = None):
        """n_real: number of REAL rows when the caller padded the batch to
        fill the mesh (Synthesizer pads to a multiple of the data axis with
        duplicate rows before predict) — without it a padded single long
        request looks like B == n_dev and would take the plain path,
        wasting every device on a duplicate instead of window-splitting."""
        B = int(n_real) if n_real else int(mel_dev.shape[0])
        T = int(mel_dev.shape[1])
        mel_dev = mel_dev.astype(in_dt)
        if B >= n_dev:
            # enough real rows to occupy every device as plain data
            # parallelism — skip the window split and its 2*margin
            # recompute overhead
            return plain(params, mel_dev)
        key = (B, T)
        if key not in _cache:
            _cache[key] = _windowed(B, T)
        fn = _cache[key]
        if fn is None:
            return plain(params, mel_dev)
        return fn(params, mel_dev[:B])

    def vocoder(mel: np.ndarray):
        wav = np.asarray(
            device_fn(jnp.asarray(mel)).astype(jnp.float32)
        )
        return wav, config.sampling_rate

    vocoder.device_fn = device_fn
    vocoder.sample_rate = config.sampling_rate
    vocoder.hop = hop
    vocoder.receptive_margin_frames = margin
    vocoder._window_cache = _cache  # observability: which (B,T) windowed
    return vocoder
