"""HiFiGAN discriminators (multi-period + multi-scale), functional JAX.

Completes the vocoder story: the reference stack trains its vocoder in a
separate torch repo (everyvoice hfgl) and this framework previously only
*consumed* those checkpoints (models/hifigan.py). With these discriminators
and training/vocoder.py, a user can train the spec-to-wav model here too —
TPU-native, one jitted D+G step.

Architecture follows the HiFiGAN paper (arXiv:2010.05646) discriminator
recipe: 5 period sub-discriminators (periods 2,3,5,7,11; Conv2d stacks over
the [T/p, p] fold) + 3 scale sub-discriminators (raw, 2x, 4x average-pooled;
grouped Conv1d stacks). All convs use weight-norm parameterization
(w = g * v / ||v||, norm per output channel — torch weight_norm dim=0
semantics) — the stabilizer HiFiGAN relies on, expressed functionally
instead of as a module hook. Where torch puts spectral_norm on the raw-scale
MSD we use weight_norm too (the UnivNet/BigVGAN simplification).

Everything is shape-static and batched: fixed audio crop length at training
time means XLA compiles exactly one program per discriminator.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1


@dataclasses.dataclass
class DiscriminatorConfig:
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    mpd_channels: Tuple[int, ...] = (32, 128, 512, 1024, 1024)
    msd_channels: Tuple[int, ...] = (128, 128, 256, 512, 1024, 1024, 1024)
    msd_groups: Tuple[int, ...] = (1, 4, 16, 16, 16, 16, 1)
    msd_strides: Tuple[int, ...] = (1, 2, 2, 4, 4, 1, 1)
    msd_kernels: Tuple[int, ...] = (15, 41, 41, 41, 41, 41, 5)
    n_scales: int = 3
    # Run the grouped MSD convs through lane-packed execution strategies
    # (exact — tested vs the plain grouped conv; purely how XLA executes
    # the same math). Order tried: row-shifted block-matmul form
    # (ops/packed_conv.py — full 128-lane output tiles AND >=128-wide
    # contraction blocks; works for odd lengths, i.e. the avg-pooled
    # scale-2/3 inputs), then the phase-packed widened-kernel conv, then
    # the plain grouped conv. XLA's native grouped-conv lowering turns the
    # group dim into a dilated spatial dim with Cout/groups(=16) active
    # lanes, measured at 2-17 TFLOP/s on v5e — the block-matmul form is
    # what makes MSD training viable on TPU.
    msd_phase_packed: bool = True
    # When phase-packing declines a geometry (odd-T avg-pooled scales) and
    # groups <= 4, execute the grouped conv as a DENSE conv with a
    # block-diagonal kernel: 4x the MACs (zeros off the diagonal) but full
    # 128-wide MXU tiles and no [B,T,G,C/G] layout splitting — measured
    # fwd+grad 4.36 -> 2.20 ms on the scale-2 g=4 conv (v5e). Exact
    # (tests/test_vocoder_training.py::test_msd_block_diag_exact). NOTE:
    # inflates XLA cost-analysis FLOPs; MFU accounting must use a plain
    # grouped compile for the numerator (bench.py does).
    msd_block_diag: bool = True


# ---------------------------------------------------------------------------
# weight-norm conv primitives
# ---------------------------------------------------------------------------


def _wn_weight(p: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """w = g * v/||v||, norm over every axis but the last (out channels)."""
    v = p["v"]
    axes = tuple(range(v.ndim - 1))
    norm = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True) + 1e-12)
    return p["g"] * v / norm


def _init_wn_conv(key, shape, scale: float = 0.02) -> Dict[str, jnp.ndarray]:
    """shape = (*kernel, Cin, Cout); g initialized to ||v|| so the initial
    effective weight equals v (torch weight_norm init semantics)."""
    v = scale * jax.random.normal(key, shape, dtype=jnp.float32)
    axes = tuple(range(v.ndim - 1))
    g = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True) + 1e-12)
    return {"v": v, "g": g, "b": jnp.zeros((shape[-1],), dtype=jnp.float32)}


def _conv1d(
    x, p, stride: int = 1, groups: int = 1, phase_packed: bool = False,
    block_diag: bool = False,
):
    """x [B, T, C] -> [B, T', Cout], SAME-style odd-kernel padding."""
    w = _wn_weight(p)  # [K, Cin/groups, Cout]
    if block_diag and groups > 1:
        # XLA's grouped lowering at cout/groups < 128 runs at ~6% MFU —
        # it under-fills the MXU's output lanes AND splits activations
        # into [B, T, G, C/G] tiles whose narrow minor dim pads up in
        # HBM, spraying layout copies around the custom-call. Instead run
        # feature_group_count=m (the largest divisor of `groups` whose
        # per-macro-group output width cout/m still fills 128 lanes) with
        # the kernel scattered block-diagonally WITHIN each macro group:
        # groups/m x the MACs (zeros off the diagonal) on full 128-wide
        # output tiles AND full cin/m contraction depth. Tried FIRST —
        # a per-geometry fwd+bwd sweep over every MSD grouped conv
        # (B=32, all three scales, v5e) measured macro <= phase-packed
        # almost everywhere (e.g. g=16 cin=256 T=2048: 0.11 vs 0.43 ms;
        # g=4 T=8192: 0.12 vs 0.15 ms; plain grouped: 17-33 ms), and
        # unlike phase-packing it needs no output phase transposes —
        # which showed up as ~12 ms/step of pure layout copies in the
        # full D+G trace. The inflation gate (sub = groups/m <= 8) keeps
        # geometries where the MAC inflation could lose on XLA's
        # grouped path; every HiFiGAN MSD geometry passes it.
        cout = w.shape[2]
        m = 0
        for d in range(1, groups + 1):
            if groups % d == 0 and cout // d >= 128:
                m = d
        if m and groups // m <= 8:
            out = _block_diag_grouped_conv(x, w, stride, groups, m)
            return out + p["b"]
    if phase_packed and groups > 1:
        out = _phase_packed_grouped_conv(x, w, stride, groups)
        if out is not None:
            return out + p["b"]
    k = w.shape[0]
    pad = (k - 1) // 2
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    return out + p["b"]


def _block_diag_grouped_conv(x, w, stride: int, groups: int, m: int = 1):
    """Exact grouped conv as an m-way grouped conv (m divides `groups`)
    with a block-diagonal kernel inside each macro group.

    w [k, cin/g, cout] (out channels group-major) scatters to
    [k, cin/m, cout]: macro group h covers original groups h*sub..,
    sub = groups//m; within it, group j's block sits at rows
    (j-h*sub)*cin_g, cols j*cout_g and exact zeros elsewhere — the extra
    MACs are multiplications by 0, so the result equals the grouped conv
    up to f32 summation order. m=1 degenerates to one dense conv."""
    k, cing, cout = w.shape
    sub = groups // m
    coutg = cout // groups
    wr = w.reshape(k, cing, m, sub, coutg)
    eye = jnp.eye(sub, dtype=w.dtype)
    # [k, r(sub rows), i(cing), h(m), s(sub cols), c(coutg)], r==s kept
    wd = jnp.einsum("kihsc,rs->krihsc", wr, eye)
    wd = wd.reshape(k, sub * cing, cout)
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, wd, window_strides=(stride,), padding=[(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=m,
    )


def _phase_packed_grouped_conv(x, w, stride: int, groups: int):
    """Exact grouped 1-D conv computed with u = 128//(Cout/groups) output
    positions packed into the feature dim.

    A grouped conv with per-group output width Cout/groups < 128 leaves
    most of the MXU's 128 lanes idle. Packing u consecutive output phases
    per group fills them: the kernel widens to Wk = (u-1)*stride + k (each
    phase is a stride-shifted copy of the original taps, zero elsewhere),
    the conv strides u*stride, and the [B, T', G, u, coutg] output is
    transposed back to time order. FLOP overhead Wk/k (1.02-1.34x on the
    HiFiGAN MSD geometries) buys full output lanes.

    Returns None when the geometry doesn't divide cleanly (caller falls
    back to the plain grouped conv). Odd-length inputs (the avg-pooled
    MSD scales, e.g. T=4097) CAN be supported exactly by right-padding
    zeros to a multiple of u*stride and slicing the output — built,
    measured on v5e, and rejected: the full D+G step got slower (88.6 vs
    85.9 ms/step; the packed conv's wider kernel + phase transposes cost
    more than XLA's plain grouped lowering on the small odd scales), so
    the even-T gate below deliberately declines scales 2/3 — which then
    run block-diag dense when groups <= 4 (see _conv1d), plain grouped
    otherwise."""
    k, cg, cout = w.shape
    coutg = cout // groups
    u = max(1, 128 // coutg)
    B, T, _C = x.shape
    pad = (k - 1) // 2
    pad_hi = k - stride - pad
    if u <= 1 or T % stride or (T // stride) % u or pad_hi < 0:
        return None
    t_true = T // stride
    t_out = T // stride
    wk = (u - 1) * stride + k
    wr = w.reshape(k, cg, groups, coutg)
    # one pad per phase + a stack: a single concatenate fusion. The previous
    # .at[].set chain lowered to u serialized dynamic-update-slices on the
    # widened buffer EVERY step (weight-norm recomputes w), profiled at
    # ~0.66 ms/step for one [42,64,16,2,64] weight alone.
    wp = jnp.stack(
        [
            jnp.pad(
                wr,
                (
                    (phase * stride, wk - k - phase * stride),
                    (0, 0), (0, 0), (0, 0),
                ),
            )
            for phase in range(u)
        ],
        axis=3,
    )
    wp = wp.reshape(wk, cg, groups * u * coutg)
    y = jax.lax.conv_general_dilated(
        x, wp, window_strides=(u * stride,), padding=[(pad, pad_hi)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    n2 = t_out // u
    y = y.reshape(B, n2, groups, u, coutg).transpose(0, 1, 3, 2, 4)
    return y.reshape(B, t_out, cout)[:, :t_true, :]


def _conv2d(x, p, stride: Tuple[int, int] = (1, 1)):
    """x [B, H, W, C] -> [B, H', W', Cout]; kernel pads on H only (the MPD
    uses (k, 1) kernels over the [T/p, p] fold)."""
    w = _wn_weight(p)  # [KH, KW, Cin, Cout]
    kh, kw = w.shape[0], w.shape[1]
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=stride,
        padding=[((kh - 1) // 2, (kh - 1) // 2), ((kw - 1) // 2, (kw - 1) // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"]


# ---------------------------------------------------------------------------
# multi-period discriminator
# ---------------------------------------------------------------------------


def init_mpd(key, config: DiscriminatorConfig) -> List[Dict]:
    subs = []
    for i, _p in enumerate(config.periods):
        k = jax.random.fold_in(key, i)
        layers = []
        cin = 1
        for j, cout in enumerate(config.mpd_channels):
            layers.append(
                _init_wn_conv(jax.random.fold_in(k, j), (5, 1, cin, cout))
            )
            cin = cout
        post = _init_wn_conv(jax.random.fold_in(k, 99), (3, 1, cin, 1))
        subs.append({"layers": layers, "post": post})
    return subs


def _mpd_sub(params: Dict, wav: jnp.ndarray, period: int):
    """wav [B, T] -> (score [B, N], features [list]). T padded to period."""
    B, T = wav.shape
    pad = (-T) % period
    if pad:
        wav = jnp.pad(wav, ((0, 0), (0, pad)), mode="reflect")
    x = wav.reshape(B, -1, period, 1)  # [B, T/p, p, 1]
    feats = []
    n = len(params["layers"])
    for j, conv in enumerate(params["layers"]):
        stride = 3 if j < n - 1 else 1
        x = _conv2d(x, conv, stride=(stride, 1))
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        feats.append(x)
    x = _conv2d(x, params["post"])
    feats.append(x)
    return x.reshape(B, -1), feats


def mpd_forward(params: List[Dict], wav: jnp.ndarray, config: DiscriminatorConfig):
    """-> (scores per period, features per period)."""
    scores, feats = [], []
    for sub, period in zip(params, config.periods):
        s, f = _mpd_sub(sub, wav, period)
        scores.append(s)
        feats.append(f)
    return scores, feats


# ---------------------------------------------------------------------------
# multi-scale discriminator
# ---------------------------------------------------------------------------


def init_msd(key, config: DiscriminatorConfig) -> List[Dict]:
    subs = []
    for i in range(config.n_scales):
        k = jax.random.fold_in(key, 1000 + i)
        layers = []
        cin = 1
        for j, (cout, kern, grp) in enumerate(
            zip(config.msd_channels, config.msd_kernels, config.msd_groups)
        ):
            groups = _msd_groups(config, j, cin)
            layers.append(
                _init_wn_conv(
                    jax.random.fold_in(k, j), (kern, cin // groups, cout)
                )
            )
            cin = cout
        post = _init_wn_conv(jax.random.fold_in(k, 99), (3, cin, 1))
        subs.append({"layers": layers, "post": post})
    return subs


def _avg_pool1d(x: jnp.ndarray, window: int = 4, stride: int = 2) -> jnp.ndarray:
    """torch AvgPool1d(4, 2, padding=2) over [B, T]."""
    x = jnp.pad(x, ((0, 0), (2, 2)))
    out = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window), (1, stride), "VALID"
    )
    return out / window


def _msd_groups(config: DiscriminatorConfig, j: int, cin: int) -> int:
    grp = config.msd_groups[j]
    cout = config.msd_channels[j]
    return grp if cin % grp == 0 and cout % grp == 0 else 1


def _msd_sub(params: Dict, wav: jnp.ndarray, config: DiscriminatorConfig):
    x = wav[..., None]  # [B, T, 1]
    feats = []
    cin = 1
    for j, conv in enumerate(params["layers"]):
        groups = _msd_groups(config, j, cin)
        x = _conv1d(
            x, conv, stride=config.msd_strides[j], groups=groups,
            phase_packed=config.msd_phase_packed,
            block_diag=config.msd_block_diag,
        )
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        feats.append(x)
        cin = config.msd_channels[j]
    x = _conv1d(x, params["post"])
    feats.append(x)
    return x.reshape(x.shape[0], -1), feats


def msd_forward(params: List[Dict], wav: jnp.ndarray, config: DiscriminatorConfig):
    scores, feats = [], []
    x = wav
    for i, sub in enumerate(params):
        if i > 0:
            x = _avg_pool1d(x)
        s, f = _msd_sub(sub, x, config)
        scores.append(s)
        feats.append(f)
    return scores, feats


def init_discriminators(seed: int, config: DiscriminatorConfig) -> Dict:
    key = jax.random.PRNGKey(seed)
    return {
        "mpd": init_mpd(jax.random.fold_in(key, 0), config),
        "msd": init_msd(jax.random.fold_in(key, 1), config),
    }


def discriminator_forward(params: Dict, wav: jnp.ndarray, config: DiscriminatorConfig):
    """All sub-discriminator (scores, features) for one waveform batch."""
    s1, f1 = mpd_forward(params["mpd"], wav, config)
    s2, f2 = msd_forward(params["msd"], wav, config)
    return s1 + s2, f1 + f2


def count_params(tree) -> int:
    return sum(
        int(np.prod(x.shape))
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "shape")
    )
