"""Numerical parity vs the ACTUAL reference code on disk.

Imports the reference's torch/numpy-only modules straight from
/root/reference/fs2 (attn/attention.py, attn/attention_loss.py, layers.py,
blocks.py, noam.py, loss.py — everyvoice-importing modules are stubbed) and
asserts value/grad agreement with this repo's JAX implementations:

  * ConvAttention forward (ours vs fs2/attn/attention.py:101-251, weights
    ported via models.torch_import._conv_attention)
  * AttentionCTCLoss value + grad (fs2/attn/attention_loss.py:22-62)
  * AttentionBinarizationLoss (fs2/attn/attention_loss.py:65-73)
  * PostNet forward (fs2/layers.py:143-212, ported weights, eval mode)
  * NoamLR schedule (fs2/noam.py:20-26)
  * Full FastSpeech2Loss on a synthetic output dict (fs2/loss.py:19-126)

This converts "structurally verified" into "numerically verified" for
everything verifiable without an everyvoice environment. The remaining gap
(torchaudio Conformer + full-model mel L1 with a real trained checkpoint) is
tracked in TODO.md. `python tools/reference_parity_report.py` renders these
same comparisons as a committed report (REFERENCE_PARITY.md).
"""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/fs2")

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference checkout not available"
)


def _load(name: str, path: Path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    """The reference modules, loaded from disk as package 'fs2ref' with the
    everyvoice-importing bits (config) stubbed out."""
    if "fs2ref" in sys.modules:
        return sys.modules["fs2ref"]
    pkg = types.ModuleType("fs2ref")
    pkg.__path__ = [str(REF)]
    sys.modules["fs2ref"] = pkg
    attn_pkg = types.ModuleType("fs2ref.attn")
    attn_pkg.__path__ = [str(REF / "attn")]
    sys.modules["fs2ref.attn"] = attn_pkg
    pkg.attn = attn_pkg
    utils_pkg = types.ModuleType("fs2ref.utils")
    utils_pkg.__path__ = [str(REF / "utils")]
    sys.modules["fs2ref.utils"] = utils_pkg
    pkg.utils = utils_pkg
    # stub: fs2/config imports everyvoice; loss.py only uses the symbol for a
    # type annotation, so a bare placeholder is behavior-preserving
    cfg_stub = types.ModuleType("fs2ref.config")
    cfg_stub.FastSpeech2Config = object
    sys.modules["fs2ref.config"] = cfg_stub

    pkg.blocks = _load("fs2ref.blocks", REF / "blocks.py")
    pkg.type_definitions_heavy = _load(
        "fs2ref.type_definitions_heavy", REF / "type_definitions_heavy.py"
    )
    utils_pkg.heavy = _load("fs2ref.utils.heavy", REF / "utils" / "heavy.py")
    pkg.layers = _load("fs2ref.layers", REF / "layers.py")
    attn_pkg.attention = _load("fs2ref.attn.attention", REF / "attn" / "attention.py")
    attn_pkg.attention_loss = _load(
        "fs2ref.attn.attention_loss", REF / "attn" / "attention_loss.py"
    )
    pkg.noam = _load("fs2ref.noam", REF / "noam.py")
    pkg.loss = _load("fs2ref.loss", REF / "loss.py")
    return pkg


# ---------------------------------------------------------------------------
# comparison helpers (shared with tools/reference_parity_report.py)
# ---------------------------------------------------------------------------


def compare_noam(ref) -> float:
    """Max abs rel diff of the LR schedule over steps 1..4000."""
    import torch

    from fastspeech2_lightning_tpu.training.state import noam_schedule

    base_lr, warmup = 1e-3, 1000
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
    sched = ref.noam.NoamLR(opt, warmup_steps=warmup)
    ours = noam_schedule(base_lr, warmup)
    import jax.numpy as jnp

    worst = 0.0
    for step in range(1, 4000, 37):
        # reference: last_epoch counts .step() calls; advance to `step`
        while sched.last_epoch < step:
            sched.step()
        theirs = sched.get_last_lr()[0]
        mine = float(ours(jnp.asarray(step)))
        worst = max(worst, abs(mine - theirs) / theirs)
    return worst


def compare_attention_ctc(ref) -> tuple[float, float]:
    """(value diff, grad max-abs diff) for the forward-sum alignment loss."""
    import jax
    import jax.numpy as jnp
    import torch

    from fastspeech2_lightning_tpu.ops.ctc import attention_ctc_loss

    rng = np.random.default_rng(0)
    B, T, L = 4, 96, 24
    scores = rng.standard_normal((B, T, L)).astype(np.float32) * 2.0
    in_lens = np.array([24, 17, 9, 21], np.int32)
    out_lens = np.array([96, 64, 33, 80], np.int32)

    t_scores = torch.tensor(scores[:, None], requires_grad=True)  # [B,1,T,L]
    ref_loss = ref.attn.attention_loss.AttentionCTCLoss()(
        t_scores, torch.tensor(in_lens).long(), torch.tensor(out_lens).long()
    )
    ref_loss.backward()
    ref_grad = t_scores.grad.squeeze(1).numpy()

    ours_val, ours_grad = jax.value_and_grad(
        lambda s: attention_ctc_loss(
            s, jnp.asarray(in_lens), jnp.asarray(out_lens)
        )
    )(jnp.asarray(scores))
    return (
        abs(float(ours_val) - float(ref_loss)),
        float(np.max(np.abs(np.asarray(ours_grad) - ref_grad))),
    )


def compare_attention_bin(ref) -> float:
    import jax.numpy as jnp
    import torch

    from fastspeech2_lightning_tpu.ops.ctc import attention_binarization_loss

    rng = np.random.default_rng(1)
    B, T, L = 3, 40, 12
    soft = rng.random((B, 1, T, L)).astype(np.float32)
    soft /= soft.sum(-1, keepdims=True)
    hard = np.zeros_like(soft)
    cols = rng.integers(0, L, size=(B, T))
    hard[np.arange(B)[:, None], 0, np.arange(T)[None, :], cols] = 1.0

    theirs = float(
        ref.attn.attention_loss.AttentionBinarizationLoss()(
            torch.tensor(hard), torch.tensor(soft)
        )
    )
    mine = float(
        attention_binarization_loss(jnp.asarray(hard[:, 0]), jnp.asarray(soft[:, 0]))
    )
    return abs(mine - theirs)


def compare_postnet(ref) -> float:
    """Max abs diff of PostNet forward (ported weights, eval/deterministic)."""
    import jax.numpy as jnp
    import torch

    from fastspeech2_lightning_tpu.models.layers import PostNet
    from fastspeech2_lightning_tpu.models.torch_import import _conv1d, _t

    torch.manual_seed(0)
    ref_pn = ref.layers.PostNet(n_mel_channels=20, postnet_embedding_dim=64)
    ref_pn.eval()
    sd = {f"postnet.{k}": v for k, v in ref_pn.state_dict().items()}
    params, stats = {}, {}
    for i in range(5):
        params[f"conv_{i}"] = _conv1d(sd, f"postnet.convolutions.{i}.0.conv")
        params[f"bn_{i}"] = {
            "scale": _t(sd, f"postnet.convolutions.{i}.1.weight"),
            "bias": _t(sd, f"postnet.convolutions.{i}.1.bias"),
        }
        stats[f"bn_{i}"] = {
            "mean": _t(sd, f"postnet.convolutions.{i}.1.running_mean"),
            "var": _t(sd, f"postnet.convolutions.{i}.1.running_var"),
        }

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 50, 20)).astype(np.float32)
    with torch.no_grad():
        theirs = ref_pn(torch.tensor(np.swapaxes(x, 1, 2)).transpose(1, 2)).numpy()
    mine = PostNet(n_mel_channels=20, postnet_embedding_dim=64).apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x),
        deterministic=True,
    )
    return float(np.max(np.abs(np.asarray(mine) - theirs)))


def compare_conv_attention(ref) -> tuple[float, float]:
    """(attn_logprob diff, attn diff) for ConvAttention forward with ported
    weights, prior, and key mask."""
    import jax.numpy as jnp
    import torch

    from fastspeech2_lightning_tpu.models.attention import ConvAttention
    from fastspeech2_lightning_tpu.models.torch_import import _conv_attention

    torch.manual_seed(3)
    n_mel, n_text, n_att = 20, 48, 20
    ref_attn = ref.attn.attention.ConvAttention(
        n_mel_channels=n_mel, n_text_channels=n_text, n_att_channels=n_att
    )
    ref_attn.eval()
    sd = {f"a.{k}": v for k, v in ref_attn.state_dict().items()}
    params = _conv_attention(sd, "a")

    rng = np.random.default_rng(3)
    B, T, L = 2, 60, 14
    mel = rng.standard_normal((B, T, n_mel)).astype(np.float32)
    text = rng.standard_normal((B, L, n_text)).astype(np.float32)
    prior = rng.random((B, T, L)).astype(np.float32)
    prior /= prior.sum(-1, keepdims=True)
    src_lens = np.array([14, 9], np.int32)
    key_mask = np.arange(L)[None, :] < src_lens[:, None]  # True = valid

    # reference mask: True where invalid, shape [B, L, 1]
    t_mask = torch.tensor(~key_mask)[:, :, None]
    with torch.no_grad():
        t_attn, t_logprob = ref_attn(
            torch.tensor(np.swapaxes(mel, 1, 2)),
            torch.tensor(np.swapaxes(text, 1, 2)),
            torch.tensor([T, T]).long(),
            mask=t_mask,
            attn_prior=torch.tensor(prior),
        )
    mine_attn, mine_logprob = ConvAttention(
        n_mel_channels=n_mel, n_text_channels=n_text, n_att_channels=n_att
    ).apply(
        {"params": params},
        jnp.asarray(mel),
        jnp.asarray(text),
        key_mask=jnp.asarray(key_mask),
        attn_prior=jnp.asarray(prior),
    )
    lp_diff = float(
        np.max(np.abs(np.asarray(mine_logprob) - t_logprob.squeeze(1).numpy()))
    )
    # masked columns are -inf pre-softmax / 0 post-softmax on both sides
    a_diff = float(
        np.max(np.abs(np.asarray(mine_attn) - t_attn.squeeze(1).numpy()))
    )
    return lp_diff, a_diff


def _loss_fixture():
    """Synthetic 17-key output dict + batch, as numpy."""
    rng = np.random.default_rng(4)
    B, L, T, M = 3, 12, 48, 20
    src_lens = np.array([12, 8, 5], np.int32)
    mel_lens = np.array([48, 30, 17], np.int32)
    src_mask = (np.arange(L)[None] < src_lens[:, None]).astype(np.float32)
    tgt_mask = (np.arange(T)[None] < mel_lens[:, None]).astype(np.float32)
    dur = rng.integers(1, 6, size=(B, L)).astype(np.float32)
    soft = rng.random((B, T, L)).astype(np.float32)
    soft /= soft.sum(-1, keepdims=True)
    hard = np.zeros_like(soft)
    cols = rng.integers(0, L, size=(B, T))
    hard[np.arange(B)[:, None], np.arange(T)[None], cols] = 1.0
    output = {
        "duration_prediction": rng.standard_normal((B, L)).astype(np.float32),
        "duration_target": dur,
        "pitch_prediction": rng.standard_normal((B, L)).astype(np.float32),
        "pitch_target": rng.standard_normal((B, L)).astype(np.float32),
        "energy_prediction": rng.standard_normal((B, L)).astype(np.float32),
        "energy_target": rng.standard_normal((B, L)).astype(np.float32),
        "output": rng.standard_normal((B, T, M)).astype(np.float32),
        "postnet_output": rng.standard_normal((B, T, M)).astype(np.float32),
        "src_mask": src_mask,
        "tgt_mask": tgt_mask,
        "attn_logprob": rng.standard_normal((B, T, L)).astype(np.float32),
        "attn_soft": soft,
        "attn_hard": hard,
    }
    batch = {
        "mel": rng.standard_normal((B, T, M)).astype(np.float32),
        "src_lens": src_lens,
        "mel_lens": mel_lens,
    }
    return output, batch


def compare_full_loss(ref) -> dict[str, float]:
    """Per-key abs diff of the full FastSpeech2Loss on a synthetic batch."""
    import jax.numpy as jnp
    import torch

    from fastspeech2_lightning_tpu.config import FastSpeech2Config
    from fastspeech2_lightning_tpu.training.loss import compute_loss

    config = FastSpeech2Config.model_validate(
        {"preprocessing": {"audio": {"n_mels": 20}}}
    )
    output, batch = _loss_fixture()
    epoch = 7

    mine = compute_loss(
        config,
        {k: (jnp.asarray(v) if v is not None else None) for k, v in output.items()},
        {k: jnp.asarray(v) for k, v in batch.items()},
        current_epoch=epoch,
    )

    # reference side: SimpleNamespace config mirroring the same fields
    ns = types.SimpleNamespace
    t = config.training
    vp = config.model.variance_predictors
    ref_config = ns(
        model=ns(
            variance_predictors=ns(
                pitch=ns(level=vp.pitch.level.value, loss=vp.pitch.loss.value),
                energy=ns(level=vp.energy.level.value, loss=vp.energy.loss.value),
                duration=ns(loss=vp.duration.loss.value),
            ),
            mel_loss=config.model.mel_loss.value,
            use_postnet=True,
            learn_alignment=True,
        ),
        training=ns(
            pitch_loss_weight=t.pitch_loss_weight,
            energy_loss_weight=t.energy_loss_weight,
            duration_loss_weight=t.duration_loss_weight,
            mel_loss_weight=t.mel_loss_weight,
            postnet_loss_weight=t.postnet_loss_weight,
            attn_ctc_loss_weight=t.attn_ctc_loss_weight,
            attn_bin_loss_weight=t.attn_bin_loss_weight,
            attn_bin_loss_warmup_epochs=t.attn_bin_loss_warmup_epochs,
        ),
    )
    t_out = {
        k: (torch.tensor(v) if v is not None else None) for k, v in output.items()
    }
    t_out["attn_logprob"] = t_out["attn_logprob"][:, None]  # [B,1,T,L]
    t_out["attn_soft"] = t_out["attn_soft"][:, None]
    t_out["attn_hard"] = t_out["attn_hard"][:, None]
    t_batch = {
        "mel": torch.tensor(batch["mel"]),
        "src_lens": torch.tensor(batch["src_lens"]).long(),
        "mel_lens": torch.tensor(batch["mel_lens"]).long(),
    }
    theirs = ref.loss.FastSpeech2Loss(ref_config)(t_out, t_batch, epoch)
    return {
        k: abs(float(mine[k]) - float(theirs[k]))
        for k in ("pitch", "energy", "duration", "spec", "postnet",
                  "attn_ctc", "attn_bin", "total")
    }


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_noam_lr_matches_reference(ref):
    assert compare_noam(ref) < 1e-6


def test_attention_ctc_loss_matches_reference(ref):
    val_diff, grad_diff = compare_attention_ctc(ref)
    assert val_diff < 5e-4, val_diff
    assert grad_diff < 5e-3, grad_diff


def test_attention_binarization_loss_matches_reference(ref):
    assert compare_attention_bin(ref) < 1e-6


def test_postnet_matches_reference(ref):
    assert compare_postnet(ref) < 2e-5


def test_conv_attention_matches_reference(ref):
    lp_diff, a_diff = compare_conv_attention(ref)
    assert lp_diff < 2e-5, lp_diff
    assert a_diff < 2e-5, a_diff


def test_full_loss_matches_reference(ref):
    diffs = compare_full_loss(ref)
    for key, diff in diffs.items():
        tol = 5e-4 if key in ("attn_ctc", "total") else 1e-5
        assert diff < tol, (key, diff)
