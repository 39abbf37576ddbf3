"""Full-model teacher-forced parity vs a torch replica of the reference.

The BASELINE.md acceptance gate run in-sandbox: build the reference
architecture from torch primitives with the reference's exact state_dict
layout (tests/torch_replica.py), port its random-init weights through
models/torch_import.py, and assert the complete training-path forward
(ConvAttention -> MAS -> phone averaging -> bucketized variance embeddings ->
length regulation -> decoder -> mel linear -> PostNet) agrees.

Targets: mel max-abs < 1e-4 (f32, eval mode) and mel L1 < 1e-3
(the BASELINE.md north star), plus exact MAS duration agreement.

The batch is UNPADDED (every sequence at max length) on purpose: the
reference's conv modules let padding bleed into edge frames while ours
zero-masks it (models/conformer.py docstring) — a deliberate semantic
difference that only shows at padded positions' boundaries.
"""

import json
import pathlib

import numpy as np
import pytest
import torch

from fastspeech2_lightning_tpu.models import FastSpeech2
from fastspeech2_lightning_tpu.models.torch_import import (
    extract_constants,
    import_torch_fastspeech2,
)

from helpers import tiny_config, tiny_stats
from torch_replica import TorchReferenceFastSpeech2

B, L, T, N_MELS, D = 2, 12, 48, 80, 64
N_SYMBOLS = 30


def _config(depthwise=True):
    cfg = tiny_config(
        learn_alignment=True,
        use_postnet=True,
        dtype="float32",
        max_mel_length=T,
    )
    cfg.preprocessing.audio.n_mels = N_MELS
    for sub in (cfg.model.encoder, cfg.model.decoder):
        sub.layers = 2
        sub.heads = 2
        sub.input_dim = D
        sub.feedforward_dim = 128
        sub.conv_kernel_size = 7
        sub.dropout = 0.1
    for v in (
        cfg.model.variance_predictors.duration,
        cfg.model.variance_predictors.pitch,
        cfg.model.variance_predictors.energy,
    ):
        v.n_layers = 2
        v.input_dim = D
        v.kernel_size = 3
        v.n_bins = 16
        v.depthwise = depthwise
    return cfg


def _batch(rng):
    text = rng.integers(1, N_SYMBOLS, size=(B, L)).astype(np.int32)
    mel = rng.standard_normal((B, T, N_MELS)).astype(np.float32)
    # beta-binomial-ish positive diagonal prior
    prior = np.zeros((B, T, L), dtype=np.float32)
    for b in range(B):
        for t in range(T):
            c = t / (T - 1) * (L - 1)
            row = np.exp(-((np.arange(L) - c) ** 2) / 8.0) + 1e-4
            prior[b, t] = row / row.sum()
    pitch = rng.standard_normal((B, T)).astype(np.float32)
    pitch[:, -3:] = 0.0  # some unvoiced frames exercise nonzero-averaging
    energy = np.abs(rng.standard_normal((B, T))).astype(np.float32)
    return {
        "text": text,
        "src_lens": np.full(B, L, np.int32),
        "mel": mel,
        "mel_lens": np.full(B, T, np.int32),
        "pitch": pitch,
        "energy": energy,
        "attn_prior": prior,
        "speaker_id": np.zeros(B, np.int32),
        "language_id": np.zeros(B, np.int32),
    }


@pytest.mark.parametrize("depthwise", [True, False])
def test_full_model_teacher_forced_parity(depthwise):
    cfg = _config(depthwise=depthwise)
    stats = tiny_stats()
    torch.manual_seed(0)
    replica = TorchReferenceFastSpeech2(
        cfg, stats, n_symbols=N_SYMBOLS
    ).eval()

    params, batch_stats, warnings = import_torch_fastspeech2(
        replica.state_dict(), cfg
    )
    assert not warnings, warnings

    rng = np.random.default_rng(42)
    batch = _batch(rng)

    tb = {
        "text": torch.tensor(batch["text"], dtype=torch.long),
        "src_lens": torch.tensor(batch["src_lens"], dtype=torch.long),
        "max_src_len": L,
        "mel": torch.tensor(batch["mel"]),
        "mel_lens": torch.tensor(batch["mel_lens"], dtype=torch.long),
        "max_mel_len": T,
        "pitch": torch.tensor(batch["pitch"]),
        "energy": torch.tensor(batch["energy"]),
        # reference dataloader rides the attention prior on the duration key
        # when alignment is learned (fs2/dataset.py:117-154)
        "duration": torch.tensor(batch["attn_prior"]),
        "speaker_id": torch.tensor(batch["speaker_id"], dtype=torch.long),
        "language_id": torch.tensor(batch["language_id"], dtype=torch.long),
    }
    with torch.no_grad():
        ref_out = replica(tb)

    model = FastSpeech2(
        config=cfg, stats=stats, n_symbols=N_SYMBOLS, n_speakers=1,
        n_languages=1,
    )
    variables = {
        "params": params,
        "batch_stats": batch_stats,
        # bit-exact torch.linspace variance bins (last-ulp rounding differs
        # from jnp.linspace, flipping bucketize on boundary-exact targets)
        "constants": extract_constants(replica.state_dict()),
    }
    out = model.apply(variables, batch, deterministic=True)

    # MAS durations must agree exactly (bit-exact DP)
    np.testing.assert_array_equal(
        np.asarray(out["duration_target"]),
        ref_out["duration_target"].numpy(),
    )
    # soft attention agrees
    np.testing.assert_allclose(
        np.asarray(out["attn_soft"]),
        ref_out["attn_soft"].numpy()[:, 0],
        atol=2e-6,
    )
    for key in ("pitch_prediction", "energy_prediction", "pitch_target",
                "energy_target", "duration_prediction"):
        np.testing.assert_allclose(
            np.asarray(out[key]), ref_out[key].numpy(), atol=5e-5,
            err_msg=key,
        )

    ours = np.asarray(out["output"])
    theirs = ref_out["output"].numpy()
    max_abs = float(np.abs(ours - theirs).max())
    l1 = float(np.abs(ours - theirs).mean())
    assert max_abs < 1e-4, f"mel max-abs {max_abs:.2e}"
    assert l1 < 1e-3, f"mel L1 {l1:.2e}"

    ours_pn = np.asarray(out["postnet_output"])
    theirs_pn = ref_out["postnet_output"].numpy()
    pn_max = float(np.abs(ours_pn - theirs_pn).max())
    assert pn_max < 2e-4, f"postnet max-abs {pn_max:.2e}"

    # record the measurement for REFERENCE_PARITY.md
    report = {
        "depthwise": depthwise,
        "mel_max_abs": max_abs,
        "mel_l1": l1,
        "postnet_max_abs": pn_max,
    }
    out_path = pathlib.Path(__file__).parent / ".full_model_parity.json"
    existing = []
    if out_path.exists():
        try:
            existing = json.loads(out_path.read_text())
        except Exception:
            existing = []
    existing = [e for e in existing if e.get("depthwise") != depthwise]
    existing.append(report)
    out_path.write_text(json.dumps(existing, indent=2))
