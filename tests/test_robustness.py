"""Round-2 robustness parity sweep (VERDICT.md task 7):

* collate clamps mel_lens to the padded mel axis
* corpus-global weighted-sampler weights
* graceful stats=None model degradation (fs2/model.py:103-108)
* ckpt_steps / ckpt_epochs cadence + float val_check_interval
* random-orthonormal Invertible1x1ConvLUS init (fs2/attn/attention.py:62-78)
"""

from __future__ import annotations

import types

import numpy as np
import pytest

from fastspeech2_lightning_tpu.dataset import BucketedLoader, collate

from helpers import synthetic_batch, tiny_config


def _samples(rng, n=2, L=6, T=40, n_mels=4):
    out = []
    for i in range(n):
        out.append(
            {
                "basename": f"utt{i}",
                "speaker": "spk",
                "language": "lang",
                "raw_text": "hello",
                "speaker_id": 0,
                "language_id": 0,
                "text": rng.integers(1, 10, size=L).astype(np.int32),
                "mel": rng.standard_normal((T, n_mels)).astype(np.float32),
                "pitch": rng.standard_normal(T).astype(np.float32),
                "energy": rng.standard_normal(T).astype(np.float32),
            }
        )
    return out


def test_collate_clamps_mel_lens_to_padded_axis():
    rng = np.random.default_rng(0)
    samples = _samples(rng, T=40)
    batch = collate(samples, pad_text_to=8, pad_mel_to=32, learn_alignment=True)
    # mel truncated to T=32, so mel_lens must not exceed it
    assert batch["mel"].shape[1] == 32
    assert (batch["mel_lens"] <= 32).all()
    assert batch["pitch"].shape[1] == 32


def test_weighted_sampler_weights_are_corpus_global():
    # corpus: speaker A x9, speaker B x1; the bucket holds one of each.
    items = [{"speaker": "A", "language": "l"} for _ in range(9)] + [
        {"speaker": "B", "language": "l"}
    ]
    fake = types.SimpleNamespace(dataset=types.SimpleNamespace(items=items))
    w = BucketedLoader._weights(fake, [0, 9])  # one A, one B
    # global inverse-frequency: A -> 1/9, B -> 1; normalized -> B gets 0.9
    np.testing.assert_allclose(w, [0.1, 0.9], atol=1e-9)


def test_model_constructs_with_stats_none_and_fails_forward_clearly():
    import jax

    from fastspeech2_lightning_tpu.exceptions import InvalidConfiguration
    from fastspeech2_lightning_tpu.models import FastSpeech2

    config = tiny_config()
    model = FastSpeech2(
        config=config, stats=None, n_symbols=30, n_speakers=1, n_languages=1
    )
    batch = synthetic_batch(np.random.default_rng(0))
    with pytest.raises(InvalidConfiguration, match="variance adaptor"):
        model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch,
            deterministic=True,
        )


def test_invertible_conv_initializes_random_orthonormal():
    import jax
    import jax.numpy as jnp

    from fastspeech2_lightning_tpu.models.attention import Invertible1x1ConvLUS

    m = Invertible1x1ConvLUS(8)
    v = m.init({"params": jax.random.PRNGKey(0)}, jnp.eye(8)[None])
    W = np.asarray(m.apply(v, jnp.eye(8)[None])[0]).T
    np.testing.assert_allclose(W @ W.T, np.eye(8), atol=1e-5)
    assert np.linalg.det(W) > 0.99  # det +1, not -1
    assert not np.allclose(W, np.eye(8))  # actually random, not identity
    v2 = m.init({"params": jax.random.PRNGKey(7)}, jnp.eye(8)[None])
    W2 = np.asarray(m.apply(v2, jnp.eye(8)[None])[0]).T
    assert not np.allclose(W, W2)  # seed-dependent


def test_checkpoint_cadence_and_float_val_interval(tmp_path, monkeypatch):
    """ckpt_steps triggers saves between validations; float val_check_interval
    is interpreted as a fraction of an epoch (Lightning semantics)."""
    from fastspeech2_lightning_tpu.training.loop import Trainer

    from helpers import make_training_workspace

    config = make_training_workspace(
        tmp_path,
        ckpt_steps=2,
        ckpt_epochs=None,
        val_check_interval=0.5,  # half an epoch (2 batches/epoch -> every step)
        max_steps=4,
        save_top_k_ckpts=10,
    )
    trainer = Trainer(config)
    trainer.fit(max_steps=4, resume=False)
    ckpts = sorted(p.name for p in (trainer.ckpt_dir).glob("step=*"))
    # cadence saves at steps 2 and 4 (+ final save at 4 overwrites)
    assert "step=2" in ckpts and "step=4" in ckpts
