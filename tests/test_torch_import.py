"""Torch checkpoint importer tests: a synthetic reference-style state_dict
(torchaudio/fs2 naming) converts into a parameter tree that matches our
model's init tree exactly (names + shapes) and runs a forward pass."""

import jax
import numpy as np
import pytest

from fastspeech2_lightning_tpu.models import FastSpeech2
from fastspeech2_lightning_tpu.models.torch_import import import_torch_fastspeech2

from helpers import synthetic_batch, tiny_config, tiny_stats


def build_synthetic_torch_sd(cfg, n_symbols=30, seed=0):
    """Construct a state_dict with the reference's key names and torch weight
    layouts for the tiny config."""
    rng = np.random.default_rng(seed)
    d = cfg.model.encoder.input_dim
    ffn = cfg.model.encoder.feedforward_dim
    k = cfg.model.encoder.conv_kernel_size
    n_mels = cfg.preprocessing.audio.n_mels
    sd = {}

    def add(name, *shape):
        sd[name] = rng.standard_normal(shape).astype(np.float32) * 0.05

    add("text_input_layer.weight", n_symbols, d)

    for mod, layers in (("encoder", cfg.model.encoder.layers),
                        ("decoder", cfg.model.decoder.layers)):
        for i in range(layers):
            p = f"{mod}.conformer_layers.{i}"
            for f in ("ffn1", "ffn2"):
                add(f"{p}.{f}.sequential.0.weight", d)
                add(f"{p}.{f}.sequential.0.bias", d)
                add(f"{p}.{f}.sequential.1.weight", ffn, d)
                add(f"{p}.{f}.sequential.1.bias", ffn)
                add(f"{p}.{f}.sequential.4.weight", d, ffn)
                add(f"{p}.{f}.sequential.4.bias", d)
            add(f"{p}.self_attn_layer_norm.weight", d)
            add(f"{p}.self_attn_layer_norm.bias", d)
            add(f"{p}.self_attn.in_proj_weight", 3 * d, d)
            add(f"{p}.self_attn.in_proj_bias", 3 * d)
            add(f"{p}.self_attn.out_proj.weight", d, d)
            add(f"{p}.self_attn.out_proj.bias", d)
            cm = f"{p}.conv_module"
            add(f"{cm}.layer_norm.weight", d)
            add(f"{cm}.layer_norm.bias", d)
            add(f"{cm}.sequential.0.weight", 2 * d, d, 1)
            add(f"{cm}.sequential.0.bias", 2 * d)
            add(f"{cm}.sequential.2.weight", d, 1, k)
            add(f"{cm}.sequential.2.bias", d)
            add(f"{cm}.sequential.3.weight", d)
            add(f"{cm}.sequential.3.bias", d)
            add(f"{cm}.sequential.3.running_mean", d)
            sd[f"{cm}.sequential.3.running_var"] = np.abs(
                rng.standard_normal(d)
            ).astype(np.float32) + 0.5
            add(f"{cm}.sequential.5.weight", d, d, 1)
            add(f"{cm}.sequential.5.bias", d)
            add(f"{p}.final_layer_norm.weight", d)
            add(f"{p}.final_layer_norm.bias", d)

    vp = cfg.model.variance_predictors
    for name, v in (("duration", vp.duration), ("pitch", vp.pitch),
                    ("energy", vp.energy)):
        ch = v.input_dim
        ks = v.kernel_size
        for i in range(v.n_layers):
            cin = d if i == 0 else ch
            lp = f"variance_adaptor.{name}_predictor.conv.{i}.layers"
            add(f"{lp}.0.module.model.0.weight", cin, 1, ks)
            add(f"{lp}.0.module.model.0.bias", cin)
            add(f"{lp}.0.module.model.1.weight", ch, cin, 1)
            add(f"{lp}.0.module.model.1.bias", ch)
            add(f"{lp}.2.weight", ch)
            add(f"{lp}.2.bias", ch)
        add(f"variance_adaptor.{name}_predictor.linear.weight", 1, ch)
        add(f"variance_adaptor.{name}_predictor.linear.bias", 1)
    add("variance_adaptor.pitch_embedding.weight", vp.pitch.n_bins, vp.pitch.input_dim)
    add("variance_adaptor.energy_embedding.weight", vp.energy.n_bins, vp.energy.input_dim)
    sd["variance_adaptor.pitch_bins"] = np.linspace(-2, 2, vp.pitch.n_bins - 1)
    sd["variance_adaptor.energy_bins"] = np.linspace(-2, 2, vp.energy.n_bins - 1)

    # ConvAttention (n_att = n_mels)
    ap = "variance_adaptor.attention"
    add(f"{ap}.key_proj.0.conv.weight", 2 * d, d, 3)
    add(f"{ap}.key_proj.0.conv.bias", 2 * d)
    add(f"{ap}.key_proj.2.conv.weight", n_mels, 2 * d, 1)
    add(f"{ap}.key_proj.2.conv.bias", n_mels)
    add(f"{ap}.query_proj.0.conv.weight", 2 * n_mels, n_mels, 3)
    add(f"{ap}.query_proj.0.conv.bias", 2 * n_mels)
    add(f"{ap}.query_proj.2.conv.weight", n_mels, 2 * n_mels, 1)
    add(f"{ap}.query_proj.2.conv.bias", n_mels)
    add(f"{ap}.query_proj.4.conv.weight", n_mels, n_mels, 1)
    add(f"{ap}.query_proj.4.conv.bias", n_mels)

    add("mel_linear.weight", n_mels, d)
    add("mel_linear.bias", n_mels)

    for i in range(5):
        cin = n_mels if i == 0 else 512
        cout = n_mels if i == 4 else 512
        add(f"postnet.convolutions.{i}.0.conv.weight", cout, cin, 5)
        add(f"postnet.convolutions.{i}.0.conv.bias", cout)
        add(f"postnet.convolutions.{i}.1.weight", cout)
        add(f"postnet.convolutions.{i}.1.bias", cout)
        add(f"postnet.convolutions.{i}.1.running_mean", cout)
        sd[f"postnet.convolutions.{i}.1.running_var"] = np.abs(
            rng.standard_normal(cout)
        ).astype(np.float32) + 0.5

    add("position_embedding.inv_freq", d // 2)

    if cfg.model.use_global_style_token_module:
        chans = (32, 32, 64, 64, 128, 128)
        cin = 1
        for i, cout in enumerate(chans):
            add(f"gst.ref_enc.convs.{3 * i}.weight", cout, cin, 3, 3)
            add(f"gst.ref_enc.convs.{3 * i + 1}.weight", cout)
            add(f"gst.ref_enc.convs.{3 * i + 1}.bias", cout)
            add(f"gst.ref_enc.convs.{3 * i + 1}.running_mean", cout)
            sd[f"gst.ref_enc.convs.{3 * i + 1}.running_var"] = np.abs(
                rng.standard_normal(cout)
            ).astype(np.float32) + 0.5
            cin = cout
        # GRU input = ceil(n_mels / 2^6) * 128 channels
        import math

        gru_in = max(1, math.ceil(n_mels / 64)) * 128
        H = 128
        add("gst.ref_enc.gru.weight_ih_l0", 3 * H, gru_in)
        add("gst.ref_enc.gru.weight_hh_l0", 3 * H, H)
        add("gst.ref_enc.gru.bias_ih_l0", 3 * H)
        add("gst.ref_enc.gru.bias_hh_l0", 3 * H)
        heads = 4
        tok_dim = d
        add("gst.stl.gst_embs", 10, tok_dim // heads)
        add("gst.stl.mha.linear_q.weight", tok_dim, H)
        add("gst.stl.mha.linear_q.bias", tok_dim)
        add("gst.stl.mha.linear_k.weight", tok_dim, tok_dim // heads)
        add("gst.stl.mha.linear_k.bias", tok_dim)
        add("gst.stl.mha.linear_v.weight", tok_dim, tok_dim // heads)
        add("gst.stl.mha.linear_v.bias", tok_dim)
        add("gst.stl.mha.linear_out.weight", tok_dim, tok_dim)
        add("gst.stl.mha.linear_out.bias", tok_dim)
    return sd


def tree_paths_shapes(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {
        "/".join(str(getattr(p, "key", p)) for p in path): leaf.shape
        for path, leaf in flat
    }


def test_imported_tree_matches_init_tree():
    cfg = tiny_config(learn_alignment=True)
    sd = build_synthetic_torch_sd(cfg)
    params, batch_stats, warnings = import_torch_fastspeech2(sd, cfg)

    model = FastSpeech2(
        config=cfg, stats=tiny_stats(), n_symbols=30, n_speakers=1, n_languages=1
    )
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}, batch
    )
    ours = tree_paths_shapes(variables["params"])
    imported = tree_paths_shapes(params)
    missing = set(ours) - set(imported)
    extra = set(imported) - set(ours)
    assert not missing, f"importer missing params: {sorted(missing)[:10]}"
    assert not extra, f"importer produced unknown params: {sorted(extra)[:10]}"
    for k in ours:
        assert tuple(ours[k]) == tuple(imported[k]), (k, ours[k], imported[k])

    stats_ours = tree_paths_shapes(variables["batch_stats"])
    stats_imp = tree_paths_shapes(batch_stats)
    assert set(stats_imp) == set(stats_ours)

    # forward runs with imported weights
    out = model.apply(
        {"params": params, "batch_stats": batch_stats}, batch, deterministic=True
    )
    assert np.isfinite(np.asarray(out["output"])).all()


def test_imported_tree_with_gst():
    cfg = tiny_config(learn_alignment=True, use_global_style_token_module=True)
    sd = build_synthetic_torch_sd(cfg)
    params, batch_stats, _ = import_torch_fastspeech2(sd, cfg)
    model = FastSpeech2(
        config=cfg, stats=tiny_stats(), n_symbols=30, n_speakers=1, n_languages=1
    )
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}, batch
    )
    ours = tree_paths_shapes(variables["params"])
    imported = tree_paths_shapes(params)
    assert set(ours) == set(imported), (
        sorted(set(ours) ^ set(imported))[:10]
    )
    for k in ours:
        assert tuple(ours[k]) == tuple(imported[k]), (k, ours[k], imported[k])
    out = model.apply(
        {"params": params, "batch_stats": batch_stats}, batch, deterministic=True
    )
    assert np.isfinite(np.asarray(out["output"])).all()


def test_gru_cell_import_matches_torch():
    """flax GRUCell with imported weights reproduces torch GRU outputs."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from flax import linen as nn

    from fastspeech2_lightning_tpu.models.torch_import import _gru_cell

    torch.manual_seed(0)
    IN, H, T, B = 6, 5, 7, 2
    gru = torch.nn.GRU(IN, H, 1, batch_first=True)
    x = torch.randn(B, T, IN)
    with torch.no_grad():
        out_t, h_t = gru(x)

    sd = {
        f"g.{k}": v.detach().numpy() for k, v in gru.state_dict().items()
    }
    params = _gru_cell(sd, "g")

    cell = nn.GRUCell(features=H)
    rnn = nn.RNN(cell)
    v = rnn.init(jax.random.PRNGKey(0), jnp.zeros((B, T, IN)))
    out_j = rnn.apply({"params": {"cell": params}}, jnp.array(x.numpy()))
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy(), rtol=1e-4, atol=1e-5
    )


def test_missing_key_raises_clearly():
    from fastspeech2_lightning_tpu.models.torch_import import TorchImportError

    cfg = tiny_config(learn_alignment=False)
    sd = build_synthetic_torch_sd(cfg)
    del sd["mel_linear.weight"]
    with pytest.raises(TorchImportError, match="mel_linear.weight"):
        import_torch_fastspeech2(sd, cfg)


def test_conformer_layer_matches_torch_reference_math():
    """Port weights from a torch conformer layer (torchaudio structure:
    half-step FFNs, MHA, conv module with BN, final LN) through the importer
    mapping and check our flax layer reproduces its eval-mode outputs."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn
    import jax.numpy as jnp

    from fastspeech2_lightning_tpu.models.conformer import ConformerLayer
    from fastspeech2_lightning_tpu.models.torch_import import _conformer_layer

    torch.manual_seed(0)
    d, ffn, heads, k, B, T = 16, 32, 2, 5, 2, 12

    class TorchFFN(tnn.Module):
        def __init__(self):
            super().__init__()
            self.sequential = tnn.Sequential(
                tnn.LayerNorm(d), tnn.Linear(d, ffn), tnn.SiLU(),
                tnn.Dropout(0.0), tnn.Linear(ffn, d), tnn.Dropout(0.0),
            )

        def forward(self, x):
            return self.sequential(x)

    class TorchConv(tnn.Module):
        def __init__(self):
            super().__init__()
            self.layer_norm = tnn.LayerNorm(d)
            self.sequential = tnn.Sequential(
                tnn.Conv1d(d, 2 * d, 1), tnn.GLU(dim=1),
                tnn.Conv1d(d, d, k, padding=k // 2, groups=d),
                tnn.BatchNorm1d(d), tnn.SiLU(), tnn.Conv1d(d, d, 1),
                tnn.Dropout(0.0),
            )

        def forward(self, x):
            x = self.layer_norm(x).transpose(1, 2)
            return self.sequential(x).transpose(1, 2)

    class TorchLayer(tnn.Module):
        def __init__(self):
            super().__init__()
            self.ffn1 = TorchFFN()
            self.self_attn_layer_norm = tnn.LayerNorm(d)
            self.self_attn = tnn.MultiheadAttention(d, heads, batch_first=True)
            self.conv_module = TorchConv()
            self.ffn2 = TorchFFN()
            self.final_layer_norm = tnn.LayerNorm(d)

        def forward(self, x):
            x = x + 0.5 * self.ffn1(x)
            a = self.self_attn_layer_norm(x)
            x = x + self.self_attn(a, a, a, need_weights=False)[0]
            x = x + self.conv_module(x)
            x = x + 0.5 * self.ffn2(x)
            return self.final_layer_norm(x)

    layer = TorchLayer().eval()
    # randomize BN running stats so the test catches stat-mapping bugs
    bn = layer.conv_module.sequential[3]
    with torch.no_grad():
        bn.running_mean.copy_(torch.randn(d) * 0.1)
        bn.running_var.copy_(torch.rand(d) + 0.5)

    x = torch.randn(B, T, d)
    with torch.no_grad():
        ref = layer(x).numpy()

    sd = {f"p.{k_}": v.detach().numpy() for k_, v in layer.state_dict().items()}
    params, stats = _conformer_layer(sd, "p")

    ours_layer = ConformerLayer(
        num_heads=heads, ffn_dim=ffn, conv_kernel_size=k, dropout=0.0
    )
    mask = jnp.ones((B, T), dtype=bool)
    ours = ours_layer.apply(
        {"params": params, "batch_stats": stats},
        jnp.array(x.numpy()), mask, True,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-5)
