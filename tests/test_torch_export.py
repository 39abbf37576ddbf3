"""Export to reference Lightning .ckpt (models/torch_export.py).

Three gates:
 1. import -> export round-trips a reference state_dict bit-exactly
    (transposes only), modulo the documented GRU bias refolding.
 2. The exported state_dict strict-loads into the torch replica of the
    reference model (key-set parity incl. buffers).
 3. Full circle: stubbed orbax checkpoint -> export-checkpoint ->
    load_reference_lightning_checkpoint recovers the original params
    bit-exactly.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from fastspeech2_lightning_tpu.models.torch_export import (  # noqa: E402
    export_torch_fastspeech2,
)
from fastspeech2_lightning_tpu.models.torch_import import (  # noqa: E402
    extract_constants,
    import_torch_fastspeech2,
)
from fastspeech2_lightning_tpu.text import TextProcessor  # noqa: E402

from helpers import tiny_config, tiny_stats  # noqa: E402
from torch_replica import TorchReferenceFastSpeech2  # noqa: E402


def _cfg():
    return tiny_config(
        learn_alignment=True,
        use_postnet=True,
        multispeaker=True,
        multilingual=True,
        dtype="float32",
        max_mel_length=64,
    )


def test_import_export_round_trip_bit_exact():
    cfg = _cfg()
    stats = tiny_stats()
    torch.manual_seed(3)
    replica = TorchReferenceFastSpeech2(
        cfg, stats, n_symbols=31, n_speakers=2, n_languages=2
    ).eval()
    ref_sd = {k: v.detach().numpy() for k, v in replica.state_dict().items()}

    params, batch_stats, warnings = import_torch_fastspeech2(
        replica.state_dict(), cfg
    )
    assert not warnings, warnings
    out_sd = export_torch_fastspeech2(
        params,
        batch_stats,
        cfg,
        constants=extract_constants(replica.state_dict()),
        stats=stats,
    )

    assert set(out_sd) == set(ref_sd), (
        set(out_sd) ^ set(ref_sd)
    )
    for k in sorted(ref_sd):
        np.testing.assert_array_equal(
            out_sd[k], ref_sd[k], err_msg=k
        )


def test_exported_state_dict_strict_loads_into_replica():
    cfg = _cfg()
    stats = tiny_stats()
    torch.manual_seed(4)
    replica = TorchReferenceFastSpeech2(
        cfg, stats, n_symbols=31, n_speakers=2, n_languages=2
    )
    params, batch_stats, _ = import_torch_fastspeech2(replica.state_dict(), cfg)
    out_sd = export_torch_fastspeech2(
        params, batch_stats, cfg,
        constants=extract_constants(replica.state_dict()), stats=stats,
    )
    fresh = TorchReferenceFastSpeech2(
        cfg, stats, n_symbols=31, n_speakers=2, n_languages=2
    )
    fresh.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in out_sd.items()},
        strict=True,
    )


def test_orbax_to_lightning_full_circle(tmp_path):
    """Stubbed orbax ckpt -> .ckpt -> loads back through the reference-ckpt
    path with bit-identical params (and intact lookups/config/step)."""
    from fastspeech2_lightning_tpu.models.torch_export import (
        export_reference_lightning_checkpoint,
    )
    from fastspeech2_lightning_tpu.models.torch_import import (
        load_reference_lightning_checkpoint,
    )
    from fastspeech2_lightning_tpu.testing import get_stubbed_model
    from fastspeech2_lightning_tpu.training.checkpoint import load_checkpoint

    cfg = _cfg()
    model, ckpt_path = get_stubbed_model(tmp_path, config=cfg)
    out = export_reference_lightning_checkpoint(
        ckpt_path, tmp_path / "exported.ckpt"
    )
    _, arrays = load_checkpoint(ckpt_path)

    (config, stats, lang2id, speaker2id, variables, n_symbols, step, warns) = (
        load_reference_lightning_checkpoint(out)
    )
    assert lang2id == {"default": 0}
    assert step == int(np.asarray(arrays.get("step", 0))) or step >= 0

    def flat(d, prefix=""):
        for k, v in d.items():
            if isinstance(v, dict):
                yield from flat(v, f"{prefix}{k}.")
            else:
                yield f"{prefix}{k}", np.asarray(v)

    orig = dict(flat(arrays["params"]))
    back = dict(flat(variables["params"]))
    assert set(orig) == set(back), set(orig) ^ set(back)
    for k in sorted(orig):
        np.testing.assert_array_equal(
            orig[k].astype(np.float32), back[k].astype(np.float32), err_msg=k
        )
    # the exported ckpt's TextProcessor inventory matches the model's table
    assert n_symbols == len(TextProcessor(config.text).symbols)


def test_gru_gst_inverse_functional_equivalence():
    """The replica has no GST, so cover the GRU/GST inverses directly:
    weights round-trip exactly; the r/z bias split is refolded (bias_ih
    carries the sum, bias_hh zeros) — identical inside torch's GRU, which
    always adds the two."""
    from fastspeech2_lightning_tpu.models.torch_export import _gru, _gst
    from fastspeech2_lightning_tpu.models.torch_import import _gru_cell, _gst as _gst_in

    rng = np.random.default_rng(5)
    H, IN = 6, 10
    sd = {
        "g.weight_ih_l0": rng.standard_normal((3 * H, IN)).astype(np.float32),
        "g.weight_hh_l0": rng.standard_normal((3 * H, H)).astype(np.float32),
        "g.bias_ih_l0": rng.standard_normal(3 * H).astype(np.float32),
        "g.bias_hh_l0": rng.standard_normal(3 * H).astype(np.float32),
    }
    flax_p = _gru_cell(sd, "g")
    out = {}
    _gru(out, "g", flax_p)
    np.testing.assert_array_equal(out["g.weight_ih_l0"], sd["g.weight_ih_l0"])
    np.testing.assert_array_equal(out["g.weight_hh_l0"], sd["g.weight_hh_l0"])
    # bias sums preserved gate-wise
    np.testing.assert_allclose(
        out["g.bias_ih_l0"] + out["g.bias_hh_l0"],
        sd["g.bias_ih_l0"] + sd["g.bias_hh_l0"],
        rtol=0, atol=1e-6,
    )
    # n-gate biases must stay separate (they are NOT interchangeable in GRU)
    np.testing.assert_array_equal(
        out["g.bias_ih_l0"][2 * H:], sd["g.bias_ih_l0"][2 * H:]
    )
    np.testing.assert_array_equal(
        out["g.bias_hh_l0"][2 * H:], sd["g.bias_hh_l0"][2 * H:]
    )

    # GST: synthesize an ESPnet-layout state_dict, import then export
    gsd = {}
    chans = [1, 32, 32, 32, 32, 32]
    for i in range(6):
        gsd[f"gst.ref_enc.convs.{3 * i}.weight"] = rng.standard_normal(
            (32, chans[i], 3, 3)
        ).astype(np.float32)
        for part in ("weight", "bias", "running_mean", "running_var"):
            gsd[f"gst.ref_enc.convs.{3 * i + 1}.{part}"] = rng.standard_normal(
                32
            ).astype(np.float32)
    gsd["gst.ref_enc.gru.weight_ih_l0"] = rng.standard_normal((3 * H, IN)).astype(np.float32)
    gsd["gst.ref_enc.gru.weight_hh_l0"] = rng.standard_normal((3 * H, H)).astype(np.float32)
    gsd["gst.ref_enc.gru.bias_ih_l0"] = rng.standard_normal(3 * H).astype(np.float32)
    gsd["gst.ref_enc.gru.bias_hh_l0"] = rng.standard_normal(3 * H).astype(np.float32)
    gsd["gst.stl.gst_embs"] = rng.standard_normal((10, 8)).astype(np.float32)
    for name in ("linear_q", "linear_k", "linear_v", "linear_out"):
        gsd[f"gst.stl.mha.{name}.weight"] = rng.standard_normal((8, 8)).astype(np.float32)
        gsd[f"gst.stl.mha.{name}.bias"] = rng.standard_normal(8).astype(np.float32)

    p, s = _gst_in(gsd, "gst")
    out = {}
    _gst(out, "gst", p, s)
    for k, v in gsd.items():
        if "bias_ih_l0" in k or "bias_hh_l0" in k:
            continue  # refolded; covered above
        np.testing.assert_array_equal(out[k], v, err_msg=k)


def test_export_checkpoint_cli(tmp_path):
    from click.testing import CliRunner

    from fastspeech2_lightning_tpu.cli import app
    from fastspeech2_lightning_tpu.testing import get_stubbed_model

    _, ckpt_path = get_stubbed_model(tmp_path, config=_cfg())
    out = tmp_path / "ref.ckpt"
    result = CliRunner().invoke(
        app, ["export-checkpoint", str(ckpt_path), "-o", str(out)]
    )
    assert result.exit_code == 0, result.output
    ckpt = torch.load(out, map_location="cpu", weights_only=False)
    assert ckpt["model_info"]["name"] == "FastSpeech2"
    assert "mel_linear.weight" in ckpt["state_dict"]
