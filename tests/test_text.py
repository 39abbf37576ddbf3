"""Text processor tests."""

import numpy as np

from fastspeech2_lightning_tpu.config import TextConfig
from fastspeech2_lightning_tpu.text import TextProcessor, PAD_SYMBOL
from fastspeech2_lightning_tpu.text.features import (
    N_PHONOLOGICAL_FEATURES,
    get_features_for_tokens,
)
from fastspeech2_lightning_tpu.text.textsplit import chunk_text


def make_processor():
    return TextProcessor(
        TextConfig(
            symbols={
                "letters": list("abcdefghijklmnopqrstuvwxyz"),
                "digraph": ["tʃ"],
                "pad": "_",
            }
        )
    )


def test_pad_is_id_zero():
    tp = make_processor()
    assert tp.symbols[0] == PAD_SYMBOL
    assert tp.symbol_to_id[PAD_SYMBOL] == 0


def test_encode_decode_roundtrip():
    tp = make_processor()
    ids = tp.encode_text("Hello World")
    assert tp.decode_tokens(ids) == "hello world"


def test_cleaners():
    tp = make_processor()
    assert tp.apply_cleaners("  A   B ") == "a b"


def test_punctuation_internal_tokens():
    tp = make_processor()
    tokens = tp.process_text("a, b. c!")
    assert "<SB>" in tokens and "<BB>" in tokens and "<EXCL>" in tokens


def test_greedy_multichar():
    tp = make_processor()
    tokens = tp.tokenize_characters("tʃa")
    assert tokens[0] == "tʃ" and tokens[1] == "a"


def test_missing_symbols():
    tp = make_processor()
    assert tp.get_missing_symbols("aç") == ["ç"]


def test_escaped_string_sequence():
    tp = make_processor()
    ids = tp.encode_escaped_string_sequence("h/e/l/l/o")
    assert tp.decode_tokens(ids) == "hello"


def test_pfs_shape():
    feats = get_features_for_tokens(["a", "b", "<BB>"])
    assert feats.shape == (3, N_PHONOLOGICAL_FEATURES)
    assert np.any(feats[0] != 0)
    assert np.all(feats[2] == 0)  # punctuation token -> zero vector


def test_chunk_text_short_passthrough():
    assert chunk_text("hello world", 100, 200) == ["hello world"]


def test_chunk_text_splits_and_preserves_content():
    text = "one two three. four five six. seven eight nine. ten eleven twelve."
    chunks = chunk_text(text, desired_length=20, max_length=40)
    assert len(chunks) > 1
    assert "".join(chunks).replace(" ", "") == text.replace(" ", "")
    assert all(len(c) <= 41 for c in chunks)


def test_chunk_text_hard_wrap_no_boundaries():
    text = "a" * 500
    chunks = chunk_text(text, desired_length=100, max_length=120)
    assert all(len(c) <= 120 for c in chunks)
    assert sum(len(c) for c in chunks) == 500


def _load_pfs_golden_tool():
    import importlib.util
    import pathlib

    tool = pathlib.Path(__file__).parents[1] / "tools" / "pfs_golden.py"
    spec = importlib.util.spec_from_file_location("pfs_golden", tool)
    pg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pg)
    return pg


def test_pfs_table_matches_committed_golden():
    """The bundled articulatory table must match the committed partial
    golden — 35 common IPA segments' feature cells hand-transcribed from the
    published panphon/Hayes chart (tests/data/pfs_golden_partial.json) — on
    every cell the golden specifies. Re-provides the numerical contract of
    everyvoice's panphon-derived pfs space (fs2/model.py:77-89)."""
    pg = _load_pfs_golden_tool()
    report = pg.compare_partial()
    assert len(report) >= 30  # the golden really covers a broad inventory
    bad = {k: v for k, v in report.items() if v}
    assert not bad, bad

    # When a panphon-generated FULL golden is also committed
    # (tools/pfs_golden.py generate, needs a panphon environment), the table
    # must match it exactly too; absent that file this is a no-op and the
    # hand golden above carries the coverage.
    full = pg.compare()
    if full is not None:
        bad = {k: v for k, v in full.items() if v}
        assert not bad, bad
