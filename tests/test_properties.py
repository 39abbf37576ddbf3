"""Property-based tests (hypothesis) for host-side invariants.

These cover the pure-Python substrate the device code sits on — text
tokenization, long-text chunking, filename hygiene, bucket arithmetic —
where hand-picked examples historically miss edge cases (empty strings,
exotic unicode, boundary-only inputs). Everything here is host-side, so
the whole module runs in seconds (no jit compiles)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fastspeech2_lightning_tpu.config import TextConfig
from fastspeech2_lightning_tpu.dataset import _round_up
from fastspeech2_lightning_tpu.text import PAD_SYMBOL, TextProcessor
from fastspeech2_lightning_tpu.text.textsplit import chunk_text
from fastspeech2_lightning_tpu.utils import slugify, truncate_basename


def _processor():
    return TextProcessor(
        TextConfig(
            symbols={
                "letters": list("abcdefghijklmnopqrstuvwxyz"),
                "digraph": ["tʃ"],
                "pad": "_",
            }
        )
    )


TP = _processor()

# arbitrary unicode text, including symbols far outside the inventory
any_text = st.text(max_size=200)
# text drawn from the inventory's alphabet plus separators/punctuation
inventory_text = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz tʃ.,!?;:", max_size=200
)


@given(any_text)
@settings(max_examples=200, deadline=None)
def test_encode_ids_always_in_range(text):
    """encode_text never emits an id outside the embedding table, no matter
    the input (unknown symbols are dropped, never mis-mapped)."""
    ids = TP.encode_text(text)
    assert all(0 <= i < len(TP.symbols) for i in ids)
    # pad id 0 can only come from the literal pad character (reference
    # parity: '\x80' IS in the symbol inventory); no other input maps to it
    if PAD_SYMBOL not in text:
        assert all(i != TP.symbol_to_id[PAD_SYMBOL] for i in ids)


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz ", max_size=200))
@settings(max_examples=200, deadline=None)
def test_encode_decode_fixpoint(text):
    """decode(encode(x)) is a fixpoint over a fully-known alphabet:
    re-encoding the decoded string yields the same ids (tokenization is
    stable on its own output). Excluded by design: punctuation (encodes
    to internal class tokens like <BB> whose display form is not
    re-tokenizable — reference semantics) and unknown symbols (dropping
    one after a space leaves a trailing-space id that the
    collapse_whitespace cleaner strips on the second pass)."""
    ids = TP.encode_text(text)
    decoded = TP.decode_tokens(ids)
    assert TP.encode_text(decoded) == ids


@given(any_text)
@settings(max_examples=200, deadline=None)
def test_process_plus_missing_partition(text):
    """Every token is either kept (known) or reported missing — nothing is
    silently invented or dropped twice."""
    cleaned = TP.apply_cleaners(text)
    tokens = TP.tokenize_characters(cleaned)
    kept = TP.process_text(text)
    missing = TP.get_missing_symbols(text)
    assert len(kept) + len(missing) == len(tokens)
    assert all(t in TP.symbol_to_id for t in kept)
    assert all(t not in TP.symbol_to_id for t in missing)


@given(any_text)
@settings(max_examples=100, deadline=None)
def test_cleaners_idempotent(text):
    """The default cleaner stack (lower/collapse_whitespace/nfc) is
    idempotent — cleaning twice equals cleaning once, so re-processing
    already-clean filelists cannot drift."""
    once = TP.apply_cleaners(text)
    assert TP.apply_cleaners(once) == once


@given(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=2000
    ),
    st.integers(min_value=10, max_value=80),
)
@settings(max_examples=150, deadline=None)
def test_chunk_text_respects_max_length(text, desired):
    """No emitted chunk ever exceeds max_length, every chunk is non-empty
    and stripped, and no non-whitespace content is lost or reordered."""
    max_length = desired * 2
    chunks = chunk_text(text, desired_length=desired, max_length=max_length)
    for c in chunks:
        assert c == c.strip() and c
        assert len(c) <= max_length
    # content preservation: concatenating chunks preserves the
    # whitespace-stripped character stream
    flat = "".join("".join(c.split()) for c in chunks)
    assert flat == "".join(text.split())


@given(st.text(max_size=120))
@settings(max_examples=200, deadline=None)
def test_truncate_basename_bounded_and_stable(name):
    """Writer filenames stay within the 20+sha1 budget (reference
    fs2/utils/__init__.py:8-20) and are deterministic."""
    out = truncate_basename(name)
    assert len(out) <= 20 + 1 + 8
    assert out == truncate_basename(name)
    # no path separators survive into filenames
    assert "/" not in out and "\\" not in out


@given(st.text(max_size=120))
@settings(max_examples=100, deadline=None)
def test_slugify_filesystem_safe(name):
    out = slugify(name)
    # reference-parity character class: word chars, dash, dot; whitespace
    # collapsed to the dash replacement; never a path separator
    assert all(ch.isalnum() or ch in "-_." for ch in out)
    assert "/" not in out and "\\" not in out and " " not in out


@given(
    st.integers(min_value=0, max_value=10**6),
    st.integers(min_value=1, max_value=4096),
)
@settings(max_examples=300, deadline=None)
def test_round_up_properties(n, mult):
    r = _round_up(n, mult)
    assert r % mult == 0
    assert r >= n
    # floored at one full multiple (a zero-size bucket is never emitted),
    # otherwise tight
    assert r == mult if n == 0 else r - n < mult


@given(st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=24))
@settings(max_examples=50, deadline=None)
def test_length_regulator_gather_equals_repeat_interleave(durations):
    """The searchsorted+gather length regulator (ops/length_regulator.py)
    equals the reference's per-item repeat_interleave semantics
    (fs2/variance_adaptor.py:66-81) for arbitrary duration vectors.
    Shape is fixed (L=24, padded) so hypothesis varies VALUES only — one
    compile for the whole property run."""
    import jax.numpy as jnp

    from fastspeech2_lightning_tpu.ops.length_regulator import length_regulate

    L = 24
    MAX_T = 256  # fixed frame budget: one compile for the whole run
    d = np.zeros((1, L), dtype=np.int32)
    d[0, : len(durations)] = durations
    x = np.arange(L, dtype=np.float32).reshape(1, L, 1) + 1.0
    out, mask, lens = length_regulate(jnp.asarray(x), jnp.asarray(d), MAX_T)
    out = np.asarray(out)[0, :, 0]
    expected = np.repeat(np.arange(L) + 1.0, d[0])[:MAX_T]
    np.testing.assert_array_equal(out[: len(expected)], expected)
    assert int(lens[0]) == min(int(d.sum()), MAX_T)
    # frames beyond the total duration are masked to zero
    assert np.all(out[len(expected):] == 0)
    assert np.asarray(mask)[0].sum() == int(lens[0])
