"""Generate / verify the phonological-feature golden against panphon.

The bundled articulatory table (text/features.py) follows panphon's
ipa_all.csv conventions but this sandbox has neither panphon nor its data
files, so the table cannot be machine-checked here. This tool closes the
loop in any environment that HAS panphon:

  # write (or refresh) the committed golden from panphon itself
  python tools/pfs_golden.py generate

  # compare the bundled table against the committed golden
  python tools/pfs_golden.py verify

`tests/test_text.py::test_pfs_table_matches_committed_golden` runs the
verify step automatically whenever the golden file exists, so committing a
panphon-generated `fastspeech2_lightning_tpu/text/pfs_golden.json` makes
pfs-checkpoint interop machine-checked from then on.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from fastspeech2_lightning_tpu.text import features as F  # noqa: E402

GOLDEN = Path(F.__file__).parent / "pfs_golden.json"


def generate() -> None:
    import panphon  # noqa: F401 — hard requirement for generation

    ft = panphon.FeatureTable()
    golden = {}
    for symbol in sorted(F._TABLE):
        if symbol == "ː":
            continue  # modifier, not a segment
        vecs = ft.word_to_vector_list(symbol, numeric=True)
        if len(vecs) == 1:
            golden[symbol] = [int(v) for v in vecs[0]]
    GOLDEN.write_text(
        json.dumps(
            {
                "source": f"panphon {getattr(panphon, '__version__', '?')}",
                "feature_names": F.FEATURE_NAMES,
                "segments": golden,
            },
            indent=1,
            ensure_ascii=False,
        )
    )
    print(f"wrote {GOLDEN} ({len(golden)} segments)")


def verify() -> int:
    report = compare()
    if report is None:
        print("no golden committed; run `generate` in a panphon environment")
        return 1
    bad = {k: v for k, v in report.items() if v}
    for sym, diffs in bad.items():
        print(f"{sym!r}: {diffs}")
    print(f"{len(report) - len(bad)}/{len(report)} segments match the golden")
    return 1 if bad else 0


def compare():
    """{symbol: [(feature, bundled, golden), ...]} or None if no golden."""
    if not GOLDEN.exists():
        return None
    data = json.loads(GOLDEN.read_text())
    names = data["feature_names"]
    report = {}
    for sym, want in data["segments"].items():
        got = F._bundled_features(sym)
        diffs = [
            (names[i], int(got[i]), int(want[i]))
            for i in range(min(len(names), len(want)))
            if int(got[i]) != int(want[i])
        ]
        report[sym] = diffs
    return report


PARTIAL_GOLDEN = (
    Path(__file__).resolve().parents[1] / "tests" / "data"
    / "pfs_golden_partial.json"
)


def compare_partial():
    """Check the bundled table against the hand-transcribed partial golden.

    The partial golden (tests/data/pfs_golden_partial.json) is sparse: each
    segment carries only the feature cells transcribed with high confidence
    from the published panphon/Hayes chart. Returns
    {symbol: [(feature, bundled, golden), ...]} over those cells only.
    """
    data = json.loads(PARTIAL_GOLDEN.read_text())
    report = {}
    for sym, cells in data["segments"].items():
        got = F._bundled_features(sym)
        diffs = [
            (name, int(got[F.FEATURE_NAMES.index(name)]), int(want))
            for name, want in cells.items()
            if int(got[F.FEATURE_NAMES.index(name)]) != int(want)
        ]
        report[sym] = diffs
    return report


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "verify"
    if cmd == "generate":
        generate()
    else:
        sys.exit(verify())
