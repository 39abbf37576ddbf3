"""Generated docs stay in sync with the schema."""

from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_readme_bench_block_is_current():
    """The README's machine-owned benchmark block must equal a fresh
    render of docs/BENCH_LATEST.json — headline numbers are printed by
    bench.py and piped through tools/update_readme_bench.py, never
    hand-copied (round-4 verdict: README and BENCH_r04 had drifted)."""
    import importlib.util
    import json

    spec = importlib.util.spec_from_file_location(
        "update_readme_bench", REPO / "tools" / "update_readme_bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    store = json.loads((REPO / "docs" / "BENCH_LATEST.json").read_text())
    expected = mod.generate_block(store)
    readme = (REPO / "README.md").read_text()
    assert mod.BEGIN in readme and mod.END in readme
    committed = readme.split(mod.BEGIN)[1].split(mod.END)[0]
    assert (mod.BEGIN + committed + mod.END) == expected, (
        "README bench block is stale — run "
        "`python tools/update_readme_bench.py`"
    )


def test_config_md_is_current():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_config_docs", REPO / "tools" / "gen_config_docs.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    expected = mod.generate()
    committed = (REPO / "docs" / "CONFIG.md").read_text()
    assert committed == expected, (
        "docs/CONFIG.md is stale — run `python tools/gen_config_docs.py`"
    )
