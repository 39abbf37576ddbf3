"""Generated docs stay in sync with the schema."""

from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


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
