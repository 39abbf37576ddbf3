"""Dummy g2p engine for tests: maps each character to itself (identity g2p)."""


def dummy_g2p(text: str):
    return [c for c in text.lower() if c.isalpha() or c == " "]
