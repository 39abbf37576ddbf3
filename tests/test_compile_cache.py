"""Persistent XLA compilation cache plumbing (utils/compile_cache.py)."""

import importlib

import jax
import pytest

from fastspeech2_lightning_tpu.utils import compile_cache


@pytest.fixture(autouse=True)
def _restore_jax_cache_config():
    before = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", before)
    importlib.reload(compile_cache)


def _fresh():
    return importlib.reload(compile_cache)


def test_enable_sets_jax_config(tmp_path, monkeypatch):
    monkeypatch.delenv("FS2T_NO_COMPILE_CACHE", raising=False)
    mod = _fresh()
    out = mod.enable_persistent_cache(tmp_path / "xla")
    assert out == str(tmp_path / "xla")
    assert (tmp_path / "xla").is_dir()
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "xla")
    # idempotent: second call (even with a different dir) keeps the first
    assert mod.enable_persistent_cache(tmp_path / "other") == str(tmp_path / "xla")


def test_env_opt_out(tmp_path, monkeypatch):
    monkeypatch.setenv("FS2T_NO_COMPILE_CACHE", "1")
    mod = _fresh()
    assert mod.enable_persistent_cache(tmp_path / "xla") is None
    assert not (tmp_path / "xla").exists()


def test_env_dir_override(tmp_path, monkeypatch):
    monkeypatch.delenv("FS2T_NO_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("FS2T_COMPILE_CACHE", str(tmp_path / "env-dir"))
    mod = _fresh()
    assert mod.enable_persistent_cache() == str(tmp_path / "env-dir")
