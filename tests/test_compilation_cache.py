"""Persistent-compilation-cache helper (utils/compilation_cache.py)."""

import importlib
import os

import jax


def _fresh(monkeypatch, **env):
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    import nphm_tpu.utils.compilation_cache as cc

    importlib.reload(cc)
    return cc


def test_enable_sets_jax_config(monkeypatch, tmp_path):
    cc = _fresh(monkeypatch, NPHM_JAX_CACHE_DIR=str(tmp_path / "c"))
    try:
        assert cc.enable_persistent_cache() is True
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "c")
        assert os.path.isdir(str(tmp_path / "c"))
        # idempotent
        assert cc.enable_persistent_cache() is True
    finally:
        # don't leave the suite pointed at a tmp dir pytest will delete
        jax.config.update("jax_compilation_cache_dir", None)


def test_opt_out(monkeypatch, tmp_path):
    cc = _fresh(monkeypatch, NPHM_JAX_CACHE="0")
    assert cc.enable_persistent_cache(str(tmp_path / "x")) is False
    assert not os.path.exists(str(tmp_path / "x"))
