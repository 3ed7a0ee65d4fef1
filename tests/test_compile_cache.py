"""Persistent compilation cache wiring (utils/compile_cache.py)."""

import jax

from pegasus_tpu.utils import compile_cache


def _reset():
    compile_cache._enabled = False


def test_enable_points_jax_at_dir(tmp_path, monkeypatch):
    _reset()
    monkeypatch.delenv("PEGASUS_TPU_COMPILE_CACHE", raising=False)
    d = str(tmp_path / "xla")
    try:
        got = compile_cache.enable_compilation_cache(d)
        assert got == d
        assert jax.config.jax_compilation_cache_dir == d
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 2.0
        # idempotent: second call is a no-op
        assert compile_cache.enable_compilation_cache(str(tmp_path)) is None
        assert jax.config.jax_compilation_cache_dir == d
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
        compile_cache._enabled = False


def test_env_var_disables(monkeypatch):
    _reset()
    monkeypatch.setenv("PEGASUS_TPU_COMPILE_CACHE", "0")
    try:
        assert compile_cache.enable_compilation_cache() is None
        assert jax.config.jax_compilation_cache_dir is None
    finally:
        compile_cache._enabled = False


def test_env_var_relocates(tmp_path, monkeypatch):
    _reset()
    d = str(tmp_path / "relocated")
    monkeypatch.setenv("PEGASUS_TPU_COMPILE_CACHE", d)
    try:
        assert compile_cache.enable_compilation_cache() == d
        assert jax.config.jax_compilation_cache_dir == d
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
        compile_cache._enabled = False
