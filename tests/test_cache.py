"""Persistent-compilation-cache helper (utils/cache.py)."""

import jax

from rustfhe_tpu.utils.cache import enable_compilation_cache


def test_enable_and_disable(tmp_path, monkeypatch):
    old = jax.config.jax_compilation_cache_dir
    try:
        p = str(tmp_path / "xla")
        assert enable_compilation_cache(p) == p
        assert jax.config.jax_compilation_cache_dir == p
        # Empty env value disables without touching config further.
        monkeypatch.setenv("RUSTFHE_COMPILE_CACHE", "")
        assert enable_compilation_cache() is None
        # Env path wins over the default — and gets the per-backend
        # suffix (cross-backend pools must never share AOT entries).
        q = str(tmp_path / "xla2")
        monkeypatch.setenv("RUSTFHE_COMPILE_CACHE", q)
        assert enable_compilation_cache() == f"{q}-{jax.default_backend()}"
    finally:
        jax.config.update("jax_compilation_cache_dir", old)


def test_cache_round_trip_on_cpu(tmp_path):
    """A jitted program lands an entry in the cache directory."""
    import jax.numpy as jnp
    import os

    old = jax.config.jax_compilation_cache_dir
    try:
        p = enable_compilation_cache(str(tmp_path / "xla"))
        out = jax.jit(lambda x: x * 2 + 1)(jnp.arange(8))
        assert int(out[3]) == 7
        assert os.listdir(p), "no cache entries written"
    finally:
        jax.config.update("jax_compilation_cache_dir", old)
