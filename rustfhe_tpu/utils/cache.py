"""Persistent XLA compilation cache setup.

Compiles through the axon remote-compile relay cost minutes for the
635-step production programs (BENCH.md; observed 30-400+ s with relay
variance, 610 s for the REPL single-gate program).  jax's persistent
compilation cache eliminates the repeat cost ACROSS PROCESSES — measured
through this environment: a second-process compile of an identical
program drops 10.2 s -> 0.4 s (round 5), and the radix_bench workflow's
first PBS drops from ~100 s of compile to seconds.

The library never mutates global jax config on import; applications
(nander console, examples, bench) opt in via ``enable_compilation_cache``.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Enable jax's persistent compilation cache at ``path``.

    Default path: ``$RUSTFHE_COMPILE_CACHE`` or
    ``~/.cache/rustfhe_tpu/xla``, SUFFIXED with the default backend
    (``...-tpu`` / ``...-cpu``): a TPU session's XLA:CPU helper programs
    are AOT-compiled by the remote relay with ITS machine features, and a
    later pure-CPU process loading them warns about (and risks) SIGILL —
    per-backend pools never cross-load.  ``RUSTFHE_COMPILE_CACHE=""``
    (empty) disables.  Returns the path used, or None when
    disabled/unavailable.
    """
    import jax

    if path is None:
        path = os.environ.get("RUSTFHE_COMPILE_CACHE")
        if path:  # env paths get the same per-backend split (see above)
            path = f"{path}-{jax.default_backend()}"
        if path is None:
            # Built-in default: only on TPU, with a per-backend pool.  CPU
            # compiles are sub-second (nothing to save), and this
            # environment's cached XLA:CPU AOT results carry the remote
            # compiler's machine features — every reload then spams a
            # cpu_aot_loader SIGILL warning.  The cache's entire purpose
            # is the relay's minutes-long TPU compiles.
            if jax.default_backend() != "tpu":
                return None
            path = (os.path.expanduser("~/.cache/rustfhe_tpu/xla")
                    + f"-{jax.default_backend()}")
    if not path:
        return None
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache everything: the relay makes even small compiles slow, and
        # the default min-compile-time threshold would skip them.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # unknown config names on an older jax: stay off
        return None
    return path
