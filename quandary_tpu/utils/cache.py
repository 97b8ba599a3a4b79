"""Persistent XLA compilation cache wiring (VERDICT round 3, item 6).

The reference binary starts computing instantly (main.cpp has no compile
step); a JAX process pays 10-40 s of XLA compilation per distinct program
shape on its first run.  The persistent compilation cache removes that
cost for every process after the first — bench.py proved it works through
the axon TPU relay (round 3) but only bench.py wired it.  This helper is
called from Problem.__init__ so EVERY entry point (api.Quandary, the CLI,
the device driver, user scripts) shares one on-disk cache by default.

Env controls:
    QTPU_XLA_CACHE_DIR   cache directory (default ~/.cache/quandary_tpu/xla)
    QTPU_NO_XLA_CACHE=1  disable (leaves whatever the process configured)
"""

from __future__ import annotations

import os

_wired = False


def enable_persistent_cache() -> None:
    """Idempotently point JAX's compilation cache at a durable directory.

    Respects an explicit user configuration: if the process already set
    jax_compilation_cache_dir (e.g. bench.py's /tmp cache), it is kept.
    """
    global _wired
    if _wired or os.environ.get("QTPU_NO_XLA_CACHE"):
        return
    _wired = True
    import jax

    try:
        current = jax.config.jax_compilation_cache_dir
    except AttributeError:  # pragma: no cover - very old jax
        return
    if current:
        return
    path = os.environ.get(
        "QTPU_XLA_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "quandary_tpu",
                     "xla"))
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return
    jax.config.update("jax_compilation_cache_dir", path)
    # cache small/fast-compiling entries too: the flagship programs are
    # small but cost tens of seconds through a remote relay
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
