"""Persistent XLA compilation cache.

The SO400M tower takes tens of seconds to compile cold (minutes through a
remote-compile tunnel); every CLI invocation is a fresh process, so without a
persistent cache users pay it on every scan/search/serve start. Standard JAX
persistent cache, keyed under TPUCLIP_HOME so `config.json`-relocated
installs keep their caches too.
"""

from __future__ import annotations

import os
from pathlib import Path

_ENABLED = False


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Idempotently point jax at an on-disk compilation cache."""
    global _ENABLED
    if _ENABLED or os.environ.get("TPUCLIP_NO_COMPILE_CACHE", "") in ("1", "true", "yes"):
        return
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache_dir is None:
        home = os.environ.get("TPUCLIP_HOME")
        base = Path(home) if home else Path.home() / ".cache" / "tpuclip"
        cache_dir = str(base / "jax_cache")
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything that took meaningful time; tiny programs stay
        # out so the cache doesn't fill with test shapes.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _ENABLED = True
    except Exception:  # noqa: BLE001 - cache is an optimization, never fatal
        pass
