"""Persistent XLA compilation cache wiring.

Remote TPU compiles through the axon relay are expensive (~100 s for the
512x512 quantification megastep, ~300 s at batch 16). JAX's persistent
compilation cache stores the compiled executable on disk keyed by HLO hash,
so every process after the first skips the compile entirely (measured
1.72 s -> 0.18 s across processes on this backend).

Opt-in via the ``UNETDC_TPU_COMPILE_CACHE`` environment variable (a
directory path); callers with a natural scratch location (bench.py) may pass
``default_dir``. No env var and no default means no cache — the framework
never writes outside directories it was pointed at.
"""

from __future__ import annotations

import os
from typing import Optional


def maybe_enable_compilation_cache(default_dir: Optional[str] = None,
                                   min_compile_secs: float = 5.0) -> bool:
    """Enable JAX's on-disk compilation cache if configured.

    Resolution order: $UNETDC_TPU_COMPILE_CACHE, then ``default_dir``.
    Returns True if the cache was enabled. Safe to call more than once and
    before or after backend initialization (the cache is consulted at
    compile time, not at init).
    """
    path = os.environ.get("UNETDC_TPU_COMPILE_CACHE") or default_dir
    if not path:
        return False
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
    except Exception:
        return False
    return True
