"""Persistent XLA compilation cache.

The reference's stable-fast keeps an in-process trace cache
(/root/reference/LightDiffusion.py:9815-9868) that is rebuilt on every start
("one-time compile windup", README.md:24). The TPU-native equivalent is
better: XLA compilation artifacts persist on disk across processes, so the
sampler program compiles once per (shape, schedule) EVER, not per run.
"""

from __future__ import annotations

import os
from pathlib import Path

_enabled = False


def enable_compilation_cache(path: str | os.PathLike | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    cache_dir = Path(
        path
        or os.environ.get("LDT_COMPILE_CACHE")
        or Path.home() / ".cache" / "lightdiffusion_tpu" / "xla"
    )
    cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
