"""Process-level JAX configuration: persistent compilation cache.

Full-model XLA compiles are expensive on this host; the on-disk cache makes
re-runs of bench/train/tests start in seconds once a given graph has been
compiled before.
"""

from __future__ import annotations

import os


def setup_jax(cache_dir: str = None):
    import jax

    # The container's sitecustomize clobbers JAX_PLATFORMS (it force-inserts
    # the axon TPU plugin); this var survives and is applied post-import, so
    # `MUVO_FORCE_PLATFORM=cpu python train.py ...` reliably runs on CPU.
    forced = os.environ.get("MUVO_FORCE_PLATFORM")
    if forced:
        jax.config.update("jax_platforms", forced)

    cache_dir = cache_dir or os.environ.get(
        "MUVO_JAX_CACHE", os.path.expanduser("~/.cache/muvo_jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
