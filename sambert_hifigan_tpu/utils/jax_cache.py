"""Persistent XLA compilation cache.

Compiles through the TPU tunnel take minutes for the big training graphs
(the adv_mel_fm GAN step traces + compiles in ~30-40 min on this image's
single host core); the persistent cache makes every later process reuse the
serialized executable in milliseconds.  Verified to work with both the CPU
backend and the axon TPU PJRT plugin.

Call `enable()` BEFORE the first jit compilation (scripts call it right
after the SAMBERT_FORCE_CPU block; tests via conftest).  Opt out with
SAMBERT_JAX_CACHE=0; relocate with SAMBERT_JAX_CACHE_DIR.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")


def enable(cache_dir: str | None = None) -> bool:
    """Turn on the persistent compilation cache. Returns True if enabled."""
    if os.environ.get("SAMBERT_JAX_CACHE", "1") == "0":
        return False
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        cache_dir or os.environ.get("SAMBERT_JAX_CACHE_DIR", DEFAULT_DIR),
    )
    # cache everything that takes >1s to compile, regardless of size
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return True
