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

import hashlib
import os
import platform

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")


def _host_key() -> str:
    """Fingerprint of this host's CPU microarchitecture.

    XLA:CPU caches AOT-compiled executables keyed only by the HLO — an
    artifact compiled on a host with different ISA/tuning features fails to
    deserialize with a 'machine feature not supported' error on every load
    and forces a slow recompile.  Keying the CPU-backend cache directory on
    the host CPU keeps each machine's artifacts separate, so moving the repo
    between hosts never poisons the cache.

    The key must include vendor/family/model/stepping, NOT just the cpuinfo
    flags: LLVM sets per-SKU *tuning* features that are invisible in
    /proc/cpuinfo flags (observed live: Sapphire-Rapids-compiled entries
    carry +prefer-no-scatter/+prefer-no-gather, which an Emerald Rapids host
    with the IDENTICAL flag set rejects on load — 'Machine type used for
    XLA:CPU compilation doesn't match the machine type for execution'), so a
    flags-only key collides across SKUs and permanently poisons the cache.
    TPU artifacts are ISA-independent serialized PJRT executables, so the
    TPU cache stays at the shared top level (keeping the expensive
    tunnel-compiled training graphs warm across hosts)."""
    flags = ""
    ident = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key == "flags" and not flags:
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                elif key in ("vendor_id", "cpu family", "model", "stepping") and len(ident) < 4:
                    ident.append(f"{key}={line.split(':', 1)[1].strip()}")
                if flags and len(ident) == 4:
                    break
    except OSError:
        pass
    raw = f"{platform.machine()}|{'|'.join(sorted(ident))}|{flags}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def _cpu_backend_selected() -> bool:
    """True when this process will compile with XLA:CPU (the only backend
    whose cached artifacts are host-ISA-specific)."""
    import jax

    plats = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    first = plats.split(",")[0].strip().lower() if plats else ""
    return first == "cpu" or os.environ.get("SAMBERT_FORCE_CPU") == "1"


def enable(cache_dir: str | None = None) -> bool:
    """Turn on the persistent compilation cache. Returns True if enabled.

    Safe to call again after changing the platform (e.g. the multichip
    dryrun forces CPU after import): the cache dir is re-pointed."""
    if os.environ.get("SAMBERT_JAX_CACHE", "1") == "0":
        return False
    import jax

    base = cache_dir or os.environ.get("SAMBERT_JAX_CACHE_DIR", DEFAULT_DIR)
    if _cpu_backend_selected():
        base = os.path.join(base, "cpu-" + _host_key())
    jax.config.update("jax_compilation_cache_dir", base)
    # Cache EVERY compile, even sub-second ones: a cold process issues
    # hundreds of small dispatch-level compiles (measured: ~800 sub-1s
    # compiles per multichip dryrun at ~0.3s each on a 1-core host — minutes
    # of wall clock that a >=1s threshold silently re-pays every run).
    # Growth is modest (tens of MB of small entries on top of the big train
    # graphs) and NOT LRU-capped: jax's lru_cache layer tracks entries with
    # `-atime` sentinel files, and capping a directory that already holds
    # cap-less entries makes every subsequent write fail with
    # FileNotFoundError on the missing sentinel (observed on this image).
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return True
