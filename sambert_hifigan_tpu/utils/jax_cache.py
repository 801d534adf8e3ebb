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
    ident: dict[str, str] = {}
    # "model name" (the marketing string) is included on top of the numeric
    # ident: observed live (r4) that two SKUs can present identical
    # vendor/family/model/stepping+flags through virtualized cpuinfo while
    # LLVM still detects different tuning features via raw CPUID — the brand
    # string is the cheapest remaining discriminator.  (A residual collision
    # is correctness-benign: the AOT load fails and the entry is recompiled
    # and rewritten.)
    want = ("vendor_id", "cpu family", "model", "model name", "stepping")
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                parts = line.split(":", 1)
                if len(parts) != 2:  # e.g. a bare 'flags' line or a blank
                    continue
                key, val = parts[0].strip(), parts[1].strip()
                if key == "flags" and not flags:
                    flags = " ".join(sorted(val.split()))
                elif key in want and key not in ident:  # first CPU block wins
                    ident[key] = val
                if flags and len(ident) == len(want):
                    break
    except Exception:  # best-effort fingerprint; never crash enable()
        pass
    ident_s = "|".join(f"{k}={ident[k]}" for k in sorted(ident))
    raw = f"{platform.machine()}|{ident_s}|{flags}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def _cpu_backend_selected() -> bool:
    """True when this process will compile with XLA:CPU (the only backend
    whose cached artifacts are host-ISA-specific)."""
    import jax

    plats = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    first = plats.split(",")[0].strip().lower() if plats else ""
    return first == "cpu" or os.environ.get("SAMBERT_FORCE_CPU") == "1"


def gc_cache_dir(base: str, budget_bytes: int) -> int:
    """Startup recency-sweep GC: bound `base` to `budget_bytes` by deleting
    the LEAST-RECENTLY-TOUCHED cache entries past the budget.  Returns bytes
    deleted.

    This replaces the dropped jax LRU cap (commit d77a230): jax's own cap
    tracks entries with `-atime` sentinel files and breaks on directories
    that already hold cap-less entries; a plain stat sweep at enable() time
    has no such bookkeeping — a deleted entry is simply a cache miss.
    Recency is max(mtime, atime): mtime alone is write-time FIFO, which
    would evict the oldest-WRITTEN entries first — exactly the expensive,
    still-hot training graphs that are read every run but never rewritten
    (relatime mounts refresh atime at most daily, which is plenty for a GC).
    Only regular files directly under `base` are considered (per-host cpu-*
    subdirs are separate cache roots that GC themselves when selected)."""
    try:
        entries = []
        with os.scandir(base) as it:
            for e in it:
                if e.is_file(follow_symlinks=False):
                    st = e.stat()
                    recency = max(st.st_mtime, st.st_atime)
                    entries.append((recency, st.st_size, e.path))
    except OSError:
        return 0
    total = sum(s for _, s, _ in entries)
    if total <= budget_bytes:
        return 0
    entries.sort()  # oldest mtime first
    deleted = 0
    for _, size, path in entries:
        if total - deleted <= budget_bytes:
            break
        try:
            os.unlink(path)
            deleted += size
        except OSError:
            pass
    return deleted


def _prune_stale_cpu_dirs(parent: str, keep: str, keep_others: int = 1) -> None:
    """Remove orphaned per-SKU cpu-<hash> cache roots (rekeying used to
    orphan them forever — tens of MB each), but KEEP the most recent
    `keep_others` non-matching dirs: hosts that alternate between two SKUs
    as the VM migrates would otherwise rebuild the whole CPU cache on every
    flip, which is exactly what the per-SKU keying exists to avoid."""
    import re
    import shutil

    try:
        with os.scandir(parent) as it:
            others = [
                (e.stat().st_mtime, e.path)
                for e in it
                if e.is_dir(follow_symlinks=False)
                and re.fullmatch(r"cpu-[0-9a-f]{12}", e.name)
                and e.name != keep
            ]
    except OSError:
        return
    others.sort(reverse=True)  # newest first
    for _, path in others[keep_others:]:
        shutil.rmtree(path, ignore_errors=True)


def enable(cache_dir: str | None = None) -> bool:
    """Turn on the persistent compilation cache. Returns True if enabled.

    Safe to call again after changing the platform (e.g. the multichip
    dryrun forces CPU after import): the cache dir is re-pointed."""
    if os.environ.get("SAMBERT_JAX_CACHE", "1") == "0":
        return False
    import jax

    base = cache_dir or os.environ.get("SAMBERT_JAX_CACHE_DIR", DEFAULT_DIR)
    if _cpu_backend_selected():
        key = "cpu-" + _host_key()
        _prune_stale_cpu_dirs(base, key)
        base = os.path.join(base, key)
    budget_mb = int(os.environ.get("SAMBERT_JAX_CACHE_BUDGET_MB", "4096"))
    if budget_mb > 0:
        gc_cache_dir(base, budget_mb * (1 << 20))
    jax.config.update("jax_compilation_cache_dir", base)
    # Cache EVERY compile, even sub-second ones: a cold process issues
    # hundreds of small dispatch-level compiles (measured: ~800 sub-1s
    # compiles per multichip dryrun at ~0.3s each on a 1-core host — minutes
    # of wall clock that a >=1s threshold silently re-pays every run).
    # Growth is bounded by gc_cache_dir above (mtime sweep at enable time),
    # NOT by jax's LRU cap: jax's lru_cache layer tracks entries with
    # `-atime` sentinel files, and capping a directory that already holds
    # cap-less entries makes every subsequent write fail with
    # FileNotFoundError on the missing sentinel (observed on this image).
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return True
