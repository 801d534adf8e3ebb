"""Unit tests for the persistent compile-cache helpers (utils/jax_cache.py):
the mtime-sweep GC that replaced the dropped jax LRU cap, the stale per-SKU
cpu-* dir pruning, and the host-key fingerprint robustness."""

import os
import time

from sambert_hifigan_tpu.utils import jax_cache


def _write(path, size, mtime):
    with open(path, "wb") as f:
        f.write(b"x" * size)
    os.utime(path, (mtime, mtime))


class TestGcCacheDir:
    def test_deletes_oldest_past_budget(self, tmp_path):
        base = str(tmp_path)
        now = time.time()
        _write(os.path.join(base, "old-cache"), 1000, now - 300)
        _write(os.path.join(base, "mid-cache"), 1000, now - 200)
        _write(os.path.join(base, "new-cache"), 1000, now - 100)
        deleted = jax_cache.gc_cache_dir(base, 2000)
        assert deleted == 1000
        assert not os.path.exists(os.path.join(base, "old-cache"))
        assert os.path.exists(os.path.join(base, "mid-cache"))
        assert os.path.exists(os.path.join(base, "new-cache"))

    def test_noop_under_budget(self, tmp_path):
        base = str(tmp_path)
        _write(os.path.join(base, "a-cache"), 100, time.time())
        assert jax_cache.gc_cache_dir(base, 1 << 20) == 0
        assert os.path.exists(os.path.join(base, "a-cache"))

    def test_ignores_subdirs(self, tmp_path):
        """Per-host cpu-* subdirs are separate cache roots — the top-level
        sweep must not count or delete them."""
        base = str(tmp_path)
        sub = os.path.join(base, "cpu-0123456789ab")
        os.makedirs(sub)
        _write(os.path.join(sub, "big-cache"), 10_000, time.time() - 500)
        _write(os.path.join(base, "top-cache"), 100, time.time())
        assert jax_cache.gc_cache_dir(base, 200) == 0
        assert os.path.exists(os.path.join(sub, "big-cache"))

    def test_missing_dir_is_noop(self, tmp_path):
        assert jax_cache.gc_cache_dir(str(tmp_path / "nope"), 100) == 0


class TestPruneStaleCpuDirs:
    def test_keeps_current_plus_most_recent_other(self, tmp_path):
        """Alternating-SKU hosts keep their other SKU's cache warm: the
        newest non-matching dir survives, older orphans are pruned, and
        non-cache dirs are untouched."""
        base = str(tmp_path)
        keep = "cpu-aaaaaaaaaaaa"
        now = time.time()
        for name, age in (
            (keep, 0), ("cpu-bbbbbbbbbbbb", 100), ("cpu-cccccccccccc", 200),
            ("not-a-cache-dir", 0),
        ):
            d = os.path.join(base, name)
            os.makedirs(d)
            _write(os.path.join(d, "e-cache"), 10, now - age)
            os.utime(d, (now - age, now - age))
        jax_cache._prune_stale_cpu_dirs(base, keep)
        assert os.path.isdir(os.path.join(base, keep))
        assert os.path.isdir(os.path.join(base, "cpu-bbbbbbbbbbbb"))  # newest other
        assert not os.path.exists(os.path.join(base, "cpu-cccccccccccc"))
        assert os.path.isdir(os.path.join(base, "not-a-cache-dir"))


class TestHostKey:
    def test_returns_stable_hex(self):
        k1 = jax_cache._host_key()
        k2 = jax_cache._host_key()
        assert k1 == k2
        assert len(k1) == 12
        int(k1, 16)  # hex

    def test_survives_malformed_cpuinfo(self, monkeypatch):
        """ADVICE r03: a cpuinfo line without ':' (e.g. a bare 'flags') must
        not crash the fingerprint; duplicate ident fields across processor
        blocks must not produce an irregular key."""
        text = (
            "flags\n"  # malformed: no colon
            "vendor_id : GenuineIntel\n"
            "cpu family : 6\n"
            "vendor_id : GenuineIntel\n"  # duplicate from a later block
            "model : 143\n"
            "flags : b a c\n"
            "stepping : 8\n"
        )
        import builtins
        import io

        real_open = builtins.open

        def fake_open(path, *a, **kw):
            if path == "/proc/cpuinfo":
                return io.StringIO(text)
            return real_open(path, *a, **kw)

        monkeypatch.setattr(builtins, "open", fake_open)
        k = jax_cache._host_key()
        assert len(k) == 12
        int(k, 16)
