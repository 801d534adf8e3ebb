"""Prefetcher contract: ordering, bounded lookahead, error propagation,
overlap, prompt close.

The reference has no data layer (loader spec-only, reference:
.kiro/specs/tts-sam-bert-hifigan/design.md:737-757); this tests the TPU
framework's host-pipeline addition (sambert_hifigan_tpu/data/prefetch.py).
"""

import threading
import time

import pytest

from sambert_hifigan_tpu.data.prefetch import Prefetcher, want_prefetch


def test_order_and_exhaustion():
    out = list(Prefetcher(iter(range(50))))
    assert out == list(range(50))
    p = Prefetcher(iter(range(3)))
    assert [next(p), next(p), next(p)] == [0, 1, 2]
    with pytest.raises(StopIteration):
        next(p)
    with pytest.raises(StopIteration):  # stays exhausted
        next(p)


def test_transfer_runs_in_worker_thread():
    main = threading.get_ident()
    seen_threads = []

    def transfer(x):
        seen_threads.append(threading.get_ident())
        return x * 10

    out = list(Prefetcher(iter(range(5)), transfer=transfer))
    assert out == [0, 10, 20, 30, 40]
    assert all(t != main for t in seen_threads)


def test_source_exception_propagates_with_cause():
    def gen():
        yield 1
        yield 2
        raise ValueError("disk on fire")

    p = Prefetcher(gen())
    assert next(p) == 1
    assert next(p) == 2
    with pytest.raises(RuntimeError) as ei:
        # may need to drain queued items first — but the failure replaces
        # the stream immediately after the last good item
        next(p)
    assert isinstance(ei.value.__cause__, ValueError)
    with pytest.raises(StopIteration):  # terminal after failure
        next(p)


def test_transfer_exception_propagates():
    def transfer(x):
        if x == 3:
            raise KeyError("bad batch")
        return x

    p = Prefetcher(iter(range(6)), transfer=transfer)
    assert [next(p), next(p), next(p)] == [0, 1, 2]
    with pytest.raises(RuntimeError) as ei:
        next(p)
    assert isinstance(ei.value.__cause__, KeyError)


def test_bounded_lookahead():
    """With the consumer stalled, the worker produces at most depth items
    plus the one in its hands."""
    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield i

    p = Prefetcher(gen(), depth=2)
    time.sleep(0.3)  # worker runs free; consumer never pulls
    assert len(produced) <= 2 + 1
    p.close()


def test_overlap_beats_serial():
    """Producer and consumer each cost ~d per item; pipelined wall time must
    land well under the 2*N*d serial time."""
    d, n = 0.015, 12

    def gen():
        for i in range(n):
            time.sleep(d)
            yield i

    t0 = time.perf_counter()
    p = Prefetcher(gen(), depth=2)
    for _ in range(n):
        next(p)
        time.sleep(d)  # the "device step"
    wall = time.perf_counter() - t0
    serial = 2 * n * d
    assert wall < 0.85 * serial, f"no overlap: wall {wall:.3f}s vs serial {serial:.3f}s"


def test_close_unblocks_full_queue_promptly():
    def gen():
        i = 0
        while True:  # infinite producer
            yield i
            i += 1

    p = Prefetcher(gen(), depth=1)
    assert next(p) == 0
    t0 = time.perf_counter()
    p.close()
    assert time.perf_counter() - t0 < 2.0
    assert not p._worker.is_alive()
    p.close()  # idempotent


def test_context_manager():
    with Prefetcher(iter(range(4))) as p:
        assert next(p) == 0
    assert not p._worker.is_alive()


def test_want_prefetch_policy(monkeypatch):
    """'on'/'off' are absolute; 'auto' follows the AVAILABLE core count
    (affinity-aware: a container pinned to 1 CPU of a 64-core host must
    count as 1 — the measured contention regime in the module docstring)."""
    assert want_prefetch("on") is True
    assert want_prefetch("off") is False
    import sambert_hifigan_tpu.data.prefetch as pf

    monkeypatch.setattr(pf.os, "sched_getaffinity", lambda pid: {0}, raising=False)
    assert want_prefetch("auto") is False
    monkeypatch.setattr(
        pf.os, "sched_getaffinity", lambda pid: set(range(8)), raising=False
    )
    assert want_prefetch("auto") is True

    # non-Linux fallback: sched_getaffinity missing -> os.cpu_count
    monkeypatch.delattr(pf.os, "sched_getaffinity", raising=False)
    monkeypatch.setattr(pf.os, "cpu_count", lambda: 1)
    assert want_prefetch("auto") is False
    monkeypatch.setattr(pf.os, "cpu_count", lambda: 8)
    assert want_prefetch("auto") is True
    monkeypatch.setattr(pf.os, "cpu_count", lambda: None)
    assert want_prefetch("auto") is False
