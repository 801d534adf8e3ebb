"""Dynamic-batching serving layer tests (stub pipeline — no device work).

Covers the contract the HTTP server relies on: request/response routing
under concurrency, micro-batch fusion, control-group isolation, error
propagation, and the wav encoding.
"""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from sambert_hifigan_tpu.serving import DynamicBatcher


class StubPipeline:
    """Returns a wav encoding (text length, controls) so tests can verify
    routing; records every batch it was called with."""

    def __init__(self, delay_s: float = 0.0, fail_on: str = None):
        self.calls = []
        self.delay_s = delay_s
        self.fail_on = fail_on
        self.lock = threading.Lock()

    def synthesize_batch(self, texts, **controls):
        with self.lock:
            self.calls.append((list(texts), dict(controls)))
        if self.fail_on is not None and self.fail_on in texts:
            raise RuntimeError(f"stub failure for {self.fail_on}")
        if self.delay_s:
            time.sleep(self.delay_s)
        return [
            np.full(len(t), controls["duration_scale"], np.float32)
            for t in texts
        ]


class TestDynamicBatcher:
    def test_single_request_roundtrip(self):
        b = DynamicBatcher(StubPipeline(), max_batch=4, max_wait_ms=1)
        wav = b.synthesize("hello")
        assert wav.shape == (5,)
        b.close()

    def test_concurrent_requests_fuse_into_batches(self):
        """8 requests released together against a slow first batch must NOT
        run as 8 singleton batches."""
        stub = StubPipeline(delay_s=0.05)
        b = DynamicBatcher(stub, max_batch=8, max_wait_ms=30)
        results = {}

        def worker(i):
            results[i] = b.synthesize(f"text-{i:02d}")

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        b.close()
        assert len(results) == 8
        for i, wav in results.items():
            assert wav.shape == (len(f"text-{i:02d}"),)
        st = {"batches": len(stub.calls)}
        assert st["batches"] < 8, f"no fusion happened: {stub.calls}"
        assert sum(len(c[0]) for c in stub.calls) == 8

    def test_max_batch_respected(self):
        stub = StubPipeline(delay_s=0.02)
        b = DynamicBatcher(stub, max_batch=3, max_wait_ms=50)
        threads = [
            threading.Thread(target=lambda i=i: b.synthesize(f"t{i}"))
            for i in range(7)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        b.close()
        assert max(len(c[0]) for c in stub.calls) <= 3

    def test_different_controls_never_share_a_batch(self):
        stub = StubPipeline(delay_s=0.02)
        b = DynamicBatcher(stub, max_batch=8, max_wait_ms=40)
        outs = {}

        def worker(i):
            outs[i] = b.synthesize("abc", duration_scale=1.0 + (i % 2))

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        b.close()
        for _, controls in stub.calls:
            assert controls["duration_scale"] in (1.0, 2.0)
        # every request got ITS controls' output back
        for i, wav in outs.items():
            assert wav[0] == 1.0 + (i % 2)

    def test_error_propagates_to_all_callers_in_batch(self):
        b = DynamicBatcher(StubPipeline(fail_on="bad"), max_batch=2, max_wait_ms=1)
        with pytest.raises(RuntimeError, match="stub failure"):
            b.synthesize("bad")
        # batcher survives the failure
        assert b.synthesize("ok").shape == (2,)
        b.close()

    def test_timeout(self):
        b = DynamicBatcher(StubPipeline(delay_s=0.5), max_batch=1, max_wait_ms=1)
        with pytest.raises(TimeoutError):
            b.synthesize("x", timeout=0.05)
        b.close()

    def test_stats(self):
        b = DynamicBatcher(StubPipeline(), max_batch=4, max_wait_ms=1)
        b.synthesize("abcd")
        b.synthesize("ef")
        st = b.stats()
        b.close()
        assert st["requests_served"] == 2
        assert st["batches_run"] >= 1
        assert st["mean_batch_size"] >= 1.0


class TestHTTPServer:
    @pytest.fixture()
    def server(self):
        import sys
        from http.server import ThreadingHTTPServer
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
        from serve import make_handler

        stub = StubPipeline()
        batcher = DynamicBatcher(stub, max_batch=4, max_wait_ms=1)
        httpd = ThreadingHTTPServer(
            ("127.0.0.1", 0), make_handler(batcher, 22050, request_timeout=10.0)
        )
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        yield httpd, stub
        httpd.shutdown()
        httpd.server_close()
        batcher.close()

    def test_tts_roundtrip_wav(self, server):
        httpd, _ = server
        port = httpd.server_address[1]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/tts",
            data=json.dumps({"text": "hello"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"] == "audio/wav"
            body = resp.read()
        import io
        import wave

        with wave.open(io.BytesIO(body)) as w:
            assert w.getframerate() == 22050
            assert w.getnframes() == 5  # stub wav length == len("hello")

    def test_healthz(self, server):
        httpd, _ = server
        port = httpd.server_address[1]
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as resp:
            payload = json.loads(resp.read())
        assert payload["ok"] is True
        assert "requests_served" in payload

    def test_bad_request_400(self, server):
        httpd, _ = server
        port = httpd.server_address[1]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/tts", data=b'{"no_text": 1}'
        )
        try:
            urllib.request.urlopen(req)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
