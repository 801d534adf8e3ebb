#!/usr/bin/env python
"""TTS HTTP server with dynamic micro-batching.

Usage:
  python scripts/serve.py --acoustic-checkpoint checkpoints/acoustic_v2 \
      --vocoder-checkpoint checkpoints/vocoder_v2_adv \
      [--port 8000] [--max-batch 16] [--max-wait-ms 20]

Endpoints:
  POST /tts         {"text": "...", "duration_scale": 1.0, "pitch_shift": 0.0,
                     "energy_scale": 1.0}  ->  audio/wav bytes
  POST /tts/stream  same body (+ optional "chunk_frames") -> audio/wav
                    streamed as it is synthesized: the WAV header goes out
                    immediately (unknown-length RIFF sizes) and PCM chunks
                    follow as the chunked AR decode produces them — first
                    audio after ~one chunk of decode, not the full utterance
  GET  /healthz     ->  {"ok": true, ...batcher stats}

Concurrent requests that arrive within the micro-batch window are fused
into ONE device program via `serving.DynamicBatcher` (see that module for
the TPU rationale).  The HTTP layer is a stdlib ThreadingHTTPServer — each
connection thread blocks on its request's event while the single batcher
thread feeds the chip.
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

# This image force-registers the TPU backend from sitecustomize before env
# vars can apply; SAMBERT_FORCE_CPU=1 reclaims a CPU run (same contract as
# every other CLI in scripts/).
import os as _os

if _os.getenv("SAMBERT_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

from sambert_hifigan_tpu.utils.jax_cache import enable as _enable_jax_cache

_enable_jax_cache()

import numpy as np


def wav_bytes(wav: np.ndarray, sample_rate: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        pcm = np.clip(wav, -1.0, 1.0)
        w.writeframes((pcm * 32767.0).astype("<i2").tobytes())
    return buf.getvalue()


def pcm16(wav: np.ndarray) -> bytes:
    return (np.clip(wav, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()


def wav_stream_header(sample_rate: int) -> bytes:
    """RIFF/WAVE header with unknown-length sizes (0xFFFFFFFF), the standard
    convention for live-streamed WAV: players and decoders read PCM until
    the connection closes."""
    import struct

    return (
        b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                sample_rate * 2, 2, 16)
        + b"data" + struct.pack("<I", 0xFFFFFFFF)
    )


def make_handler(batcher, sample_rate: int, request_timeout: float):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet access log
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True, **batcher.stats()})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path not in ("/tts", "/tts/stream"):
                self._json(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
                text = req["text"]
                if not isinstance(text, str):
                    raise TypeError("'text' must be a string")
                controls = {
                    k: float(req.get(k, dflt))
                    for k, dflt in (("duration_scale", 1.0),
                                    ("pitch_shift", 0.0),
                                    ("energy_scale", 1.0))
                }
            # TypeError covers non-dict JSON bodies ('"x"'.__getitem__) and
            # non-numeric controls ({"pitch_shift": [1]}) — without it the
            # handler dies responseless and the client sees a reset socket
            except (ValueError, KeyError, TypeError) as e:
                self._json(400, {"error": f"bad request: {e!r}"})
                return
            if self.path == "/tts/stream":
                self._stream(req, text, controls)
                return
            try:
                wav = batcher.synthesize(
                    text, **controls, timeout=request_timeout,
                )
            except TimeoutError:
                self._json(503, {"error": "request timed out in queue"})
                return
            except Exception as e:  # noqa: BLE001 — surface to the client
                self._json(500, {"error": repr(e)})
                return
            body = wav_bytes(wav, sample_rate)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _stream(self, req: dict, text: str, controls: dict):
            """Incremental response: headers + WAV header immediately, then
            one PCM write per synthesized chunk.  The first error (raised by
            the frontend/encoder before any audio exists) becomes a JSON 500;
            once audio bytes have been sent the connection simply closes."""
            try:
                chunk_frames = int(req.get("chunk_frames", 32))
            except (ValueError, TypeError) as e:
                self._json(400, {"error": f"bad request: {e!r}"})
                return
            chunks = batcher.synthesize_stream(
                text,
                chunk_frames=chunk_frames,
                **controls,
                timeout=request_timeout,
            )
            try:
                first = next(chunks, None)
            except Exception as e:  # noqa: BLE001 — surface to the client
                self._json(500, {"error": repr(e)})
                return
            # body length is unknown until synthesis ends: no Content-Length,
            # the response ends when the connection closes (HTTP/1.1 allows
            # this for close-delimited messages)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Connection", "close")
            self.end_headers()
            self.close_connection = True
            try:
                self.wfile.write(wav_stream_header(sample_rate))
                if first is not None:
                    self.wfile.write(pcm16(first))
                    self.wfile.flush()
                for chunk in chunks:
                    self.wfile.write(pcm16(chunk))
                    self.wfile.flush()
            except (BrokenPipeError, ConnectionResetError):
                pass  # client hung up; drain is the generator's problem
            except Exception:  # noqa: BLE001 — mid-stream: can only close
                pass

    return Handler


def main():
    from sambert_hifigan_tpu.config import default_config
    from sambert_hifigan_tpu.pipeline import TTSPipeline
    from sambert_hifigan_tpu.serving import DynamicBatcher
    from sambert_hifigan_tpu.training.acoustic_trainer import (
        acoustic_params_from_tree,
    )
    from sambert_hifigan_tpu.training.checkpoint import CheckpointManager
    from sambert_hifigan_tpu.training.vocoder_trainer import (
        generator_params_from_tree,
    )

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--acoustic-checkpoint", type=str, required=True)
    p.add_argument("--vocoder-checkpoint", type=str, required=True)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=16)
    p.add_argument("--max-wait-ms", type=float, default=20.0)
    p.add_argument("--request-timeout", type=float, default=120.0)
    p.add_argument(
        "--warmup", action="store_true",
        help="compile the common buckets before accepting traffic",
    )
    args = p.parse_args()

    cfg = default_config()
    ac_tree, _ = CheckpointManager(args.acoustic_checkpoint, cfg.audio).restore_tree()
    voc_tree, _ = CheckpointManager(args.vocoder_checkpoint, cfg.audio).restore_tree()
    pipe = TTSPipeline(
        cfg,
        acoustic_params_from_tree(ac_tree),
        generator_params_from_tree(voc_tree),
    )
    if args.warmup:
        # Full-coverage warmup: every (text, frame) bucket pair, the
        # streaming graphs (incl. every frame bucket's decode-chunk graph),
        # and every batch bucket — a cold graph at serve time would compile
        # while the single device worker holds the chip, head-of-line-
        # blocking ALL traffic for the compile's duration.  Compiles land in
        # the persistent .jax_cache, so later server starts warm in seconds.
        print("warmup: compiling bucket grid + streaming + batch sizes...",
              flush=True)
        pipe.warmup(streaming=True, batch_buckets=True)
        if args.max_batch > max(cfg.runtime.batch_buckets):
            pipe.synthesize_batch(["warmup"] * args.max_batch)
        print("warmup: done", flush=True)
    batcher = DynamicBatcher(
        pipe, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms
    )

    class Server(ThreadingHTTPServer):
        # stdlib default listen backlog is 5: a burst of concurrent
        # connections (the whole point of the micro-batcher) overflows the
        # accept queue and clients see connection resets
        request_queue_size = 128
        daemon_threads = True

    server = Server(
        (args.host, args.port),
        make_handler(batcher, cfg.audio.sample_rate, args.request_timeout),
    )
    print(f"serving on http://{args.host}:{args.port}  "
          f"(max_batch={args.max_batch}, wait={args.max_wait_ms}ms)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
        batcher.close()


if __name__ == "__main__":
    main()
