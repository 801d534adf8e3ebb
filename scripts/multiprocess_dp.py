#!/usr/bin/env python
"""Execute the multi-PROCESS data-parallel path for real.

The single-process dryrun (`__graft_entry__.dryrun_multichip`) proves the
sharded train step compiles and runs over an 8-virtual-device mesh; this
script proves the other half of the multi-host story: N coordinated OS
processes join one `jax.distributed` coordination service
(`parallel/mesh.py:initialize_distributed`), build a GLOBAL 1-D data mesh
whose devices span processes, assemble global batches from process-local
shards, and run the jitted DP acoustic train step with XLA/gloo
cross-process collectives doing the gradient reduction.

Determinism check: the launcher also runs a plain single-process control
with the same seed and asserts the per-step metrics match (tolerance covers
reduction-order differences between the single-device sum and the
cross-process psum; on CPU/gloo they are typically exact).

Usage:
  python scripts/multiprocess_dp.py                 # launcher: 2 workers + control
  python scripts/multiprocess_dp.py --nproc 2 --steps 4 --process-id 0 ...  # worker

The reference has no distributed code of any kind (SURVEY.md rows I-1/I-2);
this is the TPU-native replacement's multi-host leg, runnable on CPU.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

COORD_PORT = 9876


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--nproc", type=int, default=2)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--process-id", type=int, default=None,
                   help="worker mode (internal; spawned by the launcher)")
    p.add_argument("--coordinator", type=str,
                   default=f"127.0.0.1:{COORD_PORT}")
    p.add_argument("--port", type=int, default=COORD_PORT)
    return p.parse_args()


def tiny_config():
    """Small model so worker compile stays in seconds (values mirror the
    test fixtures; the parallel machinery is size-independent)."""
    from sambert_hifigan_tpu.config import (
        AcousticModelConfig, DecoderConfig, EncoderConfig, TTSConfig,
    )

    cfg = TTSConfig()
    return dataclasses.replace(
        cfg,
        acoustic_model=AcousticModelConfig(
            d_model=32,
            encoder=EncoderConfig(n_layers=1, n_heads=4, d_ff=64),
            decoder=DecoderConfig(n_layers=1, n_heads=4, d_ff=64, max_len=128),
        ),
    )


def run_worker(args) -> None:
    import jax

    if os.getenv("SAMBERT_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")

    from sambert_hifigan_tpu.parallel.mesh import (
        create_mesh, initialize_distributed, replicate, shard_batch,
    )

    # THE call under test: joins the coordination service; jax.devices()
    # becomes the global device list afterwards.
    initialize_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.nproc,
        process_id=args.process_id,
    )

    from sambert_hifigan_tpu.utils.jax_cache import enable as enable_cache

    enable_cache()
    import jax.numpy as jnp  # noqa: F401

    from sambert_hifigan_tpu.data.dataset import synthetic_batch
    from sambert_hifigan_tpu.models.acoustic_model import SAMBERTAcousticModel
    from sambert_hifigan_tpu.training.acoustic_trainer import (
        init_acoustic_state, make_jitted_acoustic_step,
    )

    assert jax.process_count() == args.nproc, (
        jax.process_count(), args.nproc,
    )
    cfg = tiny_config()
    model = SAMBERTAcousticModel(cfg.acoustic_model)
    mesh = create_mesh()  # 1-D data mesh over the GLOBAL device list
    assert mesh.devices.size == args.nproc  # one CPU device per process

    state = init_acoustic_state(model, cfg, jax.random.PRNGKey(0))
    state = replicate(state, mesh)  # identical on every process by seed
    step_fn = make_jitted_acoustic_step(model, cfg, mesh=mesh)

    # Compile BEFORE touching a cross-process collective, then rendezvous on
    # the coordination service (pure gRPC — no gloo).  Without this, compile
    # -time skew between processes (minutes, cold cache on a loaded 1-core
    # host) blows past gloo's TCP connect window and the first psum dies
    # with "Connect timeout".
    batch0 = shard_batch(
        synthetic_batch(cfg, args.batch_size, tph=16, tfrm=64, seed=0), mesh
    )
    rng0 = replicate(jax.random.PRNGKey(1000), mesh)
    compiled = step_fn.lower(state, batch0, rng0).compile()
    from jax._src import distributed as _dist  # barrier w/o collectives

    _dist.global_state.client.wait_at_barrier(
        "sambert_mp_compiled", timeout_in_ms=540_000
    )

    history = []
    for i in range(args.steps):
        batch = synthetic_batch(cfg, args.batch_size, tph=16, tfrm=64, seed=i)
        gbatch = shard_batch(batch, mesh)  # global array from local shards
        rng = replicate(jax.random.PRNGKey(1000 + i), mesh)
        state, metrics = compiled(state, gbatch, rng)
        history.append(
            {k: float(v) for k, v in jax.device_get(metrics).items()}
        )
    if args.process_id == 0:
        print("METRICS " + json.dumps(history), flush=True)
    # Orderly exit: barrier so no process tears down the coordination
    # service (process 0 hosts it) while a peer is still mid-step, then an
    # explicit disconnect — otherwise the peer dies with a fatal
    # "coordination service unavailable" race.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("multiprocess_dp_done")
    jax.distributed.shutdown()


def run_control(args) -> list:
    """Single-process reference run, in-process (same code path with
    nproc=1: plain device_put sharding on a 1-device mesh)."""
    import jax

    if os.getenv("SAMBERT_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    from sambert_hifigan_tpu.utils.jax_cache import enable as enable_cache

    enable_cache()
    from sambert_hifigan_tpu.data.dataset import synthetic_batch
    from sambert_hifigan_tpu.models.acoustic_model import SAMBERTAcousticModel
    from sambert_hifigan_tpu.parallel.mesh import (
        create_mesh, replicate, shard_batch,
    )
    from sambert_hifigan_tpu.training.acoustic_trainer import (
        init_acoustic_state, make_jitted_acoustic_step,
    )

    cfg = tiny_config()
    model = SAMBERTAcousticModel(cfg.acoustic_model)
    mesh = create_mesh(devices=jax.devices()[:1])
    state = replicate(init_acoustic_state(model, cfg, jax.random.PRNGKey(0)), mesh)
    step_fn = make_jitted_acoustic_step(model, cfg, mesh=mesh)
    history = []
    for i in range(args.steps):
        batch = shard_batch(
            synthetic_batch(cfg, args.batch_size, tph=16, tfrm=64, seed=i),
            mesh,
        )
        rng = replicate(jax.random.PRNGKey(1000 + i), mesh)
        state, metrics = step_fn(state, batch, rng)
        history.append(
            {k: float(v) for k, v in jax.device_get(metrics).items()}
        )
    return history


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def run_launcher(args) -> int:
    import tempfile

    # The workers run CPU/gloo; the in-process control must share their
    # backend (and numerics) or the comparison below mixes TPU bf16-MXU
    # matmuls with CPU f32 and fails its own tolerance.  run_control reads
    # the same env the workers inherit.
    os.environ.setdefault("SAMBERT_FORCE_CPU", "1")
    env = dict(os.environ, SAMBERT_FORCE_CPU="1")
    env.pop("XLA_FLAGS", None)  # one real CPU device per process
    port = args.port if args.port != COORD_PORT else _free_port()
    coordinator = f"127.0.0.1:{port}"
    env.setdefault("GLOO_SOCKET_IFNAME", "lo")  # rendezvous over loopback
    # control first: warms the persistent compile cache so both workers
    # compile in seconds and reach the first collective together, and keeps
    # three interpreters from fighting over the single CI core at once
    control = run_control(args)
    # Worker output goes to temp FILES, not pipes: a worker blocked on a
    # full unread pipe mid-collective would deadlock its peers, and a
    # sequential communicate() can't drain two pipes at once.
    files = [tempfile.TemporaryFile(mode="w+") for _ in range(args.nproc)]
    procs = [
        subprocess.Popen(
            [sys.executable, __file__,
             "--nproc", str(args.nproc), "--steps", str(args.steps),
             "--batch-size", str(args.batch_size),
             "--process-id", str(i), "--coordinator", coordinator],
            env=env, stdout=f, stderr=subprocess.STDOUT,
        )
        for i, f in zip(range(args.nproc), files)
    ]
    try:
        for p in procs:
            p.wait(timeout=600)
    except subprocess.TimeoutExpired:
        for p in procs:  # never leak workers on a hang
            p.kill()
        for p in procs:
            p.wait()
    outs = []
    for f in files:
        f.seek(0)
        outs.append(f.read())
        f.close()
    rcs = [p.returncode for p in procs]
    if any(rcs):
        for i, out in enumerate(outs):
            print(f"--- worker {i} (rc={rcs[i]}) ---\n{out}")
        print("FAIL: worker exited nonzero")
        return 1
    dist = None
    for line in outs[0].splitlines():
        if line.startswith("METRICS "):
            dist = json.loads(line[len("METRICS "):])
    if dist is None:
        print(outs[0])
        print("FAIL: worker 0 printed no metrics")
        return 1

    ok = True
    for step, (d, c) in enumerate(zip(dist, control)):
        for k in c:
            rel = abs(d[k] - c[k]) / (abs(c[k]) + 1e-9)
            # step 0 is exact in practice; later steps accumulate fp
            # reassociation (B-wide single-device sum vs psum of halves) —
            # measured <= ~2e-3 relative after 4 steps on CPU/gloo
            if rel > 5e-3:
                print(f"MISMATCH step {step} {k}: dist={d[k]} control={c[k]}")
                ok = False
    print(json.dumps({
        "nproc": args.nproc, "steps": args.steps,
        "final_dist": dist[-1], "final_control": control[-1],
        "match": ok,
    }))
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


def main():
    args = parse_args()
    if args.process_id is not None:
        run_worker(args)
    else:
        sys.exit(run_launcher(args))


if __name__ == "__main__":
    main()
